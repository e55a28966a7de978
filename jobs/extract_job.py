"""spark-submit entrypoint for the extraction pipeline (north_rule:
"run via spark-submit --py-files on a multi-executor cluster").

Cluster:
  zip -r engine.zip html_qt_spark
  spark-submit --py-files engine.zip jobs/extract_job.py \
      --input  <iceberg-table-or-parquet-path> \
      --output <warehouse-dir> [--resume] [--partitions 4096]

Sandbox smoke:
  python jobs/extract_job.py --sf /root/testdata/sf0.001 \
      --output /tmp/extract_out

On a cluster the session comes from spark-submit's conf (the local
builder here is a getOrCreate no-op); input is the Iceberg interleaved
table; in the sandbox it is synthesized from documents.parquet.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

# sandbox convenience: on a cluster the engine arrives via --py-files;
# run as a bare script, the repo root must be importable
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet path of the nested "
                    "(doc_id, spans) table; mutually exclusive with --sf")
    ap.add_argument("--sf", help="testdata dir to synthesize input from")
    ap.add_argument("--output", required=True)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--max-span-bytes", type=int, default=16_000_000)
    ap.add_argument("--mega-doc-bytes", type=int, default=None,
                    help="docs above this total span size take the "
                         "exploded + chunk-split skew path")
    ap.add_argument("--replication", type=int, default=1)
    args = ap.parse_args()

    from html_qt_spark.plans.pipeline import run_extraction_job
    from html_qt_spark.plans.session import get_spark
    from html_qt_spark.sources.interleaved import interleaved_nested

    spark = get_spark("extract_job")
    spark.sparkContext.setLogLevel("WARN")

    if args.input:
        nested = spark.read.parquet(args.input)
    elif args.sf:
        nested = interleaved_nested(spark, args.sf, args.replication)
    else:
        ap.error("one of --input / --sf is required")

    result = run_extraction_job(
        spark, nested, args.output,
        resume=args.resume,
        partitions=args.partitions,
        max_span_bytes=args.max_span_bytes,
        mega_doc_bytes=args.mega_doc_bytes,
    )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
