"""spark-submit entrypoint for the corpus-curation pipeline.

Cluster:
  zip -r engine.zip html_qt_spark
  spark-submit --py-files engine.zip jobs/curate_job.py \
      --input <documents-parquet> --output <warehouse-dir> \
      [--benchmark <eval-parquet>] [--max-per-source N] [--alpha 0.5]

Sandbox smoke:
  python jobs/curate_job.py --sf /root/testdata/sf0.001 \
      --output /tmp/curate_out
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="documents parquet "
                    "(doc_id, text, lang, source)")
    ap.add_argument("--sf", help="testdata dir (reads documents.parquet)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--benchmark", help="eval-set parquet to "
                    "decontaminate against (doc_id, text)")
    ap.add_argument("--min-words", type=int, default=5)
    ap.add_argument("--alpha", type=float, default=0.5)
    ap.add_argument("--max-per-source", type=int, default=None)
    ap.add_argument("--para-max-doc-freq", type=int, default=None)
    ap.add_argument("--classifier-min-x1000", type=int, default=None,
                    help="gate docs on the hashed linear classifier "
                    "score (x1000); weights default to the stand-in")
    ap.add_argument("--mask-run-tokens", type=int, default=None,
                    help="mask token runs of this length appearing in "
                    ">=2 docs (exact-substring dedup) before doc dedup")
    ap.add_argument("--token-budget", type=int, default=2048)
    ap.add_argument("--subword-vocab-size", type=int, default=None,
                    help="budget shards by greedy subword counts over a "
                    "corpus-derived vocab of this size (default: "
                    "whitespace tokens)")
    args = ap.parse_args()

    from html_qt_spark.plans.curation_pipeline import run_curation_job
    from html_qt_spark.plans.session import get_spark

    spark = get_spark("curate_job")
    spark.sparkContext.setLogLevel("WARN")

    if args.input:
        docs = spark.read.parquet(args.input)
    elif args.sf:
        docs = spark.read.parquet(f"{args.sf}/documents.parquet")
    else:
        ap.error("one of --input / --sf is required")
    bench = spark.read.parquet(args.benchmark) if args.benchmark else None

    stats = run_curation_job(
        spark, docs, args.output, benchmark=bench,
        min_words=args.min_words, alpha=args.alpha,
        max_per_source=args.max_per_source,
        para_max_doc_freq=args.para_max_doc_freq,
        mask_run_tokens=args.mask_run_tokens,
        classifier_min_x1000=args.classifier_min_x1000,
        token_budget=args.token_budget,
        subword_vocab_size=args.subword_vocab_size)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
