"""Isolate extract_doc cost components with noop sinks (guide §1.4).

Times, in one warmed session over the bench's cached nested input:
  A. noop(flat projection)        — input decode + struct flatten + Arrow-ready
  B. noop(extract_spans_doc)      — A + Python roundtrip + kernel + output
  C. noop(passthrough mapInArrow) — A + Python roundtrip (UDF yields input back)
So kernel+output ≈ B - C, roundtrip ≈ C - A, input ≈ A.

Usage: python tools/extract_breakdown.py [sf_dir] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    from pyspark.sql import functions as F

    from html_qt_spark.operators.extract import extract_spans_doc
    from html_qt_spark.plans.session import get_spark
    from html_qt_spark.sources.interleaved import interleaved_nested

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("extract_breakdown", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    replication = int(os.environ.get("SPARK_GRAFT_REPLICATION", "20"))
    nested = (interleaved_nested(spark, sf_dir, replication)
              .repartition(cpus * 2, "doc_id").persist())
    nested.count()

    flat = nested.select(
        "doc_id",
        F.col("spans.kind").alias("_kinds"),
        F.col("spans.text").alias("_texts"),
        F.col("spans.media_ref").alias("_refs"),
        F.col("spans.offset").alias("_offsets"),
    )

    def passthrough(batches):
        for rb in batches:
            yield rb

    pt = flat.mapInArrow(
        passthrough,
        schema=("doc_id string, _kinds array<string>, _texts array<string>,"
                " _refs array<string>, _offsets array<int>"))

    # warm workers
    extract_spans_doc(nested).count()
    for name, df in (("A_flat", flat), ("C_passthrough", pt),
                     ("B_full", extract_spans_doc(nested))):
        best = min(noop(df) for _ in range(2))
        print(f"{name}: {best:.2f}s")


if __name__ == "__main__":
    main()
