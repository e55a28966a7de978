"""Production extraction job: spans + quarantine + lineage + metrics
sinks, checkpoint-resume via anti-join (north_rule).

In production the sinks are Iceberg tables (``df.writeTo(...).append()``
with snapshot isolation; resume pins the input snapshot id).  Both modes
ship in this module: pass ``out_dir="iceberg:<catalog>.<db>"`` from a
session built with ``get_spark(iceberg_warehouse=…)`` (which detects the
runtime jar, plans/session.py:find_iceberg_jar) and every sink becomes a
real ``writeTo`` table commit; a plain directory ``out_dir`` keeps the
parquet layout the jar-less sandbox uses (SURVEY.md §7 step 6).

Layout under ``out_dir``:
  spans/       (doc_id, span_idx, kind, text, media_ref, offset)
  quarantine/  (doc_id, reason, error_pos)
  lineage/     (run_id, partition_id, docs_in, docs_out, spans_out,
                quarantined, input_snapshot_id)
  metrics/     (run_id, key, value)

Resume semantics: a re-run with ``resume=True`` anti-joins the input
against doc_ids already committed in spans/ + quarantine/, so a job killed
mid-write continues from whatever partitions committed — zero duplicate
(doc_id, span_idx) pairs (FIXTURES.md §6 invariant).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from html_qt_spark.operators.extract import (
    QUARANTINE_KIND,
    chunk_split_exploded,
    extract_spans_doc,
    extract_spans_exploded,
)


def _sink(out_dir: str, name: str) -> str:
    """Sink target for one of the job's four tables.  ``out_dir`` may
    be a directory (parquet layout) or ``iceberg:<catalog>.<db>`` —
    the scheme a session built with ``get_spark(iceberg_warehouse=…)``
    (and a detected runtime jar) can commit to with real snapshot
    isolation."""
    if out_dir.startswith("iceberg:"):
        return f"{out_dir}.{name}"
    return f"{out_dir}/{name}"


def _write(df: DataFrame, target: str, mode: str = "append") -> None:
    if target.startswith("iceberg:"):
        tbl = target[len("iceberg:"):]
        # create only when the table genuinely does not exist — a bare
        # try/create would bury real append failures (schema drift,
        # commit conflicts, catalog misconfiguration) under a confusing
        # "table already exists" from the retry
        if df.sparkSession.catalog.tableExists(tbl):
            df.writeTo(tbl).append()
        else:
            df.writeTo(tbl).create()
        return
    df.write.mode(mode).parquet(target)


def _read_sink(spark: SparkSession, out_dir: str, name: str) -> DataFrame:
    target = _sink(out_dir, name)
    if target.startswith("iceberg:"):
        return spark.read.table(target[len("iceberg:"):])
    return spark.read.parquet(target)


def run_extraction_job(
    spark: SparkSession,
    nested: DataFrame,
    out_dir: str,
    *,
    run_id: str | None = None,
    resume: bool = False,
    partitions: int | None = None,
    max_span_bytes: int | None = 16_000_000,
    mega_doc_bytes: int | None = None,
    input_snapshot_id: str = "parquet-sandbox",
) -> dict:
    """Run the flagship extraction with lineage + resume.

    Partitioning (north_rule): repartition by xxhash64(doc_id) so doc
    placement is uniform and deterministic; ``partitions`` defaults to
    2x parallelism.  The extraction itself adds no shuffle.

    ``mega_doc_bytes``: optional skew escape hatch — documents whose
    total span bytes exceed it leave the zero-shuffle doc path and take
    the exploded + chunk-split route (per-span parallelism, oversized
    spans split at block boundaries), so one 1-GB document cannot stall
    a task.  The split predicate is a JVM aggregate over the spans
    array; the mega subset is a vanishing fraction of a crawl, so the
    common path stays a narrow map.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    sc = spark.sparkContext
    partitions = partitions or sc.defaultParallelism * 2

    if resume:
        done: DataFrame | None = None
        for sub in ("spans", "quarantine"):
            try:
                prev = _read_sink(spark, out_dir, sub) \
                    .select("doc_id").distinct()
                done = prev if done is None else done.union(prev).distinct()
            except Exception:  # noqa: BLE001 — sink may not exist yet
                continue
        if done is not None:
            nested = nested.join(done, "doc_id", "left_anti")

    nested = nested.repartition(
        partitions, F.pmod(F.xxhash64("doc_id"), F.lit(partitions)))

    t0 = time.time()
    if mega_doc_bytes:
        doc_bytes = F.aggregate(
            F.col("spans"), F.lit(0).cast("long"),
            lambda acc, s: acc + F.coalesce(F.length(s["text"]),
                                            F.lit(0)).cast("long"))
        sized = nested.withColumn("_doc_bytes", doc_bytes)
        small = sized.where(F.col("_doc_bytes") <= mega_doc_bytes) \
            .drop("_doc_bytes")
        mega_exploded = (
            sized.where(F.col("_doc_bytes") > mega_doc_bytes)
            .select("doc_id", F.explode("spans").alias("s"))
            .select("doc_id", F.col("s.offset").alias("offset"),
                    F.col("s.kind").alias("kind"),
                    F.col("s.text").alias("text"),
                    F.col("s.media_ref").alias("media_ref")))
        out = extract_spans_doc(small, max_span_bytes=max_span_bytes) \
            .unionByName(extract_spans_exploded(
                chunk_split_exploded(mega_exploded,
                                     threshold_bytes=mega_doc_bytes)))
    else:
        out = extract_spans_doc(nested, max_span_bytes=max_span_bytes)
    # one pass, cached at the partition boundary so the three sinks below
    # don't re-run the kernel
    out = out.persist()
    spans = out.where(F.col("kind") != QUARANTINE_KIND)
    quarantine = out.where(F.col("kind") == QUARANTINE_KIND).select(
        "doc_id",
        F.col("text").alias("reason"),
        F.col("offset").alias("error_pos"),
    )

    _write(spans, _sink(out_dir, "spans"))
    _write(quarantine, _sink(out_dir, "quarantine"))
    wall_ms = int((time.time() - t0) * 1000)

    # lineage: per-partition counters (cheap JVM aggregations over the
    # cached one-pass output; docs_in from the repartitioned input)
    docs_in = (nested.select("doc_id",
                             F.spark_partition_id().alias("partition_id"))
               .groupBy("partition_id")
               .agg(F.count("*").alias("docs_in")))
    out_part = (out.select("doc_id", "kind",
                           F.spark_partition_id().alias("partition_id"))
                .groupBy("partition_id")
                .agg(F.countDistinct("doc_id").alias("docs_out"),
                     F.sum(F.when(F.col("kind") != QUARANTINE_KIND, 1)
                           .otherwise(0)).alias("spans_out"),
                     F.sum(F.when(F.col("kind") == QUARANTINE_KIND, 1)
                           .otherwise(0)).alias("quarantined")))
    lineage = (docs_in.join(out_part, "partition_id", "full")
               .na.fill(0)
               .select(F.lit(run_id).alias("run_id"), "partition_id",
                       "docs_in", "docs_out", "spans_out", "quarantined",
                       F.lit(input_snapshot_id).alias("input_snapshot_id")))
    _write(lineage, _sink(out_dir, "lineage"))

    totals = out.agg(
        F.countDistinct("doc_id").alias("docs"),
        F.sum(F.when(F.col("kind") != QUARANTINE_KIND, 1).otherwise(0))
        .alias("spans"),
        F.sum(F.when(F.col("kind") == QUARANTINE_KIND, 1).otherwise(0))
        .alias("quarantined"),
    ).collect()[0]
    metrics = spark.createDataFrame(
        [(run_id, "docs_out", float(totals["docs"] or 0)),
         (run_id, "spans_out", float(totals["spans"] or 0)),
         (run_id, "quarantined", float(totals["quarantined"] or 0)),
         (run_id, "wall_ms", float(wall_ms))],
        ["run_id", "key", "value"])
    _write(metrics, _sink(out_dir, "metrics"))
    out.unpersist()

    return {
        "run_id": run_id,
        "docs_out": int(totals["docs"] or 0),
        "spans_out": int(totals["spans"] or 0),
        "quarantined": int(totals["quarantined"] or 0),
        "wall_ms": wall_ms,
    }
