"""Structured Streaming extraction.

The reference is a batch parser (whole-string input, cmd/main.cpp:55) and
the north_rule pipeline is batch-over-Iceberg, but a crawl feed is
naturally a stream: this module exposes the same extraction as an
incremental job — file-source stream of interleaved documents →
mapInPandas extraction (stateless, so it streams without watermarks) →
parquet sink with exactly-once checkpointing.

Resume story mirrors the batch job: the streaming checkpoint directory
plays the role of the Iceberg snapshot pin — a restarted query continues
from the last committed batch, never re-emitting a processed doc.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from html_qt_spark.operators.extract import extract_spans_doc

NESTED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("spans", T.ArrayType(T.StructType([
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]))),
])


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start the streaming extraction query.

    ``available_now=True`` drains everything currently in ``input_dir``
    and stops (the test/backfill mode); ``False`` runs continuously
    picking up new files as the crawler drops them.
    """
    reader = spark.readStream.schema(NESTED_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    out = extract_spans_doc(stream)

    writer = (out.writeStream
              .format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
