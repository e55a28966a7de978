"""SparkSession factory with the engine's scale-tuned defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "html_qt_spark", *, cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Local-mode session sized per driver env; on a real cluster these
    settings come from spark-submit and this builder is a no-op getOrCreate.

    - AQE on: post-shuffle coalescing + skew-join splitting for free.
    - Arrow batch capped (north_rule skew note, SURVEY.md §4.1): one Arrow
      batch of mega-documents must fit in a Python worker; 2048 rows
      balances roundtrip overhead (measured +14% docs/sec over 256) against
      worst-case batch memory — drop this if mega-docs exceed ~1MB each.
    - shuffle.partitions sized to cores (not the 200 default) so the
      window/groupBy stages don't fragment at small scale; at cluster
      scale this is set to 2-3x total cores by the submitter.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = SparkSession.builder
    # under spark-submit the master (cluster URL) comes from the submitter;
    # only force local[N] when launched as a bare python process
    if not os.environ.get("SPARK_ENV_LOADED"):
        builder = builder.master(f"local[{cpus}]")
    builder = (
        builder
        .appName(app)
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("SPARK_GRAFT_ARROW_BATCH", "2048"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    return builder.getOrCreate()
