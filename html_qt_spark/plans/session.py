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
      batch of documents must fit in a Python worker.  8192 rows measured
      +21% docs/sec over 2048 and +5% over 4096 after the r3 kernel
      speedups (faster kernel -> roundtrip overhead dominates sooner).
      Worst-case batch memory = maxRecordsPerBatch x the largest span a
      pipeline admits: with extract's max_span_bytes quarantine and
      chunk_split_exploded in front, spans are bounded and 8192 is safe;
      for corpora with unbounded raw docs and no oversize guard, drop to
      2048 (env SPARK_GRAFT_ARROW_BATCH).
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
                os.environ.get("SPARK_GRAFT_ARROW_BATCH", "8192"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    return builder.getOrCreate()
