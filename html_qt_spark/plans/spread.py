"""Scale-adaptive input parallelism guard (optimization guide §2.5, §6).

A scan of a single unsplittable file (or a parquet file with one row
group) yields fewer partitions than the cluster has cores, so every
downstream map-side stage — explode + hash in MinHash, md5 in exact
dedup, the dot-product scoring in cosine top-k — runs on a handful of
cores while the rest idle.  AQE cannot fix this: it only coalesces or
splits *shuffle* partitions, never scan partitions, and a one-row-group
parquet file cannot be byte-range split.

``spread_input`` repartitions ONLY when the input's planned partition
count is below the cluster's core count; at real scale (thousands of
files/splits) it is a no-op, so no shuffle is ever added where the scan
already parallelizes.  The target count and the trigger both derive
from ``defaultParallelism`` — nothing is tuned to the sandbox's core
count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_input(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition ``df`` to 2x cluster parallelism iff it would
    otherwise scan with fewer partitions than the cluster has cores.

    ``cols``: optional partitioning key (e.g. the downstream groupBy
    key).  Keyed repartitioning skips the local sort a round-robin
    repartition pays (SPARK-23207) and lets a same-key downstream
    aggregation reuse the exchange.

    Cost note: reading the partition count via ``df.rdd`` compiles the
    upstream plan once at build time on the driver.  The wrapped
    operators sit directly on table scans (cheap plans), and the probe
    runs once per query build, not per execution — accepted trade for
    not silently single-coring an unsplittable input.
    """
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    try:
        n_parts = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover — exotic plans; stay a no-op
        return df
    if n_parts >= cores:
        return df
    target = cores * 2
    return df.repartition(target, *cols) if cols else df.repartition(target)
