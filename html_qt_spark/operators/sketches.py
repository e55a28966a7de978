"""Distributed sketches with deterministic, engine-portable math.

KMV (k-minimum-values) distinct-count sketch, Bar-Yossef et al. 2002:
hash every value to [0,1); keep the k smallest distinct hashes; estimate
|distinct| as (k-1)/h_k where h_k is the k-th smallest.  Spark's own
``approx_count_distinct`` is HLL++ — a black-box binary sketch no other
engine reproduces; KMV with the md5-prefix hash family is bit-portable,
so the estimate itself gets an EXACT cross-engine oracle, and sketches
merge by unioning hash sets and re-taking the k smallest (the classic
distributed-mergeable property).

Plan shape at 10^12 rows: distinct (one shuffle with map-side partial),
a per-group rank window over distinct hashes (WindowGroupLimit applies
a partial top-k map-side), and a per-group aggregate — the full hash
set never concentrates anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCALE = float(2**32)


def kmv_distinct(df: DataFrame, *, col: str = "text",
                 group_col: str | None = None, k: int = 64) -> DataFrame:
    """Estimated distinct count of ``col`` (optionally per
    ``group_col``): returns (group?, n_hashed, est_distinct).

    ``n_hashed`` = number of distinct hashes retained (= min(k, true
    distinct count)); when the group has fewer than k distinct values
    the estimate is exact by construction.  est_distinct is floored to
    a BIGINT after the (k-1)/h_k division — deterministic double math
    on both engines (single division of exact integers).
    """
    h = (F.conv(F.substring(F.md5(F.col(col)), 1, 8), 16, 10)
         .cast("long") / F.lit(_SCALE))
    keys = [group_col] if group_col else []
    hashes = df.select(*keys, h.alias("_h")).distinct()
    if group_col:
        # WindowGroupLimit gives a map-side partial top-k per group
        w = Window.partitionBy(group_col).orderBy("_h")
        ranked = (hashes.withColumn("_rk", F.row_number().over(w))
                  .where(F.col("_rk") <= k))
    else:
        # global: TakeOrdered (per-partition top-k + driver merge of
        # k rows/task), never a single-partition sort of all hashes
        ranked = hashes.orderBy("_h").limit(k)
    agg_keys = keys or [F.lit(1).alias("_g")]
    out = (ranked.groupBy(*agg_keys)
           .agg(F.count("*").alias("n_hashed"),
                F.max("_h").alias("_hk"))
           .select(*keys, "n_hashed",
                   F.when(F.col("n_hashed") < k, F.col("n_hashed"))
                   .otherwise(F.floor((k - 1) / F.col("_hk")))
                   .cast("long").alias("est_distinct")))
    return out
