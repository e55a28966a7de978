"""Corpus-curation operators: deterministic sampling and shard packing.

Production training-data pipelines sample and shard *deterministically*
(a re-run must pick the same documents — RNG-based sample() is not
reproducible across cluster layouts), so both operators here are pure
functions of the data:

- hash_sample: keep a doc iff hash(salt || doc_id) mod M < rate*M — the
  standard reproducible down-sampler; changing the salt draws an
  independent sample.
- pack_shards: assign documents to contiguous training shards of
  ~token_budget tokens (running-sum bucketing in deterministic doc
  order) — the "pack documents into fixed-size shards" step before
  sequence building.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _id_hash(col, salt: str, hash_fn: str):
    s = F.concat(F.lit(salt + ":"), F.col(col).cast("string"))
    if hash_fn == "md5_32":
        return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    return F.pmod(F.xxhash64(s), F.lit(2**31)).cast("long")


def hash_sample(docs: DataFrame, *, rate: float, salt: str = "s0",
                id_col: str = "doc_id",
                hash_fn: str = "xxhash64") -> DataFrame:
    """Deterministic ``rate``-fraction sample keyed on the document id.

    One narrow filter — no shuffle, no RNG state; the same (salt, rate)
    always selects the same documents on any cluster.  ``hash_fn``
    "md5_32" is the engine-portable family used by the DuckDB oracle.
    """
    m = 1_000_000
    return docs.where(
        _id_hash(id_col, salt, hash_fn) % m < int(rate * m))


def pack_shards(docs: DataFrame, *, token_budget: int,
                tokens_col: str = "n_tokens",
                id_col: str = "doc_id",
                partition_cols: list[str] | None = None) -> DataFrame:
    """Assign each document a shard_id so consecutive documents (in
    deterministic ``id_col`` order) fill ~``token_budget`` tokens per
    shard: shard_id = floor(exclusive-prefix-sum(tokens) / budget).

    A document larger than the budget gets its own shard (never split
    here — sequence-level splitting happens downstream).

    ``partition_cols`` (e.g. a date / lang / bucket column) is the scale
    path: each partition packs independently — the prefix-sum window is
    ``Window.partitionBy(*partition_cols)``, so the physical plan is one
    hash Exchange on those columns instead of a single-partition global
    sort, and shard identity is (partition_cols..., shard_id).  The
    unpartitioned default is a GLOBAL pack — an explicit special case
    that funnels every row through one task's sort; only use it for
    small curated sets (or oracle checks), never at corpus scale.
    Returns input columns + shard_id.
    """
    if partition_cols:
        w = (Window.partitionBy(*partition_cols).orderBy(id_col)
             .rowsBetween(Window.unboundedPreceding, -1))
    else:
        w = (Window.orderBy(id_col)
             .rowsBetween(Window.unboundedPreceding, -1))
    return (docs.withColumn(
        "_cum_before",
        F.coalesce(F.sum(tokens_col).over(w), F.lit(0)))
        .withColumn("shard_id",
                    (F.col("_cum_before") / F.lit(token_budget))
                    .cast("long"))
        .drop("_cum_before"))
