"""Time-series joins Spark lacks as built-ins, expressed as compositions
of existing DataFrame ops (no UDFs, no driver loops):

- as-of join: for every left row, the latest right row with
  right.ts <= left.ts per key — kdb/pandas ``merge_asof`` semantics.
  Spark has no ASOF JOIN; the naive theta-join
  (``l.ts >= r.ts`` + max) is a per-key cross product.  This
  implementation is the union + ordered-window trick: tag both sides,
  union, one window keyed on (by, ts) carrying the last right value
  forward — ONE shuffle total, linear work, skew bounded by the hottest
  key exactly like any keyed window.
- range join (binned): points joined to intervals containing them.
  Spark plans a raw BETWEEN join as BroadcastNestedLoopJoin (quadratic
  blowup at scale); bucketizing both sides to fixed-width bins turns it
  into an equi-join on the bin id + an exact residual filter — the
  standard interval-join decomposition (Databricks' range-join hint
  does the same internally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, *, on: str = "ts",
              by: str = "user_id", value_cols: list[str] | None = None,
              prefix: str = "asof_") -> DataFrame:
    """Left as-of join: every ``left`` row gains ``prefix+on`` (the
    matched right timestamp) and ``prefix+c`` for each right value
    column — the latest right row with right.on <= left.on in the same
    ``by`` group; NULLs when the key has no earlier right row.

    Tie rule: a right row at exactly left.on matches (<=) — the right
    row sorts before the left row at equal timestamps.

    A right value that is itself NULL is carried as NULL only if no
    earlier non-null value exists (``last(ignorenulls=True)`` skips
    nulls per column) — the usual forward-fill reading.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, by)]
    lcols = left.columns
    l_tagged = left.withColumn("_src", F.lit(1))
    r_tagged = right.select(
        F.col(by),
        F.col(on).alias("_r_on"),
        *[F.col(c).alias(prefix + c) for c in value_cols],
    ).withColumn("_src", F.lit(0))
    merged = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    ts_order = F.coalesce(F.col(on), F.col("_r_on"))
    w = (Window.partitionBy(by)
         .orderBy(ts_order.asc(), F.col("_src").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = [
        F.last(F.col(prefix + c), ignorenulls=True).over(w)
        .alias(prefix + c)
        for c in value_cols
    ]
    matched_on = F.last(F.col("_r_on"), ignorenulls=True).over(w) \
        .alias(prefix + on)
    return (merged
            .select(*lcols, "_src", matched_on, *carried)
            .where(F.col("_src") == 1)
            .drop("_src"))


def range_join_binned(points: DataFrame, ranges: DataFrame, *,
                      point_col: str, start_col: str, end_col: str,
                      bin_width: int) -> DataFrame:
    """Join point rows to every interval [start_col, end_col]
    (inclusive) containing them, via fixed-width binning: each interval
    explodes into the bins it covers (narrow), points compute their one
    bin (narrow), and the containment join becomes a hash equi-join on
    the bin id + an exact BETWEEN residual filter.

    Columns must be integral (epoch seconds/micros — callers convert
    timestamps first).  ``bin_width`` trades explode factor against join
    selectivity: ~the typical interval length is right (an interval
    covers <= len/width + 1 bins; a bin's points meet only intervals
    overlapping it).  Each qualifying (point, interval) pair emerges
    exactly once: the join fires only in the point's own bin.
    """
    binned_ranges = ranges.withColumn(
        "_bin",
        F.explode(F.sequence(
            F.floor(F.col(start_col) / bin_width),
            F.floor(F.col(end_col) / bin_width))))
    binned_points = points.withColumn(
        "_bin", F.floor(F.col(point_col) / bin_width))
    return (binned_points.join(binned_ranges, "_bin")
            .where(F.col(point_col).between(F.col(start_col),
                                            F.col(end_col)))
            .drop("_bin"))
