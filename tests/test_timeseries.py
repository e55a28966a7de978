"""As-of join and binned range join: semantics, edges, plan shape."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))


@pytest.fixture(scope="module")
def spark():
    from html_qt_spark.plans.session import get_spark

    s = get_spark(cpus=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_asof_join_semantics(spark):
    from html_qt_spark.operators.timeseries import asof_join

    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 205), (3, "u", 50), (4, "v", 100)],
        ["event_id", "user_id", "ts"])
    right = spark.createDataFrame(
        [("u", 90, 9.0), ("u", 100, 10.0), ("u", 200, 20.0),
         ("w", 1, 1.0)],
        ["user_id", "ts", "value"])
    got = {r.event_id: r for r in
           asof_join(left, right, on="ts", by="user_id",
                     value_cols=["value"]).collect()}
    assert len(got) == 4                      # every left row survives
    assert got[1].asof_ts == 100              # tie: right at == matches
    assert got[1].asof_value == 10.0
    assert got[2].asof_ts == 200 and got[2].asof_value == 20.0
    assert got[3].asof_ts is None             # no earlier right row
    assert got[3].asof_value is None
    assert got[4].asof_ts is None             # key with no right rows


def test_asof_join_one_shuffle(spark):
    from html_qt_spark.operators.timeseries import asof_join

    left = spark.createDataFrame([(1, "u", 10)],
                                 ["event_id", "user_id", "ts"])
    right = spark.createDataFrame([("u", 5, 1.0)],
                                  ["user_id", "ts", "value"])
    plan = asof_join(left, right)._jdf.queryExecution() \
        .executedPlan().toString()
    # union + window: exactly one hashpartitioning exchange, no joins
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_range_join_binned_matches_naive(spark):
    from pyspark.sql import functions as F

    from html_qt_spark.operators.timeseries import range_join_binned

    points = spark.createDataFrame(
        [(i, i * 7 % 500) for i in range(200)], ["pid", "ts"])
    ranges = spark.createDataFrame(
        [(0, 10, 60), (1, 55, 55), (2, 400, 520), (3, 600, 700)],
        ["range_id", "range_start", "range_end"])
    got = range_join_binned(points, ranges, point_col="ts",
                            start_col="range_start",
                            end_col="range_end", bin_width=64)
    naive = points.crossJoin(ranges).where(
        F.col("ts").between(F.col("range_start"), F.col("range_end")))
    assert got.count() == naive.count() > 0
    a = {(r.pid, r.range_id) for r in got.collect()}
    b = {(r.pid, r.range_id) for r in naive.collect()}
    assert a == b
    # single-point interval and empty interval behave (inclusive ends)
    assert (1 in {r.range_id for r in got.collect()}) == any(
        i * 7 % 500 == 55 for i in range(200))
    assert 3 not in {r.range_id for r in got.collect()}


def test_range_join_no_nested_loop(spark):
    from html_qt_spark.operators.timeseries import range_join_binned

    points = spark.createDataFrame([(1, 10)], ["pid", "ts"])
    ranges = spark.createDataFrame([(0, 5, 15)],
                                   ["range_id", "range_start", "range_end"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = range_join_binned(
            points, ranges, point_col="ts", start_col="range_start",
            end_col="range_end", bin_width=8)._jdf.queryExecution() \
            .executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # the containment join runs as a hash equi-join on the bin id, never
    # the quadratic BroadcastNestedLoopJoin a raw BETWEEN join plans
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "SortMergeJoin [_bin" in plan or "ShuffledHashJoin [_bin" in plan, plan
