"""Structured Streaming extraction: stream result == batch result, and
checkpoint restart does not re-emit processed docs."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from html_qt_spark.plans.session import get_spark

    s = get_spark(cpus=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_stream_matches_batch_and_checkpoints(spark, tmp_path):
    from html_qt_spark.operators.extract import extract_spans_doc
    from html_qt_spark.sources.interleaved import interleaved_nested
    from html_qt_spark.streaming.extract_stream import stream_extract

    nested = interleaved_nested(spark, SF).limit(200).cache()
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    nested.write.parquet(in_dir)

    q = stream_extract(spark, in_dir, out_dir, ckpt, available_now=True)
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir)
    want = extract_spans_doc(spark.read.parquet(in_dir))
    assert got.count() == want.count()
    assert (got.exceptAll(want).count() == 0
            and want.exceptAll(got).count() == 0)

    # restart against the same checkpoint: nothing new to process
    q2 = stream_extract(spark, in_dir, out_dir, ckpt, available_now=True)
    q2.awaitTermination(300)
    assert spark.read.parquet(out_dir).count() == want.count()


def test_stateful_stream_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState: first-seen-wins dedup; state survives a
    checkpointed restart so a re-fed duplicate is NOT re-emitted."""
    import pandas as pd

    from html_qt_spark.streaming.dedup_stream import stream_dedup

    in_dir = tmp_path / "in"
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    in_dir.mkdir()

    # batch 1: docs A, B (B duplicated within the batch)
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3],
                      "text": ["alpha", "beta", "beta"]})
    ).write.parquet(str(in_dir / "b1"))
    q = stream_dedup(spark, str(in_dir) + "/*", out_dir, ckpt)
    q.awaitTermination(300)
    out1 = {(r.fp, r.text) for r in spark.read.parquet(out_dir).collect()}
    assert len(out1) == 2  # alpha + beta once

    # batch 2 (restart from checkpoint): duplicate of beta + new gamma
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [4, 5],
                      "text": ["beta", "gamma"]})
    ).write.parquet(str(in_dir / "b2"))
    q2 = stream_dedup(spark, str(in_dir) + "/*", out_dir, ckpt)
    q2.awaitTermination(300)
    rows = spark.read.parquet(out_dir).collect()
    texts = sorted(r.text for r in rows)
    assert texts == ["alpha", "beta", "gamma"]  # beta NOT re-emitted
