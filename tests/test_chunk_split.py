"""Mega-doc chunk-split (VERDICT r1 item 8; SURVEY §4.2).

A single oversized text span must split into chunk rows before the kernel
(so no one task owns a 1-GB parse) and reassemble into the same span
sequence the unsplit path produces.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).parent.parent))


@pytest.fixture(scope="module")
def spark():
    from html_qt_spark.plans.session import get_spark

    s = get_spark(cpus=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _exploded(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, offset int, kind string, text string, "
              "media_ref string")


def _mega_html(n_blocks=4000):
    # ~1.3 MB of block-structured content: the realistic mega-doc shape
    return "".join(
        f"<h2>Section {i}</h2><p>para {i} with some words here</p>"
        f"<div>extra {i}</div>"
        for i in range(n_blocks))


def test_mega_span_splits_and_matches_unsplit(spark):
    from html_qt_spark.operators.extract import (
        chunk_split_exploded, extract_spans_exploded)

    html = _mega_html()
    rows = [("d1", 0, "text", "<p>small lead</p>", None),
            ("d1", 1, "text", html, None),
            ("d1", 2, "media", None, "img://x/1"),
            ("d2", 0, "text", "<p>another doc</p>", None)]
    df = _exploded(spark, rows)

    split = chunk_split_exploded(df, threshold_bytes=200_000,
                                 target_chunk_bytes=100_000)
    n_chunks = split.where(
        (F.col("doc_id") == "d1") & (F.col("offset") == 1)).count()
    assert n_chunks > 1  # the mega span really fanned out

    got = (extract_spans_exploded(split)
           .orderBy("doc_id", "span_idx").collect())
    want = (extract_spans_exploded(df)
            .orderBy("doc_id", "span_idx").collect())
    assert got == want
    assert len(want) == 3 * 4000 + 3  # blocks + lead + media + d2


def test_chunks_spread_over_multiple_tasks(spark):
    from html_qt_spark.operators.extract import chunk_split_exploded

    html = _mega_html()
    df = _exploded(spark, [("d1", 0, "text", html, None)])
    split = chunk_split_exploded(df, threshold_bytes=200_000,
                                 target_chunk_bytes=100_000)
    parts = (split.repartition(8, "doc_id", "offset", "_chunk")
             .select(F.spark_partition_id().alias("pid"))
             .distinct().count())
    assert parts > 1  # >1 task touches the single mega document


def test_unsafe_content_never_splits(spark):
    from html_qt_spark.operators.extract import (
        chunk_split_exploded, extract_spans_exploded)

    # a block tag inside a script body: splitting there would leak JS text
    html = ("<p>before</p><script>var s = '<p>fake</p>';</script>"
            + _mega_html(1000))
    df = _exploded(spark, [("d1", 0, "text", html, None)])
    split = chunk_split_exploded(df, threshold_bytes=10_000,
                                 target_chunk_bytes=5_000)
    assert split.count() == 1  # passthrough, no split
    spans = extract_spans_exploded(split).collect()
    assert not any("fake" in (r.text or "") for r in spans)


def test_small_spans_pass_through_untouched(spark):
    from html_qt_spark.operators.extract import chunk_split_exploded

    rows = [("d1", 0, "text", "<p>tiny</p>", None),
            ("d1", 1, "media", None, "img://m/1")]
    df = _exploded(spark, rows)
    out = chunk_split_exploded(df).collect()
    assert len(out) == 2
    assert all(r._chunk == 0 for r in out)


def test_span_without_cut_points_stays_whole(spark):
    from html_qt_spark.operators.extract import chunk_split_exploded

    html = "<span>" + "word " * 100_000 + "</span>"  # no block tags
    df = _exploded(spark, [("d1", 0, "text", html, None)])
    split = chunk_split_exploded(df, threshold_bytes=100_000,
                                 target_chunk_bytes=50_000)
    assert split.count() == 1


def test_media_captions_nearest_text_context(spark):
    """Caption pairing: nearest preceding/following TEXT span per media
    span, skipping intervening media (ignorenulls); document edges give
    null; one doc-keyed exchange, no join."""
    from html_qt_spark.operators.multimodal import media_captions

    rows = [
        # doc 1: media at start (no before), consecutive media share
        # the same neighbors, media at end (no after)
        (1, 0, "media", None, "img://a"),
        (1, 1, "text", "first para", None),
        (1, 2, "media", None, "img://b"),
        (1, 3, "media", None, "img://c"),
        (1, 4, "text", "second para", None),
        (1, 5, "media", None, "img://d"),
        # doc 2: no media at all -> contributes no rows
        (2, 0, "text", "lonely", None),
    ]
    spans = spark.createDataFrame(
        rows, ["doc_id", "offset", "kind", "text", "media_ref"])
    got = {r.media_ref: (r.caption_before, r.caption_after)
           for r in media_captions(spans).collect()}
    assert got == {
        "img://a": (None, "first para"),
        "img://b": ("first para", "second para"),
        "img://c": ("first para", "second para"),
        "img://d": ("second para", None),
    }
    plan = media_captions(spans)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    assert "Join" not in plan, plan
