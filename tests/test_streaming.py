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


def test_windowed_metrics_watermark_drops_late_rows(spark, tmp_path):
    """Watermarked tumbling-window agg (event-time): a row arriving more
    than the watermark behind the max seen event time is dropped, and a
    window only finalizes once the watermark passes it (append mode)."""
    import time as _time

    from pyspark.sql import functions as F

    from html_qt_spark.streaming.extract_stream import (
        METRICS_SCHEMA, stream_windowed_metrics)

    in_dir = tmp_path / "metrics_in"
    in_dir.mkdir()

    def write_file(name, rows):
        df = spark.createDataFrame(rows, METRICS_SCHEMA)
        df.coalesce(1).write.parquet(str(in_dir / name))
        _time.sleep(1.1)  # distinct mtimes: file source processes oldest first

    from datetime import datetime
    t = datetime(2026, 1, 1, 10, 0, 0)

    def ts(minute):
        return t.replace(minute=minute)

    # trigger 1: window [10:00,10:10) gets 2 docs; max event time 10:05
    write_file("f1", [(ts(0), "a", 3), (ts(5), "b", 4)])
    # trigger 2: window [10:30,10:40) — watermark advances to 10:25
    write_file("f2", [(ts(35), "c", 5)])
    # trigger 3: watermark 10:25 is now ACTIVE (it lags one micro-batch);
    # the 10:00 window finalizes and its state evicts after this batch
    write_file("f3", [(ts(36), "d", 6)])
    # trigger 4: LATE row for the already-finalized 10:00 window
    # (10:01 << watermark 10:26) — must be dropped, not double-counted
    write_file("f4", [(ts(1), "late", 99)])

    q = stream_windowed_metrics(
        spark, str(in_dir), str(tmp_path / "metrics_ckpt"),
        query_name="span_metrics_t")
    q.awaitTermination(300)

    emitted = spark.sql("SELECT * FROM span_metrics_t").collect()
    rows = {r.w_start.minute: (r.n_docs, r.n_spans) for r in emitted}
    # the 10:00 window finalized exactly once, with ONLY the on-time rows
    assert rows[0] == (2, 7)
    assert sum(1 for r in emitted if r.w_start.minute == 0) == 1
    # the 10:30 window never finalized (stream ended before its watermark)
    assert 30 not in rows


def test_stream_markdown_matches_batch(spark, tmp_path):
    from html_qt_spark.operators.extract import extract_markdown_doc
    from html_qt_spark.sources.interleaved import interleaved_nested
    from html_qt_spark.streaming.extract_stream import stream_extract

    nested = interleaved_nested(spark, SF).limit(100).cache()
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    nested.write.parquet(in_dir)

    q = stream_extract(spark, in_dir, out_dir, ckpt, available_now=True,
                       mode="markdown")
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir)
    want = extract_markdown_doc(spark.read.parquet(in_dir))
    assert got.count() == want.count() == 100
    assert (got.exceptAll(want).count() == 0
            and want.exceptAll(got).count() == 0)
    # checkpoint restart: no re-emission
    q2 = stream_extract(spark, in_dir, out_dir, ckpt, available_now=True,
                        mode="markdown")
    q2.awaitTermination(300)
    assert spark.read.parquet(out_dir).count() == 100


def test_stream_near_dedup_lsh(spark, tmp_path):
    """Streaming MinHash-LSH near-dup: a later near-duplicate (one word
    changed) of an earlier doc is dropped across micro-batches; unique
    docs survive; restart re-emits nothing."""
    from html_qt_spark.streaming.dedup_stream import (
        DOC_SCHEMA,
        stream_near_dedup,
    )

    base = ("the quick brown fox jumps over the lazy dog while rain "
            "falls gently on the quiet village roofs tonight ") * 4
    near = base.replace("gently", "softly", 1)
    uniq = ("completely different content about distributed query "
            "engines and columnar execution with vectorized batches")
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    store = str(tmp_path / "store")
    # batch 1: base + an intra-batch near-dup (id 20 loses to id 10)
    spark.createDataFrame(
        [(10, base), (20, base + " extra")], DOC_SCHEMA
    ).write.mode("append").parquet(in_dir)
    q = stream_near_dedup(spark, in_dir, out_dir, ckpt, store,
                          bands=8, available_now=True)
    q.awaitTermination(300)
    got1 = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    assert got1 == {10}
    # batch 2: near-dup of batch-1 doc (dropped) + unique doc (kept)
    spark.createDataFrame(
        [(30, near), (40, uniq)], DOC_SCHEMA
    ).write.mode("append").parquet(in_dir)
    q2 = stream_near_dedup(spark, in_dir, out_dir, ckpt, store,
                           bands=8, available_now=True)
    q2.awaitTermination(300)
    got2 = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    assert got2 == {10, 40}, got2
    # restart with nothing new: no re-emission
    q3 = stream_near_dedup(spark, in_dir, out_dir, ckpt, store,
                           bands=8, available_now=True)
    q3.awaitTermination(300)
    assert {r.doc_id
            for r in spark.read.parquet(out_dir).collect()} == {10, 40}


def test_near_dedup_store_pruned_and_compacted(spark, tmp_path):
    """VERDICT r3 task #2: per-batch store reads must be partition-
    PRUNED (not full-scan) and compaction must bound the store's file
    count — with output rows identical to the full-scan semantics."""
    import collections
    from pathlib import Path

    from html_qt_spark.streaming.dedup_stream import (
        DOC_SCHEMA,
        compact_bucket_store,
        pruned_store_read,
        stream_near_dedup,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    store = str(tmp_path / "store")
    texts = {}

    def doc(i, base_words):
        return (i, " ".join(base_words) + f" tail{i % 3}")

    # 6 micro-batches x 4 docs: three recurring near-dup families +
    # uniques; maxFilesPerTrigger=1 forces one batch per input file
    base_a = ["alpha beta gamma delta epsilon zeta eta theta"] * 3
    n_batches = 6
    expect_seen: dict[str, int] = {}
    for b in range(n_batches):
        rows = [doc(100 * b + j, base_a) for j in range(3)]
        rows.append((100 * b + 50,
                     f"unique content batch {b} about engines "
                     f"and columnar execution run{b} word{b}"))
        for i, t in rows:
            texts[i] = t
        spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(in_dir)
    q = stream_near_dedup(spark, in_dir, out_dir, ckpt, store,
                          bands=8, available_now=True,
                          max_files_per_trigger=1, compact_every=3)
    q.awaitTermination(600)

    got = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    # reference semantics (full-scan first-wins): replay in plain python
    from html_qt_spark.streaming.dedup_stream import _band_buckets_udf
    import pandas as pd
    udf_fn = None  # compute buckets via the same row-local logic
    import hashlib

    def buckets_of(t, num_hashes=16, bands=8, shingle_n=3):
        toks = [x for x in t.split(" ") if x]
        sh = {" ".join(toks[i:i + shingle_n])
              for i in range(max(len(toks) - shingle_n + 1, 0))}
        if not sh:
            return []
        rpb = num_hashes // bands
        sigs = [min(hashlib.md5(f"{j}:{s}".encode()).hexdigest()
                    for s in sh) for j in range(num_hashes)]
        return [f"{b}:" + hashlib.md5(
            "|".join(sigs[b * rpb:(b + 1) * rpb]).encode()).hexdigest()
            for b in range(bands)]

    # replay the operator's exact semantics: intra-batch a doc survives
    # iff it is the batch-min owner of EVERY one of its buckets; cross-
    # batch it additionally must touch no already-claimed bucket
    claimed: set[str] = set()
    expect: set[int] = set()
    for b in range(n_batches):
        batch_ids = sorted([100 * b + j for j in range(3)] + [100 * b + 50])
        bucket_min: dict[str, int] = {}
        for i in batch_ids:
            for x in buckets_of(texts[i]):
                bucket_min[x] = min(bucket_min.get(x, i), i)
        survivors = [
            i for i in batch_ids
            if all(bucket_min[x] == i for x in buckets_of(texts[i]))
            and not any(x in claimed for x in buckets_of(texts[i]))]
        expect |= set(survivors)
        claimed |= {x for i in survivors for x in buckets_of(texts[i])}
    assert got == expect, (got, expect)

    # store layout: hash-prefix partitioned
    pfx_dirs = [p.name for p in Path(store).iterdir()
                if p.name.startswith("pfx=")]
    assert pfx_dirs, list(Path(store).iterdir())

    # pruning: the plan must carry a PartitionFilter on pfx (directory
    # pruning, not a post-scan filter) …
    one = pfx_dirs[0].split("=", 1)[1]
    pruned = pruned_store_read(spark, store, [one])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "pfx" in \
        plan.split("PartitionFilters", 1)[1][:80], plan
    # … and functionally: plant a garbage file in ANOTHER partition —
    # a pruned read never opens that directory, a full scan would choke
    bad_dir = Path(store) / "pfx=zz"
    bad_dir.mkdir()
    (bad_dir / "part-garbage.parquet").write_bytes(b"not parquet at all")
    assert pruned_store_read(spark, store, [one]).count() >= 1
    with pytest.raises(Exception):
        pruned_store_read(spark, store, ["zz"]).count()
    import shutil as _sh
    _sh.rmtree(bad_dir)

    # compaction: after an explicit compact, each partition holds ONE
    # file and the bucket set is unchanged
    before = set(r.bucket for r in
                 spark.read.parquet(store).select("bucket").collect())
    compact_bucket_store(spark, store)
    after_df = spark.read.parquet(store)
    after = set(r.bucket for r in after_df.select("bucket").collect())
    assert after == before
    per_dir = collections.Counter()
    for p in Path(store).rglob("*.parquet"):
        per_dir[p.parent.name] += 1
    assert per_dir and all(v == 1 for v in per_dir.values()), per_dir


def test_bucket_pfx_survives_type_inference_and_wide_bands(spark, tmp_path):
    """ADVICE r4: an all-digit pfx population ('07', ...) used to be
    read back through partition-column type inference as int, silently
    defeating the string isin prune (cross-batch dupes pass) and
    desynchronizing compaction's directory layout.  The pfx is now
    non-numeric by construction ('p' + band + hex char) and derived by
    splitting on the bucket's ':' so bands >= 10 keep distinct,
    non-colliding prefixes."""
    from pyspark.sql import functions as F

    from html_qt_spark.streaming.dedup_stream import (
        _bucket_pfx,
        compact_bucket_store,
        pruned_store_read,
    )

    # multi-digit band + digit-only hash prefix: the worst case
    rows = [("0:7fc1",), ("0:07aa",), ("12:abcd",), ("12:9bcd",),
            ("3:00ff",)]
    df = spark.createDataFrame(rows, ["bucket"])
    got = {r.bucket: r.pfx for r in
           df.select("bucket", _bucket_pfx(F.col("bucket")).alias("pfx"))
           .collect()}
    assert got == {"0:7fc1": "p07", "0:07aa": "p00", "12:abcd": "p12a",
                   "12:9bcd": "p129", "3:00ff": "p30"}

    # write a store whose every pfx is digit-heavy; read back and prune
    store = str(tmp_path / "store")
    (df.select("bucket", _bucket_pfx(F.col("bucket")).alias("pfx"))
     .write.mode("append").partitionBy("pfx").parquet(store))
    back = pruned_store_read(spark, store, ["p07"])
    assert dict(back.dtypes)["pfx"] == "string"
    assert [r.bucket for r in back.collect()] == ["0:7fc1"]
    # compaction keeps the same string directory names
    compact_bucket_store(spark, store)
    dirs = sorted(p.name for p in Path(store).iterdir()
                  if p.name.startswith("pfx="))
    assert dirs == ["pfx=p00", "pfx=p07", "pfx=p129", "pfx=p12a",
                    "pfx=p30"]
    assert [r.bucket for r in
            pruned_store_read(spark, store, ["p07"]).collect()] == \
        ["0:7fc1"]


def test_bucket_store_legacy_layout_reads_full_and_compacts_forward(
        spark, tmp_path):
    """Review fix: a store written under the pre-'p' digit-prefix
    scheme must not be silently orphaned — reads fall back to an
    unpruned (correct) scan, and one compaction migrates the layout to
    the current prefixes."""
    from pyspark.sql import functions as F

    from html_qt_spark.streaming.dedup_stream import (
        _bucket_pfx,
        compact_bucket_store,
        pruned_store_read,
    )

    store = str(tmp_path / "store")
    legacy = spark.createDataFrame(
        [("0:7fc1",), ("3:abcd",)], ["bucket"])
    # old scheme: pfx = band digit + first hex char (no 'p')
    (legacy.withColumn(
        "pfx", F.concat(F.substring("bucket", 1, 1),
                        F.substring("bucket", 3, 1)))
     .write.mode("append").partitionBy("pfx").parquet(store))
    # pruned read with NEW prefixes still sees the history
    got = {r.bucket for r in
           pruned_store_read(spark, store, ["p07"]).collect()}
    assert got == {"0:7fc1", "3:abcd"}
    # compaction rewrites to the current scheme
    compact_bucket_store(spark, store)
    from pathlib import Path

    dirs = sorted(p.name for p in Path(store).iterdir()
                  if p.name.startswith("pfx="))
    assert dirs == ["pfx=p07", "pfx=p3a"]
    assert [r.bucket for r in
            pruned_store_read(spark, store, ["p07"]).collect()] == \
        ["0:7fc1"]
