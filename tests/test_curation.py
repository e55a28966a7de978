"""Curation operators: deterministic sampling + shard packing."""

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


def _docs(spark, n=400):
    return spark.createDataFrame(
        [(i, f"doc {i} " + "w " * (i % 50)) for i in range(n)],
        ["doc_id", "text"])


def test_hash_sample_deterministic_and_calibrated(spark):
    from html_qt_spark.operators.curation import hash_sample

    docs = _docs(spark)
    a = {r.doc_id for r in hash_sample(docs, rate=0.3, salt="x").collect()}
    b = {r.doc_id for r in hash_sample(docs, rate=0.3, salt="x").collect()}
    assert a == b  # reproducible
    assert 0.2 <= len(a) / 400 <= 0.4  # calibrated-ish
    c = {r.doc_id for r in hash_sample(docs, rate=0.3, salt="y").collect()}
    assert c != a  # independent draw under a different salt
    # nested rates: a lower rate with the same salt selects a subset
    d = {r.doc_id for r in hash_sample(docs, rate=0.1, salt="x").collect()}
    assert d <= a


def test_pack_shards_budget_and_order(spark):
    from pyspark.sql import functions as F

    from html_qt_spark.operators.curation import pack_shards
    from html_qt_spark.operators.textstats import token_count

    docs = _docs(spark)
    packed = pack_shards(token_count(docs), token_budget=500) \
        .orderBy("doc_id").collect()
    # shard ids are nondecreasing in doc order
    sids = [r.shard_id for r in packed]
    assert sids == sorted(sids)
    # every shard's token total stays under budget + one doc overhang
    totals: dict[int, int] = {}
    for r in packed:
        totals[r.shard_id] = totals.get(r.shard_id, 0) + r.n_tokens
    max_doc = max(r.n_tokens for r in packed)
    assert all(t <= 500 + max_doc for t in totals.values())
    # shards are contiguous: 0..max with no gaps
    assert sorted(set(sids)) == list(range(max(sids) + 1))


def test_pack_shards_megadoc_gets_own_shard(spark):
    from html_qt_spark.operators.curation import pack_shards

    rows = [(1, 100), (2, 5000), (3, 100)]
    docs = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    got = {r.doc_id: r.shard_id
           for r in pack_shards(docs, token_budget=500).collect()}
    assert got[1] == 0
    assert got[2] == 0  # starts in shard 0 (prefix 100 < 500)...
    assert got[3] == 10  # ...and pushes the next doc far ahead


def test_pack_shards_partitioned_packs_independently(spark):
    from html_qt_spark.operators.curation import pack_shards

    rows = [("2024-01-01", i, 300) for i in range(6)] \
        + [("2024-01-02", 100 + i, 400) for i in range(4)]
    docs = spark.createDataFrame(rows, ["day", "doc_id", "n_tokens"])
    packed = pack_shards(docs, token_budget=500,
                         partition_cols=["day"])
    got = {(r.day, r.doc_id): r.shard_id for r in packed.collect()}
    # each day packs from shard 0 independently (ids namespaced by day)
    for day, n, tok in (("2024-01-01", 6, 300), ("2024-01-02", 4, 400)):
        ids = [did for d, did in got if d == day]
        expect_cum = [i * tok for i in range(n)]
        expect = [c // 500 for c in expect_cum]
        assert [got[(day, did)] for did in sorted(ids)] == expect
    assert got[("2024-01-01", 0)] == 0
    assert got[("2024-01-02", 100)] == 0


def test_pack_shards_partitioned_plan_has_no_global_sort(spark):
    """The scale path must not funnel all rows through one task: the
    window Exchange is hashpartitioning(partition_cols), never
    SinglePartition (VERDICT r2 'what's wrong' #1)."""
    from html_qt_spark.operators.curation import pack_shards

    docs = spark.createDataFrame(
        [("a", i, 10) for i in range(50)], ["bucket", "doc_id", "n_tokens"])
    part = pack_shards(docs, token_budget=100, partition_cols=["bucket"])
    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "hashpartitioning(bucket" in plan
    # and the global default remains the explicit single-partition case
    glob = pack_shards(docs, token_budget=100)
    gplan = glob._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in gplan


def test_scrub_pii(spark):
    from html_qt_spark.operators.textstats import scrub_pii

    rows = [
        (1, "mail a.b-c@x-corp.co.uk or visit https://ex.com/p?q=1 "
            "or call +1 415-555-0199 now"),
        (2, "no pii here at all"),
        # an email-shaped userinfo inside a URL scrubs as part of the URL
        (3, "link http://user@host.com/path end"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in scrub_pii(docs).collect()}
    assert "<EMAIL>" in got[1].clean_text
    assert "<URL>" in got[1].clean_text
    assert "<PHONE>" in got[1].clean_text
    assert "415" not in got[1].clean_text
    assert (got[1].n_urls, got[1].n_emails, got[1].n_phones) == (1, 1, 1)
    assert got[2].clean_text == "no pii here at all"
    assert got[3].clean_text == "link <URL> end"


def test_decontaminate_flags_overlap_only(spark):
    from html_qt_spark.operators.curation import decontaminate

    docs = spark.createDataFrame([
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "completely unrelated prose with no shared trigrams here"),
        (3, "contains the quick brown fox phrase verbatim inside"),
        (4, "too short"),  # < n tokens -> no shingles -> absent
    ], ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps")], ["doc_id", "text"])
    got = {r.doc_id: r for r in decontaminate(docs, bench, n=3).collect()}
    assert got[1].contaminated and got[1].n_contaminated == 2
    assert not got[2].contaminated and got[2].n_contaminated == 0
    assert got[3].contaminated  # shares "the quick brown" etc.
    assert 4 not in got  # vacuously clean (no shingles)
    assert 0 < got[1].overlap_frac <= 1.0


def test_cap_per_group_two_phase_equals_global(spark):
    from pyspark.sql import functions as F

    from html_qt_spark.operators.curation import cap_per_group

    # skewed fixture: group "big" holds 300 rows, "small" holds 4
    docs = spark.createDataFrame(
        [(i, "big" if i < 300 else "small") for i in range(304)],
        ["doc_id", "source"])
    kept_2p = cap_per_group(docs, group_col="source", max_per_group=5,
                            pre_salt_buckets=8)
    kept_1p = cap_per_group(docs, group_col="source", max_per_group=5,
                            pre_salt_buckets=0)
    a = {(r.doc_id, r.source) for r in kept_2p.collect()}
    b = {(r.doc_id, r.source) for r in kept_1p.collect()}
    assert a == b  # pre-cap provably never drops a global winner
    per_group = {r.source: r.n for r in
                 kept_2p.groupBy("source").agg(F.count("*").alias("n"))
                 .collect()}
    assert per_group == {"big": 5, "small": 4}  # cap + keep-all-small


def test_temperature_sample_rates(spark):
    from html_qt_spark.operators.curation import temperature_sample

    # 400 "en" vs 25 "fi": alpha=0.5 keeps ~sqrt(25/400)=25% of en,
    # 100% of fi (the min group's rate is exactly 1)
    docs = spark.createDataFrame(
        [(i, "en" if i < 400 else "fi") for i in range(425)],
        ["doc_id", "lang"])
    kept = temperature_sample(docs, group_col="lang", alpha=0.5).collect()
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert len(by_lang["fi"]) == 25  # min group fully kept
    assert 60 <= len(by_lang["en"]) <= 140  # ~100 expected
    # deterministic: a rerun picks the identical set
    again = {r.doc_id for r in
             temperature_sample(docs, group_col="lang", alpha=0.5)
             .collect() if r.lang == "en"}
    assert again == by_lang["en"]
    # alpha=1 is a no-op
    allk = temperature_sample(docs, group_col="lang", alpha=1.0).count()
    assert allk == 425


def test_chunk_documents_overlap_reconstruction(spark):
    from html_qt_spark.operators.curation import chunk_documents

    text = " ".join(f"t{i}" for i in range(100))
    docs = spark.createDataFrame([(1, text), (2, "short doc here")],
                                 ["doc_id", "text"])
    rows = sorted(chunk_documents(docs, chunk_tokens=40, overlap=8)
                  .collect(), key=lambda r: (r.doc_id, r.chunk_idx))
    d1 = [r for r in rows if r.doc_id == 1]
    # 100 tokens, stride 32: ceil((100-40)/32)=2 extra starts -> chunks
    # at 0,32,64 (the last covers tokens 65..100, all 100 covered)
    assert [r.chunk_idx for r in d1] == [0, 1, 2]
    assert d1[0].n_tokens == 40 and d1[-1].n_tokens == 36
    # consecutive chunks share exactly the 8-token overlap
    a = d1[0].chunk_text.split()
    b = d1[1].chunk_text.split()
    assert a[-8:] == b[:8]
    # dropping each chunk's 8-token left overlap reconstructs the doc
    recon = a + [t for r in d1[1:] for t in r.chunk_text.split()[8:]]
    assert recon == text.split()
    # short doc: single whole chunk
    d2 = [r for r in rows if r.doc_id == 2]
    assert len(d2) == 1 and d2[0].chunk_text == "short doc here"
    assert d2[0].n_tokens == 3


def test_chunk_documents_tail_in_overlap_not_emitted(spark):
    from html_qt_spark.operators.curation import chunk_documents

    # 44 tokens, chunk 40, overlap 8, stride 32: second chunk holds
    # tokens 33..44 (12 tokens) — emitted; with 40 tokens exactly, no
    # second chunk (ceil((40-40)/32)=0)
    docs = spark.createDataFrame(
        [(1, " ".join(f"x{i}" for i in range(44))),
         (2, " ".join(f"y{i}" for i in range(40)))],
        ["doc_id", "text"])
    got = chunk_documents(docs, chunk_tokens=40, overlap=8).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 2 and by_doc[1][1].n_tokens == 12
    assert len(by_doc[2]) == 1


def test_kmv_sketch_accuracy_and_exactness(spark):
    from html_qt_spark.operators.sketches import kmv_distinct

    # 1000 distinct values in group a, 7 in group b (exact regime)
    rows = [(f"val-{i}", "a") for i in range(1000)]
    rows += [(f"small-{i % 7}", "b") for i in range(50)]
    df = spark.createDataFrame(rows, ["text", "lang"])
    got = {r.lang: r for r in
           kmv_distinct(df, col="text", group_col="lang",
                        k=64).collect()}
    assert got["b"].est_distinct == 7        # below-k groups are exact
    assert got["b"].n_hashed == 7
    # KMV with k=64: relative error ~ 1/sqrt(k-1) ≈ 12.6%; allow 3 sigma
    assert 600 <= got["a"].est_distinct <= 1500, got["a"]
    # global (ungrouped) mode: one row, same estimator
    g = kmv_distinct(df, col="text", k=64).collect()
    assert len(g) == 1 and 600 <= g[0].est_distinct <= 1600
    # deterministic across runs
    again = {r.lang: r.est_distinct for r in
             kmv_distinct(df, col="text", group_col="lang",
                          k=64).collect()}
    assert again["a"] == got["a"].est_distinct


def test_shard_manifest_offsets_rebuild_boundaries(spark):
    """Manifest invariants: in-shard order matches the pack's fill
    order, offsets are exclusive prefix sums of the doc token counts,
    and offsets[i] + tokens[i] chains to offsets[i+1] (the dataloader's
    attention-boundary rebuild)."""
    from html_qt_spark.operators.curation import (
        pack_shards,
        shard_manifest,
    )

    rows = [(i, 10 + (i * 7) % 23) for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    packed = pack_shards(docs, token_budget=60)
    man = {r.shard_id: r for r in shard_manifest(packed).collect()}
    toks = dict(rows)
    # every doc appears exactly once across manifests, in doc_id order
    seen = []
    for sid in sorted(man):
        r = man[sid]
        assert r.doc_ids == sorted(r.doc_ids)
        assert r.n_docs == len(r.doc_ids) == len(r.offsets)
        assert r.total_tokens == sum(toks[d] for d in r.doc_ids)
        off = 0
        for d, o in zip(r.doc_ids, r.offsets):
            assert o == off, (sid, d, o, off)
            off += toks[d]
        seen.extend(r.doc_ids)
    assert sorted(seen) == [i for i, _ in rows]


def test_shard_manifest_single_exchange_plan(spark):
    """Manifest agg = one shard-key exchange; no broadcast, no join."""
    from html_qt_spark.operators.curation import (
        pack_shards,
        shard_manifest,
    )

    docs = spark.createDataFrame(
        [(i, 10) for i in range(20)], ["doc_id", "n_tokens"])
    plan = shard_manifest(pack_shards(docs, token_budget=25)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    assert "Join" not in plan, plan


def test_shard_manifest_rows_matches_array_manifest(spark):
    """The scalar row form (driver-checkable: no array columns) must be
    exactly the array manifest exploded — same docs, same pack order,
    same exclusive token offsets — and keep the one-exchange plan."""
    from html_qt_spark.operators.curation import (
        pack_shards,
        shard_manifest,
        shard_manifest_rows,
    )

    rows = [(i, 10 + (i * 7) % 23) for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    packed = pack_shards(docs, token_budget=60)
    want = set()
    for r in shard_manifest(packed).collect():
        for pos, (d, o) in enumerate(zip(r.doc_ids, r.offsets)):
            want.add((r.shard_id, pos, d, o))
    got = {(r.shard_id, r.pack_pos, r.doc_id, r.token_offset)
           for r in shard_manifest_rows(packed).collect()}
    assert got == want
    plan = shard_manifest_rows(packed) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    assert "Join" not in plan, plan

    # partitioned variant: manifest keys include the partition column
    pdocs = spark.createDataFrame(
        [(i, 10, "ab"[i % 2]) for i in range(20)],
        ["doc_id", "n_tokens", "lang"])
    ppacked = pack_shards(pdocs, token_budget=25,
                          partition_cols=["lang"])
    prows = shard_manifest_rows(ppacked, partition_cols=["lang"]) \
        .collect()
    assert {(r.lang, r.shard_id, r.pack_pos) for r in prows} == \
        {(r.lang, r.shard_id, r.pack_pos) for r in prows}
    for lang in ("a", "b"):
        sub = sorted((r for r in prows if r.lang == lang),
                     key=lambda r: (r.shard_id, r.pack_pos))
        off = 0
        for r in sub:
            if r.pack_pos == 0:
                off = 0
            assert r.token_offset == off
            off += r.n_tokens


def test_dsir_logweights_prefer_target_like_docs(spark):
    """DSIR invariant: raw documents sharing the target corpus's bigram
    features score higher log-weights than off-distribution docs; every
    raw doc gets a row; docs without bigrams get NULL scores."""
    from html_qt_spark.operators.curation import dsir_logweights

    tgt_style = "the model trains on clean prose with long sentences"
    noise = "zzz qqq kkk www ppp xxx yyy"
    rows = ([(i, tgt_style, "en") for i in range(10)]
            + [(100 + i, noise, "xx") for i in range(10)]
            + [(900, "solo", "en")])
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r.doc_id: r for r in dsir_logweights(
        docs, docs.where("lang = 'en'"), buckets=64).collect()}
    assert len(out) == 21
    assert out[900].n_grams == 0 and out[900].logw_x1000 is None
    on_t = out[0].logw_x1000
    off_t = out[100].logw_x1000
    assert on_t > off_t, (on_t, off_t)


def test_perplexity_buckets_split_evenly_and_ordered(spark):
    """CCNet bucketing: within each language the buckets are
    equal-count (+/-1) and ordered — every head doc scores <= every
    middle doc, etc.; short docs without bigrams are omitted."""
    from html_qt_spark.operators.curation import perplexity_buckets

    texts = ["the cat sat on the mat again and again",
             "the dog sat on the mat again and again",
             "completely novel words burst entropy machine",
             "alpha beta gamma delta epsilon zeta eta",
             "the cat sat on the mat once more today",
             "quantum flux harmonics disrupt lattice phonons"]
    rows = [(i, texts[i % len(texts)] + f" v{i}", "ab"[i % 2])
            for i in range(24)] + [(99, "one", "a")]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = perplexity_buckets(docs).collect()
    assert all(r.doc_id != 99 for r in out)  # no bigrams -> omitted
    for lang in ("a", "b"):
        sub = [r for r in out if r.lang == lang]
        from collections import Counter

        counts = Counter(r.ppl_bucket for r in sub)
        assert set(counts) == {1, 2, 3}
        assert max(counts.values()) - min(counts.values()) <= 1
        for lo, hi in ((1, 2), (2, 3)):
            assert max(r.logprob_x1000 for r in sub
                       if r.ppl_bucket == lo) <= \
                min(r.logprob_x1000 for r in sub if r.ppl_bucket == hi)


def test_hash_split_reproducible_and_orderfree(spark):
    """Split assignment must be a pure function of (salt, id): stable
    across re-runs and row order, roughly proportional, and exhaustive
    (every doc gets exactly one split)."""
    from pyspark.sql import functions as F

    from html_qt_spark.operators.curation import hash_split

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(2000)], ["doc_id", "text"])
    a = {r.doc_id: r.split for r in hash_split(docs).collect()}
    b = {r.doc_id: r.split
         for r in hash_split(docs.orderBy(F.col("doc_id").desc()))
         .collect()}
    assert a == b and len(a) == 2000
    from collections import Counter

    c = Counter(a.values())
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > 1800 and c["val"] < 100 and c["test"] < 100
    # different salt -> different (but still deterministic) split
    d = {r.doc_id: r.split
         for r in hash_split(docs, salt="other").collect()}
    assert d != a
