"""Scale-hazard regressions for the dedup operators (VERDICT r1 items 3-4).

- minhash_lsh_pairs: a degenerate band bucket (here 2,000 identical docs)
  must be capped before the self-join, not expanded to ~2M pairs.
- ngram_jaccard_pairs: the per-document ``sizes`` table must NOT be force
  broadcast (corpus-sized broadcast = driver OOM at 10^12 docs).
"""

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


def _skewed_docs(spark, n_dup=2000, n_uniq=20):
    rows = [(i, "the quick brown fox jumps over the lazy dog wholesale")
            for i in range(n_dup)]
    rows += [(100000 + i,
              f"unique document number {i} with distinct trailing words "
              f"alpha{i} beta{i} gamma{i} delta{i}")
             for i in range(n_uniq)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_lsh_hot_bucket_cap_bounds_pairs(spark):
    from html_qt_spark.operators.dedup import minhash_lsh_pairs

    docs = _skewed_docs(spark)
    # 2,000 identical docs share every band bucket: uncapped this is
    # ~2M pairs x 4 bands; capped at 100 the hot buckets switch to
    # linear STAR pairs (hub = bucket-min -> each member): 1,999 pairs,
    # not C(2000,2) — the cluster still forms, at linear cost
    capped = minhash_lsh_pairs(docs, max_docs_per_bucket=100)
    n = capped.count()
    assert n == 1999

    # raising the cap above the group size re-admits the full pair set
    admitted = minhash_lsh_pairs(docs, max_docs_per_bucket=5000)
    assert admitted.count() == 2000 * 1999 // 2


def test_lsh_mega_bucket_star_clusters_everything(spark):
    """VERDICT r3 task #4: members of an over-cap bucket must still end
    up in ONE dedup component (previously they were dropped entirely).
    Mixed corpus: a 50-doc boilerplate mega-group (over the cap) plus a
    2-doc near-dup pair (under the cap) plus uniques."""
    from html_qt_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )

    rows = [(i, "identical boilerplate footer text repeated every page")
            for i in range(50)]
    rows += [(100, "alpha beta gamma delta epsilon zeta"),
             (101, "alpha beta gamma delta epsilon zeta"),
             (200, "totally unrelated content nine ten eleven twelve")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs, max_docs_per_bucket=10)
    rows_p = pairs.collect()
    star = [(r.doc_a, r.doc_b) for r in rows_p if r.doc_b < 100]
    # linear star: every mega-bucket pair is (hub=0, member), 49 pairs
    assert len(star) == 49 and all(a == 0 for a, _ in star)
    assert (0, 1) in star and (0, 49) in star
    # the under-cap bucket still takes the join path
    assert (100, 101) in [(r.doc_a, r.doc_b) for r in rows_p]
    comp = {r.doc_id: r.component_id
            for r in connected_components(pairs).collect()}
    assert all(comp[i] == 0 for i in range(50))  # one cluster
    assert comp[100] == comp[101] == 100
    assert 200 not in comp  # no pair, not a duplicate


def test_lsh_cap_keeps_small_buckets(spark):
    from html_qt_spark.operators.dedup import minhash_lsh_pairs

    rows = [(1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "totally different content words here nine ten eleven")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs, max_docs_per_bucket=100).collect()
    assert [(r.doc_a, r.doc_b) for r in pairs] == [(1, 2)]


def test_ngram_jaccard_sizes_join_not_broadcast(spark):
    from html_qt_spark.operators.dedup import ngram_jaccard_pairs

    docs = _skewed_docs(spark, n_dup=5, n_uniq=10)
    plan = (ngram_jaccard_pairs(docs, n=3, min_jaccard=0.2)
            ._jdf.queryExecution().executedPlan().toString())
    # the per-document sizes join must not carry a planner-forced
    # broadcast hint; AQE may still choose broadcast at runtime when the
    # post-prune side fits, which is exactly the desired behavior
    assert "ResolvedHint" not in plan
    before_aqe = (ngram_jaccard_pairs(docs, n=3, min_jaccard=0.2)
                  ._jdf.queryExecution().optimizedPlan().toString())
    assert "broadcast" not in before_aqe.lower()


def test_ngram_jaccard_still_correct(spark):
    from html_qt_spark.operators.dedup import ngram_jaccard_pairs

    rows = [(1, "one two three four five six"),
            (2, "one two three four five seven"),
            (3, "eight nine ten eleven twelve thirteen")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.doc_a, r.doc_b): round(r.jaccard, 3)
           for r in ngram_jaccard_pairs(docs, n=3, min_jaccard=0.1).collect()}
    # docs 1,2 share shingles "one two three","two three four","three four
    # five" -> |A|=|B|=4, inter=3, J=3/5
    assert got == {(1, 2): 0.6}


def test_connected_components_chain_and_cliques(spark):
    from html_qt_spark.operators.dedup import connected_components

    # chain 1-2-3-4-5 (needs multiple propagation rounds), clique
    # {10,11,12}, isolated pair {20,21}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),
         (10, 11), (10, 12), (11, 12),
         (20, 21)],
        ["doc_a", "doc_b"])
    got = {r.doc_id: r.component_id
           for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}


def test_connected_components_respects_max_iter(spark):
    from html_qt_spark.operators.dedup import connected_components

    # long chain with max_iter=1: only direct neighbors see the min
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], ["doc_a", "doc_b"])
    got = {r.doc_id: r.component_id
           for r in connected_components(pairs, max_iter=1).collect()}
    assert got[2] == 1 and got[6] == 5  # one hop of propagation only


def test_lsh_cap_plan_single_bucket_shuffle(spark):
    """The hot-bucket cap is a count window over (band, bucket), not an
    aggregate + semi-join: the physical plan must carry NO broadcast of
    a bucket-count table (the old shape's scale risk — bucket_ok is
    corpus-bucket-sized at 10^12 docs) and only the minimal
    hashpartitioning exchanges (signature agg, bucket window reused by
    the self-join, final distinct)."""
    from html_qt_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(i, f"tok{i} a b c d e f g h") for i in range(40)],
        ["doc_id", "text"])
    plan = minhash_lsh_pairs(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" in plan
    # no broadcast anywhere in the LSH plan: every side is corpus-scale
    assert "BroadcastExchange" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 6, plan


def test_mask_common_runs_removes_all_copies(spark):
    """Exact-substring run masking (Lee et al. ExactSubstr shape): a
    licence block shared by two docs vanishes from BOTH (not
    first-wins); unique text and short docs are untouched; masked
    token accounting is exact."""
    from html_qt_spark.operators.dedup import mask_common_runs

    lic = ("permission is hereby granted free of charge to any person "
           "obtaining a copy")
    rows = [
        (1, f"intro one {lic} body text alpha"),
        (2, f"different opening {lic} other conclusion"),
        (3, "totally unrelated document with plain distinct words"),
        (4, "short doc"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: (r.clean_text, r.n_tokens_masked)
           for r in mask_common_runs(docs, n=5, min_docs=2).collect()}
    n_lic = len(lic.split())
    assert got[1] == ("intro one body text alpha", n_lic)
    assert got[2] == ("different opening other conclusion", n_lic)
    assert got[3] == (rows[2][1], 0)
    assert got[4] == ("short doc", 0)


def test_mask_common_runs_full_mask_and_within_doc(spark):
    """A doc that IS the shared run masks to empty string; repeats
    WITHIN one doc alone (min_docs=2 distinct docs) do not mask."""
    from html_qt_spark.operators.dedup import mask_common_runs

    run = "alpha beta gamma delta epsilon"
    rows = [
        (1, run),
        (2, run),
        (3, "solo solo solo solo solo solo solo solo solo solo"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: (r.clean_text, r.n_tokens_masked)
           for r in mask_common_runs(docs, n=5, min_docs=2).collect()}
    assert got[1] == ("", 5) and got[2] == ("", 5)
    assert got[3][1] == 0  # intra-doc repetition alone never masks


def test_mask_common_runs_no_forced_broadcast(spark):
    """The duplicated-gram table can be corpus-gram-sized: neither its
    join back to gram positions nor the hits join to docs may carry a
    planner-forced broadcast hint."""
    from html_qt_spark.operators.dedup import mask_common_runs

    docs = _skewed_docs(spark, n_dup=5, n_uniq=10)
    before_aqe = mask_common_runs(docs, n=5)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "broadcast" not in before_aqe.lower(), before_aqe


def test_mask_common_runs_interval_merge_on_fully_quoted_doc(spark):
    """r5: the rebuild probes MERGED disjoint intervals, not raw hit
    starts.  A large fully-duplicated doc (every position is a hit
    start -> one interval after the merge) must mask completely, and a
    doc with two separated shared runs must mask exactly those two
    intervals, keeping the gap text."""
    from html_qt_spark.operators.dedup import mask_common_runs

    # 400-token doc duplicated verbatim: ~396 overlapping hits/doc
    big = " ".join(f"w{i}" for i in range(400))
    gap_a = " ".join(f"u{i}" for i in range(6))
    run1 = "r one two three four"
    run2 = "s five six seven eight"
    rows = [
        (1, big),
        (2, big),
        (3, f"{run1} {gap_a} {run2}"),
        (4, f"{run1} zz yy xx ww vv {run2}"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: (r.clean_text, r.n_tokens_masked)
           for r in mask_common_runs(docs, n=5, min_docs=2).collect()}
    assert got[1] == ("", 400) and got[2] == ("", 400)
    assert got[3] == (gap_a, 10)
    assert got[4] == ("zz yy xx ww vv", 10)


def test_mask_common_runs_chars_cross_token_boundaries(spark):
    """Char-level ExactSubstr: duplicated material that token-level
    masking misses because the copies are re-wrapped with different
    punctuation/whitespace still masks; unique text survives; the
    rebuild uses keep-segment slices (O(runs), not O(chars))."""
    from html_qt_spark.operators.dedup import mask_common_runs_chars

    quote = "to be or not to be that is the question"
    rows = [
        (1, f"intro {quote} outro-one"),
        (2, f"prefix,{quote},suffix-two"),   # different token wrapping
        (3, "entirely original material here with no duplicates"),
        (4, "short"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in
           mask_common_runs_chars(docs, n=16, min_docs=2).collect()}
    # the shared quote is cut from BOTH carriers
    assert quote not in got[1].clean_text
    assert quote not in got[2].clean_text
    assert got[1].n_chars_masked >= len(quote)
    assert got[2].n_chars_masked >= len(quote)
    # unique docs untouched
    assert got[3].clean_text == rows[2][1] and got[3].n_chars_masked == 0
    assert got[4].clean_text == "short" and got[4].n_chars_masked == 0
    # full duplicates mask to empty
    dup = spark.createDataFrame(
        [(1, "x" * 50), (2, "x" * 50)], ["doc_id", "text"])
    for r in mask_common_runs_chars(dup, n=16, min_docs=2).collect():
        assert r.clean_text == "" and r.n_chars_masked == 50
