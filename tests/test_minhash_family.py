"""Family-equivalence pins for the production MinHash hash family
(VERDICT r5 item #2): the oracle queries pin hash_fn="md5", so the
xxhash64 default that the bench exercises needs its MinHash *semantics*
pinned family-invariantly — identical docs get identical signatures,
the LSH pair set over planted duplicate clusters is the same under both
families, and the megabucket star fallback fires identically.
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


def _planted_docs(spark):
    """Three planted duplicate clusters + unique fillers."""
    rows = []
    clusters = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven twelve",
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do",
    ]
    doc_id = 0
    for text in clusters:
        for _ in range(4):  # 4 identical copies per cluster
            rows.append((doc_id, text))
            doc_id += 1
    for i in range(10):
        rows.append((1000 + i,
                     f"unique filler number {i} with words "
                     f"x{i} y{i} z{i} w{i} v{i} u{i} t{i} s{i}"))
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.mark.parametrize("family", ["md5", "xxhash64"])
def test_identical_docs_identical_signatures(spark, family):
    from html_qt_spark.operators.dedup import minhash_signatures

    docs = _planted_docs(spark)
    sig = minhash_signatures(docs, num_hashes=8, hash_fn=family).collect()
    by_id = {r["doc_id"]: tuple(r)[1:] for r in sig}
    # each planted cluster (ids 4c..4c+3) collapses to one signature
    for c in range(3):
        sigs = {by_id[4 * c + i] for i in range(4)}
        assert len(sigs) == 1, f"cluster {c} split under {family}"
    # distinct clusters get distinct signatures
    assert len({by_id[0], by_id[4], by_id[8]}) == 3


def test_lsh_pair_set_family_invariant_on_planted_clusters(spark):
    from html_qt_spark.operators.dedup import minhash_lsh_pairs

    docs = _planted_docs(spark)

    def pairs(family):
        return {(r["doc_a"], r["doc_b"])
                for r in minhash_lsh_pairs(docs, hash_fn=family).collect()}

    p_md5 = pairs("md5")
    p_xx = pairs("xxhash64")
    # every planted within-cluster pair must be found by BOTH families
    planted = {(4 * c + i, 4 * c + j)
               for c in range(3) for i in range(4) for j in range(i + 1, 4)}
    assert planted <= p_md5
    assert planted <= p_xx
    # and no pair may cross clusters or touch a unique filler
    for pset, family in ((p_md5, "md5"), (p_xx, "xxhash64")):
        for a, b in pset:
            assert a // 4 == b // 4 and a < 12 and b < 12, \
                f"spurious pair ({a},{b}) under {family}"


@pytest.mark.parametrize("family", ["md5", "xxhash64"])
def test_megabucket_star_fires_under_both_families(spark, family):
    from html_qt_spark.operators.dedup import minhash_lsh_pairs

    n_dup = 60
    rows = [(i, "the quick brown fox jumps over the lazy dog wholesale")
            for i in range(n_dup)]
    rows += [(1000 + i,
              f"unique document number {i} with distinct trailing words "
              f"alpha{i} beta{i} gamma{i}") for i in range(5)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    # cap below the duplicate-group size: the hot buckets must emit the
    # linear hub star (n-1 pairs), not the quadratic pair set
    capped = minhash_lsh_pairs(docs, max_docs_per_bucket=20,
                               hash_fn=family)
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert got == {(0, i) for i in range(1, n_dup)}
