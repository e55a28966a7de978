"""ANN recall gate (VERDICT r1 item 7).

Recall@k of SRP-bucketed ANN is only meaningful when true near neighbors
exist: on isotropic random vectors the top-10 "neighbors" sit at cos≈0.3
(measured on sf0.01 embeddings) and every hash-based ANN scheme degrades
to corpus scanning there.  So the ≥0.9 gate runs on planted near-duplicate
clusters (the workload ANN dedups at 100 TB); the sf0.01 table pins the
multi-probe improvement on hostile (isotropic) data.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

DIM = 64


@pytest.fixture(scope="module")
def spark():
    from html_qt_spark.plans.session import get_spark

    s = get_spark(cpus=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _unit(vec):
    n = math.sqrt(sum(x * x for x in vec))
    return [x / n for x in vec]


def _pseudo(seed: int) -> list[float]:
    # deterministic pseudo-random unit vector (no RNG: xorshift-ish fold)
    out = []
    h = seed * 2654435761 % (2**32)
    for _ in range(DIM):
        h ^= (h << 13) % (2**32)
        h ^= h >> 17
        h ^= (h << 5) % (2**32)
        out.append((h % 2001 - 1000) / 1000.0)
    return _unit(out)


def _clustered_embeddings(spark, n_clusters=20, per_cluster=10, noise=0.08):
    """Clusters of near-duplicates: members = center + small deterministic
    perturbation, cos(member, center) ≈ 1 - noise²/2 >> background."""
    rows = []
    vid = 0
    for c in range(n_clusters):
        center = _pseudo(1000 + c)
        for m in range(per_cluster):
            pert = _pseudo(5000 + c * 97 + m)
            vec = _unit([x + noise * p for x, p in zip(center, pert)])
            rows.append((vid, vec))
            vid += 1
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_recall_gate_on_clustered_data(spark):
    from html_qt_spark.operators.similarity import ann_lsh_topk, cosine_topk

    emb = _clustered_embeddings(spark)
    recalls = []
    for q in (0, 10, 55, 111, 190):  # one query per sampled cluster
        exact = {r.vec_id for r in cosine_topk(emb, q, 9).collect()}
        ann = {r.vec_id
               for r in ann_lsh_topk(emb, q, 9, n_planes=6,
                                     probe_bits=1).collect()}
        recalls.append(len(exact & ann) / 9)
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_multi_probe_beats_single_on_isotropic_sf(spark):
    from html_qt_spark.operators.similarity import ann_lsh_topk, cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    totals = {0: 0.0, 1: 0.0, 2: 0.0}
    queries = (0, 7, 42)
    for q in queries:
        exact = {r.vec_id for r in cosine_topk(emb, q, 10).collect()}
        for bits in totals:
            got = {r.vec_id for r in ann_lsh_topk(
                emb, q, 10, probe_bits=bits).collect()}
            totals[bits] += len(exact & got) / 10
    n = len(queries)
    # monotone: more probes, more recall — and 1-bit probing must recover
    # a nonzero share even on hostile data
    assert totals[0] <= totals[1] <= totals[2]
    assert totals[1] / n >= 0.2


def test_probe_set_size(spark):
    from html_qt_spark.operators.similarity import ann_lsh_topk

    emb = _clustered_embeddings(spark, n_clusters=4, per_cluster=4)
    # smoke: 2-bit probing over 6 planes = 1+6+15 buckets, must still
    # return k rows and not blow up the plan
    assert ann_lsh_topk(emb, 0, 5, probe_bits=2).count() == 5


def test_recall_gate_auto_params_small_scale(spark):
    """Auto-chosen n_planes (from corpus count) keeps the >=0.9 planted
    -cluster recall gate at sandbox scale."""
    from html_qt_spark.operators.similarity import ann_lsh_topk, cosine_topk

    emb = _clustered_embeddings(spark)
    recalls = []
    for q in (0, 55, 190):
        exact = {r.vec_id for r in cosine_topk(emb, q, 9).collect()}
        ann = {r.vec_id for r in ann_lsh_topk(
            emb, q, 9, n_planes=None, probe_bits=1).collect()}
        recalls.append(len(exact & ann) / 9)
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_recall_gate_auto_params_sf01(spark):
    """VERDICT r2 ask #8: the planted-cluster recall gate extended to the
    sf0.1 corpus with auto-chosen parameters — planted near-dup clusters
    on top of the full 2,000-vector isotropic background."""
    from pyspark.sql import functions as F

    from html_qt_spark.operators.similarity import ann_lsh_topk, cosine_topk

    bg = (spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
          .select((F.col("vec_id") + 1_000_000).alias("vec_id"),
                  F.transform("embedding", lambda x: x.cast("double"))
                  .alias("embedding")))
    emb = _clustered_embeddings(spark).unionByName(bg).localCheckpoint()
    recalls = []
    for q in (0, 55, 111, 190):
        exact = {r.vec_id for r in cosine_topk(emb, q, 9).collect()}
        ann = {r.vec_id for r in ann_lsh_topk(
            emb, q, 9, n_planes=None, probe_bits=1).collect()}
        recalls.append(len(exact & ann) / 9)
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_auto_n_planes_scales_with_corpus():
    from html_qt_spark.operators.similarity import auto_n_planes

    assert auto_n_planes(200) == 4           # sandbox floor
    assert auto_n_planes(10**6) == 8          # 1e6/2^8 ≈ 3.9k
    assert auto_n_planes(10**9) == 18         # 1e9/2^18 ≈ 3.8k
    assert auto_n_planes(10**12) == 24        # ceiling
    # buckets stay bounded by the target at every scale
    for n in (10**5, 10**7, 10**9):
        p = auto_n_planes(n)
        assert n / 2**p <= 4096 or p == 24


def test_ann_candidates_not_force_broadcast(spark):
    """VERDICT r2 'what's wrong' #2: the candidate set is a corpus
    fraction (~(1+n_planes)/2^n_planes of all vectors) and must never be
    a *forced* broadcast.  With the auto threshold disabled, the only
    BroadcastExchanges left are the genuinely-tiny hinted sides (probe
    buckets <= 1+n_planes rows, query vector = 1 row); the candidate
    joins run as shuffle joins."""
    from html_qt_spark.operators.similarity import ann_lsh_topk

    emb = _clustered_embeddings(spark, n_clusters=10, per_cluster=10)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        df = ann_lsh_topk(emb, 0, 5, n_planes=6, probe_bits=1)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    # the candidates↔embeddings joins (on vec_id) must be shuffle joins;
    # the only broadcast-hash joins left are on q_bucket (probe set,
    # <= 1+n_planes rows — genuinely tiny and hinted on purpose)
    assert "SortMergeJoin [vec_id" in plan, plan
    assert "BroadcastHashJoin [vec_id" not in plan, plan


def test_ivf_full_probe_equals_exact(spark):
    """Probing every list degrades IVF to the exact brute-force answer —
    the correctness invariant of the probed-search decomposition."""
    from html_qt_spark.operators.similarity import cosine_topk, ivf_topk

    emb = _clustered_embeddings(spark, n_clusters=8, per_cluster=8)
    for q in (0, 17, 40):
        exact = [r.vec_id for r in cosine_topk(emb, q, 9).collect()]
        full = [r.vec_id for r in ivf_topk(emb, q, 9, n_centroids=4,
                                           n_probe=4).collect()]
        assert full == exact


def test_ivf_recall_on_planted_clusters(spark):
    """2-of-8 probing keeps >=0.9 recall on near-dup clusters: cluster
    members quantize to the same (or the adjacent probed) list."""
    from html_qt_spark.operators.similarity import cosine_topk, ivf_topk

    emb = _clustered_embeddings(spark)
    recalls = []
    for q in (0, 55, 111, 190):
        exact = {r.vec_id for r in cosine_topk(emb, q, 9).collect()}
        got = {r.vec_id for r in ivf_topk(emb, q, 9, n_centroids=8,
                                          n_probe=2).collect()}
        recalls.append(len(exact & got) / 9)
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_ivf_assignment_partitions_corpus(spark):
    """Every vector lands in exactly one list; list sizes are controlled
    (no empty corpus-fraction blowup like an emergent LSH bucket)."""
    from pyspark.sql import functions as F

    from html_qt_spark.operators.similarity import ivf_assign, ivf_centroids

    emb = _clustered_embeddings(spark, n_clusters=10, per_cluster=10)
    cents = ivf_centroids(emb, n_centroids=5)
    assert cents.count() == 5
    assign = ivf_assign(emb, cents)
    assert assign.count() == 100  # one list per vector
    assert assign.select("vec_id").distinct().count() == 100
    lists = {r.list_id for r in assign.select("list_id").distinct().collect()}
    assert lists <= {r.centroid_id for r in cents.collect()}


def test_cosine_topk_batch_matches_single(spark):
    """k-NN join rows per query == the single-query operator's answer;
    the rank filter must compile to a WindowGroupLimit partial top-k."""
    from html_qt_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_batch,
    )

    emb = _clustered_embeddings(spark, n_clusters=8, per_cluster=8)
    batch = cosine_topk_batch(emb, [0, 17], k=5)
    got = {}
    for r in batch.collect():
        got.setdefault(r.q_id, []).append((r.rank, r.vec_id))
    for q in (0, 17):
        single = [(r.rank, r.vec_id)
                  for r in cosine_topk(emb, q, 5).collect()]
        assert sorted(got[q]) == sorted(single)
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_kmeans_keeps_centroid_count_and_shape(spark):
    """One Lloyd round: still exactly n_centroids rows (empty lists keep
    their previous centroid), arrays stay dim-length and finite."""
    from html_qt_spark.operators.similarity import kmeans_centroids

    emb = _clustered_embeddings(spark, n_clusters=10, per_cluster=10)
    cents = kmeans_centroids(emb, n_centroids=6, n_iter=1).collect()
    assert len(cents) == 6
    assert len({r.centroid_id for r in cents}) == 6
    for r in cents:
        assert len(r.c_emb) == DIM
        assert all(abs(x) < 10 for x in r.c_emb)


def test_ivf_trained_full_probe_still_exact(spark):
    """The n_probe = n_centroids exactness invariant is independent of
    where the centroids sit, so it must survive training."""
    from html_qt_spark.operators.similarity import cosine_topk, ivf_topk

    emb = _clustered_embeddings(spark, n_clusters=8, per_cluster=8)
    for q in (0, 40):
        exact = [r.vec_id for r in cosine_topk(emb, q, 9).collect()]
        full = [r.vec_id for r in ivf_topk(emb, q, 9, n_centroids=4,
                                           n_probe=4, trained=True,
                                           n_iter=2).collect()]
        assert full == exact


def test_kmeans_trained_centroids_raise_recall(spark):
    """VERDICT r3 task #3 'done' gate: at fixed n_probe=1 (the harshest
    setting — a cluster split across two Voronoi cells loses its far
    half), Lloyd-trained centroids beat the raw hash-seeded sample on
    planted clusters, because training moves each centroid to its
    region's mean and cluster members then quantize together."""
    from html_qt_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        kmeans_centroids,
    )

    # noise=0.45: clusters broad enough that at least one straddles a
    # seeded Voronoi boundary (tight clusters make the seeded baseline
    # already perfect and the comparison vacuous)
    emb = _clustered_embeddings(spark, n_clusters=16, per_cluster=12,
                                noise=0.45)
    queries = [0, 37, 80, 123, 150, 185]

    def mean_recall(cents):
        recalls = []
        for q in queries:
            exact = {r.vec_id for r in cosine_topk(emb, q, 11).collect()}
            got = {r.vec_id
                   for r in ivf_topk(emb, q, 11, centroids=cents,
                                     n_probe=1).collect()}
            recalls.append(len(exact & got) / 11)
        return sum(recalls) / len(recalls)

    from html_qt_spark.operators.similarity import ivf_centroids

    seeded = ivf_centroids(emb, n_centroids=8).localCheckpoint()
    trained = kmeans_centroids(emb, n_centroids=8, n_iter=3) \
        .localCheckpoint()
    r_seed = mean_recall(seeded)
    r_train = mean_recall(trained)
    assert r_train > r_seed, (r_seed, r_train)
    assert r_train >= 0.8, r_train


def test_ivf_batch_matches_single_query(spark):
    """Batch probed ANN returns exactly the single-query operator's
    ranking for every query in the set, and both top-k filters compile
    to WindowGroupLimit partial top-k."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from html_qt_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_batch,
    )

    emb = _clustered_embeddings(spark, n_clusters=10, per_cluster=10)
    batch = ivf_topk_batch(emb, [0, 33, 77], k=7, n_centroids=5,
                           n_probe=2)
    got: dict[int, list] = {}
    for r in batch.collect():
        got.setdefault(r.q_id, []).append((r.rank, r.vec_id))
    for q in (0, 33, 77):
        single = ivf_topk(emb, q, 7, n_centroids=5, n_probe=2)
        w = Window.orderBy(F.col("cos").desc(), "vec_id")
        exp = [(r.rank, r.vec_id) for r in
               single.select("vec_id",
                             F.row_number().over(w).alias("rank"))
               .collect()]
        assert sorted(got[q]) == sorted(exp), (q, got[q], exp)
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_ivf_batch_full_probe_equals_knn_join(spark):
    """Probing every list degrades the batch to the exact k-NN join."""
    from html_qt_spark.operators.similarity import (
        cosine_topk_batch,
        ivf_topk_batch,
    )

    emb = _clustered_embeddings(spark, n_clusters=8, per_cluster=8)
    qs = [0, 17]
    full = {(r.q_id, r.rank): r.vec_id
            for r in ivf_topk_batch(emb, qs, k=6, n_centroids=4,
                                    n_probe=4).collect()}
    exact = {(r.q_id, r.rank): r.vec_id
             for r in cosine_topk_batch(emb, qs, k=6).collect()}
    assert full == exact


def test_semantic_dedup_prunes_planted_clusters(spark):
    """SemDeDup on planted near-dup clusters: each cluster collapses to
    (at least) its min-id member; isolated background vectors all
    survive; the pairwise work is cluster-bounded (self-join on
    list_id, never a full cross join)."""
    from pyspark.sql import functions as F

    from html_qt_spark.operators.similarity import semantic_dedup

    # tight clusters (noise=0.05 -> intra cos ~0.999) + background
    emb = _clustered_embeddings(spark, n_clusters=6, per_cluster=5,
                                noise=0.05)
    bg = spark.createDataFrame(
        [(1000 + i, _pseudo(9000 + i)) for i in range(10)],
        ["vec_id", "embedding"])
    all_emb = emb.unionByName(bg)
    out = semantic_dedup(all_emb, n_centroids=6, threshold=0.98,
                         trained=True, n_iter=2)
    rows = {r.vec_id: (r.list_id, r.keep) for r in out.collect()}
    assert len(rows) == 40  # decision for every vector
    # every planted cluster loses all but (>=)1 member; the survivor
    # set contains each cluster's min id
    for c in range(6):
        ids = list(range(c * 5, c * 5 + 5))
        kept = [i for i in ids if rows[i][1]]
        assert rows[min(ids)][1], c          # min id always survives
        assert len(kept) <= 2, (c, kept)     # cluster collapsed
    # isolated background: nothing within 0.98 of anything
    assert all(rows[1000 + i][1] for i in range(10))
    plan = semantic_dedup(all_emb, n_centroids=6, threshold=0.98) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan


def test_semantic_dedup_hot_list_cap_star_fallback(spark):
    """r5 (VERDICT r4 #3): a degenerate cluster 10x over the list cap
    (boilerplate embeddings all collapsing into one centroid) must cost
    a LINEAR hub-star pass — m-1 candidate pairs, not C(m,2) — while
    the keep-set stays exactly the uncapped min-id-wins outcome (every
    member is within threshold of the hub, so all but the hub drop
    either way).  Under-cap background lists keep the full quadratic
    comparison."""
    from pyspark.sql import functions as F

    from html_qt_spark.operators.similarity import (
        _semantic_candidate_pairs,
        ivf_assign,
        ivf_centroids,
        semantic_dedup,
    )

    cap = 20
    m = 10 * cap  # degenerate cluster size
    center = _pseudo(777)
    dup = [(i, center) for i in range(m)]
    bg = [(10_000 + i, _pseudo(5000 + i)) for i in range(12)]
    emb = spark.createDataFrame(dup + bg, ["vec_id", "embedding"])

    capped = {r.vec_id: r.keep
              for r in semantic_dedup(emb, n_centroids=4,
                                      threshold=0.95,
                                      max_list_size=cap).collect()}
    uncapped = {r.vec_id: r.keep
                for r in semantic_dedup(emb, n_centroids=4,
                                        threshold=0.95).collect()}
    assert capped == uncapped
    assert capped[0] and not any(capped[i] for i in range(1, m))
    assert all(capped[10_000 + i] for i in range(12))

    # pair-count bound: the degenerate list contributes m-1 star pairs
    cents = ivf_centroids(emb, n_centroids=4)
    e = emb.join(ivf_assign(emb, cents), "vec_id")
    pairs = _semantic_candidate_pairs(e, cap)
    dup_pairs = pairs.where(F.col("a_vec") < m).where(F.col("b_vec") < m)
    assert dup_pairs.count() == m - 1
    # and they are exactly the hub's star
    assert set(r.a_vec for r in dup_pairs.collect()) == {0}
