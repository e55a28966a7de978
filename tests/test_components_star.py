"""Large-star/small-star connected components (VERDICT r2 'what's
missing' #4): O(log n) shuffle rounds on adversarial chain graphs where
min-label propagation needs O(diameter)."""

from __future__ import annotations

import math
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


def _labels(df):
    return {r.doc_id: r.component_id for r in df.collect()}


def test_star_matches_minlabel_on_mixed_graph(spark):
    from html_qt_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    # two cliques, one chain, one isolated edge, deterministic
    edges = []
    edges += [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(10 + i, 10 + i + 1) for i in range(6)]          # chain
    edges += [(100, 101)]
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    assert _labels(connected_components_star(pairs)) \
        == _labels(connected_components(pairs))


def test_star_path_graph_logarithmic_rounds(spark):
    """10k-node path: min-label needs ~10k rounds (it hits max_iter);
    the alternating algorithm closes it in O(log n) alternations
    (Kiveris et al. 2014) — gate at ceil(log2 n) + 4."""
    from html_qt_spark.operators.dedup import connected_components_star

    n = 10_000
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["doc_a", "doc_b"])
    stats: dict = {}
    out = connected_components_star(pairs, stats=stats)
    labels = _labels(out)
    assert len(labels) == n
    assert set(labels.values()) == {0}          # one component, min id 0
    bound = math.ceil(math.log2(n)) + 4
    assert stats["rounds"] <= bound, stats


def test_star_string_ids_and_isolated_vertices(spark):
    from html_qt_spark.operators.dedup import connected_components_star

    pairs = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("x", "y")], ["doc_a", "doc_b"])
    got = _labels(connected_components_star(pairs))
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_star_on_lsh_pairs_matches_minlabel(spark):
    """End-to-end parity on the real candidate graph at sf0.001."""
    from html_qt_spark.operators.dedup import (
        connected_components,
        connected_components_star,
        minhash_lsh_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = minhash_lsh_pairs(docs).localCheckpoint()
    assert _labels(connected_components_star(pairs)) \
        == _labels(connected_components(pairs))
