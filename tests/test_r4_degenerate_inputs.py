"""Degenerate-input hardening for the round-4 operators: empty
dataframes and all-empty documents must produce sane empty/zero
results, never raise — a 10^12-doc job will contain every degenerate
shape that exists."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))


@pytest.fixture(scope="module")
def spark():
    from html_qt_spark.plans.session import get_spark

    s = get_spark(cpus=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


@pytest.fixture(scope="module")
def blank_docs(spark):
    return spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None)], "doc_id long, text string")


def test_subword_ops_degenerate(spark, empty_docs, blank_docs):
    from html_qt_spark.operators.textstats import (
        subword_token_count,
        subword_vocab,
    )

    assert subword_vocab(empty_docs).count() == 0
    assert subword_vocab(blank_docs).count() == 0
    out = subword_token_count(blank_docs, ["ab"]).collect()
    assert sorted((r.doc_id, r.n_subword_tokens) for r in out) == \
        [(1, 0), (2, 0), (3, 0)]
    assert subword_token_count(empty_docs, ["ab"]).count() == 0


def test_bpe_and_bigram_degenerate(spark, empty_docs, blank_docs):
    from html_qt_spark.operators.textstats import (
        bigram_logprob,
        bpe_train,
    )

    assert bpe_train(empty_docs, n_merges=3).count() == 0
    assert bpe_train(blank_docs, n_merges=3).count() == 0
    assert bigram_logprob(empty_docs).count() == 0
    assert bigram_logprob(blank_docs).count() == 0


def test_mask_and_chunk_degenerate(spark, empty_docs, blank_docs):
    from html_qt_spark.operators.curation import chunk_documents_subword
    from html_qt_spark.operators.dedup import mask_common_runs

    assert mask_common_runs(empty_docs).count() == 0
    got = {r.doc_id: (r.clean_text, r.n_tokens_masked)
           for r in mask_common_runs(blank_docs).collect()}
    assert got == {1: ("", 0), 2: ("", 0), 3: ("", 0)}
    assert chunk_documents_subword(
        empty_docs, chunk_tokens=8, vocab=["ab"]).count() == 0
    # blank docs have no words -> no chunks, and no crash
    assert chunk_documents_subword(
        blank_docs, chunk_tokens=8, vocab=["ab"]).count() == 0


def test_classifier_and_captions_degenerate(spark, empty_docs):
    from html_qt_spark.operators.multimodal import media_captions
    from html_qt_spark.operators.textstats import linear_classifier_score

    assert linear_classifier_score(empty_docs, dim=8,
                                   weights=[0.0] * 8).count() == 0
    spans = spark.createDataFrame(
        [], "doc_id long, offset int, kind string, text string, "
            "media_ref string")
    assert media_captions(spans).count() == 0


def test_semantic_dedup_and_manifest_degenerate(spark):
    from html_qt_spark.operators.curation import (
        pack_shards,
        shard_manifest,
    )
    from html_qt_spark.operators.similarity import semantic_dedup

    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert semantic_dedup(emb, n_centroids=4).count() == 0
    docs = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert shard_manifest(pack_shards(docs, token_budget=10)).count() == 0


def test_r5_ops_degenerate(spark, empty_docs, blank_docs):
    """Round-5 operators on empty/blank/null inputs: sane zero/NULL
    results, never a raise."""
    from html_qt_spark.operators.curation import (
        dsir_logweights,
        hash_split,
        perplexity_buckets,
    )
    from html_qt_spark.operators.dedup import mask_common_runs_chars
    from html_qt_spark.operators.textstats import bpe_apply

    assert mask_common_runs_chars(empty_docs, n=8).count() == 0
    rows = {r.doc_id: r for r in
            mask_common_runs_chars(blank_docs, n=8).collect()}
    assert rows[3].clean_text == "" and rows[3].n_chars_masked == 0

    assert bpe_apply(empty_docs).count() == 0
    ap = {r.doc_id: r for r in bpe_apply(blank_docs).collect()}
    assert ap[1].n_words == 0 and ap[1].n_pieces == 0
    assert ap[3].n_words == 0

    assert hash_split(empty_docs).count() == 0
    assert hash_split(blank_docs).count() == 3

    assert dsir_logweights(empty_docs, empty_docs).count() == 0
    dw = {r.doc_id: r for r in
          dsir_logweights(blank_docs, blank_docs).collect()}
    assert all(dw[i].n_grams == 0 and dw[i].logw_x1000 is None
               for i in (1, 2, 3))

    assert perplexity_buckets(
        blank_docs.withColumn("lang", blank_docs.doc_id.cast("string"))
    ).count() == 0
    assert perplexity_buckets(
        empty_docs.withColumn("lang", empty_docs.doc_id.cast("string"))
    ).count() == 0
