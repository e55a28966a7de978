"""Round-3 corpus-analytics operators: tf-idf top terms, exact length
percentiles, commonness-based paragraph boilerplate filter."""

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


def test_tfidf_prefers_rare_terms(spark):
    from html_qt_spark.operators.textstats import tfidf_top_terms

    rows = [
        (1, "common common common zebra"),
        (2, "common words here and there"),
        (3, "common words appear everywhere daily"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.doc_id, r.rank): (r.term, r.score_x1000)
           for r in tfidf_top_terms(docs, k=2).collect()}
    # doc 1's top term is the corpus-unique 'zebra', not the 3x 'common'
    assert got[(1, 1)][0] == "zebra"
    # zebra: tf=1, df=1, N=3 -> ln(4/2) = ln 2
    assert got[(1, 1)][1] == math.floor(round(math.log(2), 6) * 1000)
    # 'common' appears in every doc -> idf = ln(4/4) = 0 -> score 0
    common_scores = [v[1] for v in got.values() if v[0] == "common"]
    assert all(s == 0 for s in common_scores)


def test_tfidf_rank_ties_break_by_term(spark):
    from html_qt_spark.operators.textstats import tfidf_top_terms

    docs = spark.createDataFrame(
        [(1, "beta alpha"), (2, "unrelated stuff")], ["doc_id", "text"])
    got = [(r.rank, r.term)
           for r in tfidf_top_terms(docs, k=2)
           .where("doc_id = 1").orderBy("rank").collect()]
    # equal tf/df -> equal score -> alphabetical tiebreak
    assert got == [(1, "alpha"), (2, "beta")]


def test_length_percentiles_exact(spark):
    from html_qt_spark.operators.textstats import length_percentiles

    rows = [("en", float(v)) for v in (10, 20, 30, 40, 50)] \
        + [("fr", 100.0)]
    docs = spark.createDataFrame(rows, ["lang", "n_chars"])
    got = {r.lang: r for r in length_percentiles(docs).collect()}
    assert got["en"].n_docs == 5
    assert got["en"].p50_x10 == 300           # median 30
    # p90 over 5 points, linear interpolation: i = 0.9*4 = 3.6 -> 46
    assert got["en"].p90_x10 == 460
    assert got["fr"].p50_x10 == got["fr"].p99_x10 == 1000


def test_paragraph_filter_common_drops_boilerplate_everywhere(spark):
    """Unlike first-wins dedup, the commonness rule drops the shared
    banner from EVERY document including the first."""
    from html_qt_spark.operators.dedup import paragraph_filter_common

    banner = "accept cookies to continue"
    rows = [
        (1, f"{banner}\n\nunique alpha prose"),
        (2, f"{banner}\n\nunique beta prose"),
        (3, "no banner here at all"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in
           paragraph_filter_common(docs, max_doc_freq=2).collect()}
    assert got[1].clean_text == "unique alpha prose"
    assert got[2].clean_text == "unique beta prose"
    assert got[3].clean_text == "no banner here at all"
    assert got[1].n_dropped == got[2].n_dropped == 1


def test_paragraph_filter_common_keeps_within_doc_repeats(spark):
    from html_qt_spark.operators.dedup import paragraph_filter_common

    # the same paragraph twice in ONE doc is 1 distinct doc -> kept
    docs = spark.createDataFrame(
        [(1, "twice\n\ntwice\n\nother")], ["doc_id", "text"])
    got = paragraph_filter_common(docs, max_doc_freq=2).collect()[0]
    assert got.clean_text == "twice\n\ntwice\n\nother"
    assert got.n_dropped == 0


def test_gopher_quality_rules(spark):
    from html_qt_spark.operators.textstats import gopher_quality

    prose = ("the quick brown fox and the lazy dog have been seen with "
             "many other animals that wander over fields of green grass "
             "while the sun sets slowly behind distant hills casting "
             "long shadows that stretch to the edge of the quiet village "
             "where people gather to share stories of the day") # 50+ words
    rows = [
        (1, prose),
        (2, "short doc"),                                # < 50 words
        (3, " ".join(["####"] * 60)),                    # symbols, no alpha
        (4, "\n".join(["- bullet point here"] * 10)),    # all bullets
        (5, " ".join(["zq"] * 60)),                      # no stopwords, len 2
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in gopher_quality(docs).collect()}
    assert got[1].passes
    assert got[1].stop_hits >= 2 and got[1].n_words >= 50
    assert not got[2].passes            # word-count floor
    assert not got[3].passes            # symbol ratio + alpha fraction
    assert got[4].n_bullet_lines == 10 and not got[4].passes
    assert not got[5].passes            # mean length + stopwords


def test_unigram_logprob_ranks_rare_tokens_higher(spark):
    from html_qt_spark.operators.textstats import unigram_logprob

    # "common common ..." docs score low; the doc full of hapaxes scores high
    rows = [(i, "common words repeated " * 5) for i in range(5)]
    rows.append((99, "xylophone quixotic zephyr jubilant oblivion"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.logprob_x1000 for r in unigram_logprob(docs).collect()}
    assert got[99] > got[0]
    assert got[0] == got[1]  # identical docs, identical scores


def test_bigram_logprob_hand_computed(spark):
    """Add-one bigram LM against a hand-computed case; short docs (<2
    tokens) are omitted; count tables are never planner-forced
    broadcasts (vocab-sized sides, AQE decides)."""
    import math

    from html_qt_spark.operators.textstats import bigram_logprob

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a"), (3, "x y")], ["doc_id", "text"])
    got = {r.doc_id: (r.n_bigrams, r.logprob_x1000)
           for r in bigram_logprob(docs).collect()}
    # corpus: bigrams ab,ba,ab,bc,xy; V=5; left counts a=2,b=2,x=1
    p_ab = (2 + 1) / (2 + 5)
    p_ba = (1 + 1) / (2 + 5)
    p_bc = (1 + 1) / (2 + 5)
    lp1 = -(2 * math.log(p_ab) + math.log(p_ba) + math.log(p_bc)) / 4
    p_xy = (1 + 1) / (1 + 5)
    lp3 = -math.log(p_xy)
    exp = {
        1: (4, math.floor(round(lp1, 6) * 1000)),
        3: (1, math.floor(round(lp3, 6) * 1000)),
    }
    assert got == exp, (got, exp)
    assert 2 not in got  # single-token doc has no bigrams

    plan = bigram_logprob(docs)._jdf.queryExecution() \
        .optimizedPlan().toString()
    # the only hinted broadcast is the 1-row vocab-size scalar
    assert plan.lower().count("hint") <= 1, plan


def test_linear_classifier_score_plan_and_weights(spark):
    """The classifier application is one narrow projection (no
    Exchange, no Python workers); real weights are pluggable and score
    exactly as the hand computation says."""
    from pyspark.sql import functions as F

    from html_qt_spark.operators.textstats import linear_classifier_score

    docs = spark.createDataFrame(
        [(1, "aa bb aa"), (2, "")], ["doc_id", "text"])
    plan = linear_classifier_score(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan

    # pluggable weights: dim=4, xxhash64 buckets computed by the engine
    # itself, then the mean checked by hand
    w = [0.5, -0.25, 1.0, 0.0]
    out = {r.doc_id: (r.n_tokens, r.score_x1000)
           for r in linear_classifier_score(
               docs, dim=4, weights=w).collect()}
    b = {r.t: r.b for r in docs.sparkSession.createDataFrame(
        [("aa",), ("bb",)], ["t"]).select(
        "t", F.pmod(F.xxhash64(F.concat(F.lit("lcls:"), F.col("t"))),
                    F.lit(4)).alias("b")).collect()}
    import math
    exp = (2 * w[b["aa"]] + w[b["bb"]]) / 3
    assert out[1] == (3, math.floor(round(exp, 6) * 1000))
    assert out[2] == (0, None)  # empty doc: null score, not a crash

    with __import__("pytest").raises(ValueError):
        linear_classifier_score(docs, dim=8, weights=[1.0])


def test_frequent_ngrams_finds_planted_boilerplate(spark):
    """Boilerplate mining: a licence line shared by many docs tops the
    n-gram table; the plan is a TakeOrdered partial top-k, never a
    global Sort of the gram table."""
    from html_qt_spark.operators.textstats import frequent_ngrams

    lic = "all rights reserved by the original author"
    rows = ([(i, f"doc {i} body text {lic}") for i in range(30)]
            + [(100 + i, f"unique words only here variant {i} "
                f"alpha{i} beta{i} gamma{i} delta{i}")
               for i in range(10)])
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    top = frequent_ngrams(docs, n=5, k=5).collect()
    assert top[0].n_occurrences >= 30
    assert all(w in lic or w == "text" or w == "body"
               for w in top[0].ngram.split())
    plan = frequent_ngrams(docs, n=5, k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
