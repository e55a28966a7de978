"""End-to-end curation pipeline: raw docs -> packed training shards."""

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


def test_curation_job_end_to_end(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from html_qt_spark.plans.curation_pipeline import run_curation_job

    out = str(tmp_path_factory.mktemp("curate"))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")

    stats = run_curation_job(spark, docs, out, benchmark=bench,
                             min_words=3, max_per_source=50,
                             token_budget=512)
    # monotone survivor funnel through every enabled stage
    order = ["input", "quality", "exact_dedup", "near_dedup",
             "decontaminated", "rebalanced", "capped"]
    vals = [stats[k] for k in order]
    assert vals == sorted(vals, reverse=True), stats
    assert stats["written"] == stats["capped"]
    assert stats["written"] > 0

    shards = spark.read.parquet(f"{out}/shards")
    # no surviving exact duplicates
    assert (shards.groupBy(F.md5("text")).count()
            .where("count > 1").count() == 0)
    # the planted benchmark docs were decontaminated away
    leaked = shards.join(bench.select("doc_id"), "doc_id").count()
    assert leaked == 0
    # shard token budgets hold per (lang, bucket, shard): total <=
    # budget + one doc overhang
    over = (shards.groupBy("lang", "pack_bucket", "shard_id")
            .agg(F.sum("n_tokens").alias("tot"),
                 F.max("n_tokens").alias("mx"))
            .where(F.col("tot") > 512 + F.col("mx")).count())
    assert over == 0
    # per-source cap respected
    assert (shards.groupBy("source").count()
            .where("count > 50").count() == 0)


def test_curation_job_stats_off_still_writes(spark, tmp_path_factory):
    from html_qt_spark.plans.curation_pipeline import run_curation_job

    out = str(tmp_path_factory.mktemp("curate2"))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stats = run_curation_job(spark, docs, out, min_words=3,
                             collect_stats=False)
    assert stats == {}
    assert spark.read.parquet(f"{out}/shards").count() > 0


def test_curation_job_subword_budgets(spark, tmp_path_factory):
    """With subword_vocab_size set, shard packing runs on greedy
    subword counts: n_tokens in the written shards equals the engine's
    subword counter over the same text (not the whitespace count), and
    per-shard budgets hold under subword accounting."""
    from pyspark.sql import functions as F

    from html_qt_spark.operators.textstats import (
        subword_token_count,
        token_count,
    )
    from html_qt_spark.plans.curation_pipeline import run_curation_job

    out = str(tmp_path_factory.mktemp("curate_sub"))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stats = run_curation_job(spark, docs, out, min_words=3,
                             token_budget=256, subword_vocab_size=32)
    assert stats["written"] > 0
    shards = spark.read.parquet(f"{out}/shards")

    # n_tokens is the subword count, and differs from whitespace
    ws = token_count(shards.select("doc_id", "text")) \
        .select("doc_id", F.col("n_tokens").alias("n_ws"))
    joined = shards.join(ws, "doc_id")
    assert joined.where(F.col("n_tokens") <= F.col("n_ws")).count() == 0

    # budget invariant per (lang, bucket, shard)
    tot = (shards.groupBy("lang", "pack_bucket", "shard_id")
           .agg(F.sum("n_tokens").alias("t"),
                F.max("n_tokens").alias("m")))
    assert tot.where(F.col("t") > 256 + F.col("m")).count() == 0


def test_curation_job_exact_substring_stage(spark, tmp_path_factory):
    """With mask_run_tokens set, duplicated runs are gone from the
    written shards (no 6-token run shared across output docs), and the
    funnel stays monotone through the new stage."""
    from pyspark.sql import functions as F

    from html_qt_spark.plans.curation_pipeline import run_curation_job

    out = str(tmp_path_factory.mktemp("curate_mask"))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stats = run_curation_job(spark, docs, out, min_words=3,
                             token_budget=512, mask_run_tokens=6)
    assert stats["run_masked"] <= stats["quality"]
    assert stats["written"] > 0
    shards = spark.read.parquet(f"{out}/shards")
    toks = shards.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: t != "").alias("ts"))
    grams = toks.where(F.size("ts") >= 6).select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.size("ts") - 6),
            lambda i: F.concat_ws("\x00", F.slice("ts", i + 1, 6))))
        .alias("g"))
    leftover = (grams.groupBy("g")
                .agg(F.countDistinct("doc_id").alias("nd"))
                .where("nd >= 2").count())
    assert leftover == 0, leftover


def test_curation_job_classifier_gate(spark, tmp_path_factory):
    """classifier_min_x1000 gates on the linear-head score: survivors
    all score at or above the threshold, and the funnel shrinks
    relative to the ungated run."""
    from html_qt_spark.operators.textstats import linear_classifier_score
    from html_qt_spark.plans.curation_pipeline import run_curation_job

    out = str(tmp_path_factory.mktemp("curate_cls"))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = run_curation_job(spark, docs,
                            str(tmp_path_factory.mktemp("curate_base")),
                            min_words=3, token_budget=512)
    gated = run_curation_job(spark, docs, out, min_words=3,
                             token_budget=512, classifier_min_x1000=0)
    assert gated["classifier"] <= gated["quality"]
    assert gated["written"] <= base["written"]
    shards = spark.read.parquet(f"{out}/shards")
    scored = linear_classifier_score(shards.select("doc_id", "text"))
    assert scored.where("score_x1000 < 0").count() == 0


def test_curation_job_r5_gates_and_split(spark, tmp_path_factory):
    """Round-5 stages in the funnel: CCNet tail-bucket drop, DSIR
    importance gate, and deterministic train/val/test shard layout —
    monotone survivors, split-partitioned output, offsets intact."""
    from pyspark.sql import functions as F

    from html_qt_spark.plans.curation_pipeline import run_curation_job

    out = str(tmp_path_factory.mktemp("curate_r5"))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    target = docs.where("lang = 'en'")

    stats = run_curation_job(
        spark, docs, out, min_words=3, token_budget=512,
        ppl_drop_tail=1, dsir_target=target,
        dsir_min_logw_x1000=-10_000_000,
        split_fractions={"train": 0.8, "val": 0.1, "test": 0.1})
    order = ["input", "quality", "ppl_gate", "exact_dedup",
             "near_dedup", "dsir_gate", "rebalanced"]
    vals = [stats[k] for k in order]
    assert vals == sorted(vals, reverse=True), stats
    # tail drop removes ~1/3 of scored docs
    assert stats["ppl_gate"] < stats["quality"]
    assert stats["written"] > 0

    shards = spark.read.parquet(f"{out}/shards")
    assert set(shards.select("split").distinct().toPandas()["split"]) \
        <= {"train", "val", "test"}
    assert "train" in set(
        r.split for r in shards.select("split").distinct().collect())
    # shard ids are namespaced per (split, lang, pack_bucket): within
    # each tuple the budget rule holds for multi-doc shards
    over = (shards.groupBy("split", "lang", "pack_bucket", "shard_id")
            .agg(F.sum("n_tokens").alias("t"), F.count("*").alias("n"))
            .where("n > 1 AND t > 512 + 512").count())
    assert over == 0


def test_pipeline_gates_keep_unscored_docs(spark, tmp_path_factory):
    """Review fix: a doc too short to receive a bigram/DSIR score was
    never judged — the gates must pass it through, not silently drop it
    via an inner join on the scored keep-set."""
    from pyspark.sql import functions as F

    from html_qt_spark.plans.curation_pipeline import run_curation_job

    out = str(tmp_path_factory.mktemp("curate_unscored"))
    base = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text", "lang", "source").limit(60)
    oneword = spark.createDataFrame(
        [(990001, "solitary", "en", "src-x")],
        ["doc_id", "text", "lang", "source"])
    docs = base.unionByName(oneword)
    stats = run_curation_job(
        spark, docs, out, min_words=1, token_budget=512, alpha=1.0,
        ppl_drop_tail=1, dsir_target=docs.where("lang = 'en'"),
        dsir_min_logw_x1000=-10_000_000)
    shards = spark.read.parquet(f"{out}/shards")
    assert shards.where(F.col("doc_id") == 990001).count() == 1, stats
