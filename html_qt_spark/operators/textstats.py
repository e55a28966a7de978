"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting.  All JVM-side (pyspark.sql.functions, whole-stage
codegen) — no Python workers in these paths."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword sets for the n-gram/stopword language-ID
# heuristic (public common-word lists; deliberately small and frozen so
# results are deterministic and oracle-reproducible).
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}


def token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars): whitespace tokenization + char count."""
    return docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")
               ).alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Per-doc quality features: token count, vocabulary size (distinct
    tokens), chars, and mean token length x100 as an integer (integer so
    the DuckDB oracle matches bit-for-bit — no float rounding drift)."""
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    return (
        toks.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("tok").alias("vocab"),
            F.sum(F.length("tok")).alias("tok_chars"),
        )
        .select(
            "doc_id", "n_tokens", "vocab",
            # floor (not cast) so the DuckDB oracle matches bit-for-bit:
            # Spark cast(double->long) truncates, DuckDB CAST rounds
            F.floor(F.col("tok_chars") * 100 / F.col("n_tokens"))
            .cast("long").alias("mean_tok_len_x100"),
            F.floor(F.col("vocab") * 1000 / F.col("n_tokens"))
            .cast("long").alias("ttr_x1000"),
        )
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-marker language ID: score = count of marker-word hits per
    language, argmax wins ('und' when no marker hits).  Pure JVM: one
    explode + pivoted conditional agg."""
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok"))
    scores = [
        F.sum(F.when(F.col("tok").isin(words), 1).otherwise(0))
        .alias(f"s_{lang}")
        for lang, words in _LANG_MARKERS.items()
    ]
    scored = toks.groupBy("doc_id").agg(*scores)
    langs = list(_LANG_MARKERS)
    best = F.greatest(*[F.col(f"s_{lg}") for lg in langs])
    pick = F.lit("und")
    # reversed so that on ties the FIRST language in _LANG_MARKERS wins
    for lg in reversed(langs):
        pick = F.when((F.col(f"s_{lg}") == best) & (best > 0),
                      F.lit(lg)).otherwise(pick)
    return scored.select("doc_id", pick.alias("lang_pred"), best.alias("lang_hits"))


def fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp64, fp8): content fingerprints — xxhash64 for fast
    clustering keys, md5 prefix for portable joins with external systems."""
    return docs.select(
        "doc_id",
        F.xxhash64("text").alias("fp64"),
        F.substring(F.md5("text"), 1, 8).alias("fp8"),
    )
