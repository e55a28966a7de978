"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting.  All JVM-side (pyspark.sql.functions, whole-stage
codegen) — no Python workers in these paths, except the Arrow-batched
pandas apply inside BPE training (a per-word Python loop over an
already-Zipf-bounded word-type table, never the corpus)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.spread import spread_input

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
    toks = spread_input(docs, "doc_id").select(
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


# BPE-ish subword-boundary tokenizer: word pieces, digit runs, and
# individual punctuation — the shape GPT-style pre-tokenizers use
# (public pattern family; deliberately simple + engine-portable).
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def repetition_score(docs: DataFrame, *, n: int = 4) -> DataFrame:
    """(doc_id, n_grams, n_distinct_grams, rep_x1000): repetitiveness via
    word n-gram duplication — the standard cheap gibberish/boilerplate
    signal (Rae et al., Gopher 2021 repetition filters): a page whose
    4-grams are mostly duplicates is templated or degenerate.  All
    JVM-side; rep_x1000 = floor(1000 * (1 - distinct/total)) as an
    integer so the DuckDB oracle matches bit-for-bit.  Docs with fewer
    than n tokens emit no row (no grams to judge).
    """
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: t != "").alias("ts"),
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.slice("ts", 1, F.greatest(F.size("ts") - (n - 1),
                                            F.lit(0))),
                lambda _x, i: F.concat_ws(" ", F.slice("ts", i + 1, n)),
            )
        ).alias("g"),
    )
    return (
        grams.groupBy("doc_id")
        .agg(F.count("*").alias("n_grams"),
             F.countDistinct("g").alias("n_distinct_grams"))
        .select(
            "doc_id", "n_grams", "n_distinct_grams",
            F.floor(1000 * (1 - F.col("n_distinct_grams")
                            / F.col("n_grams")))
            .cast("long").alias("rep_x1000"),
        )
    )


def unigram_entropy(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, entropy_x1000): Shannon entropy of the unigram
    distribution — low-entropy docs are repetitive/templated, a standard
    corpus-quality feature.  entropy = -sum(p ln p) over token
    frequencies, scaled x1000 and floored to an integer for exact
    cross-engine comparison (the inner sum is over <=vocab double terms;
    floor after round(6) absorbs summation-order jitter)."""
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    freqs = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    totals = freqs.groupBy("doc_id").agg(F.sum("c").alias("n"))
    return (
        freqs.join(totals, "doc_id")
        .groupBy("doc_id")
        .agg(F.max("n").alias("n_tokens"),
             F.sum(-(F.col("c") / F.col("n"))
                   * F.log(F.col("c") / F.col("n"))).alias("h"))
        .select("doc_id",
                F.col("n_tokens").cast("long").alias("n_tokens"),
                F.floor(F.round(F.col("h"), 6) * 1000)
                .cast("long").alias("entropy_x1000"))
    )


_GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have",
                     "with"]


def gopher_quality(docs: DataFrame, *, min_words: int = 50,
                   max_words: int = 100_000,
                   min_mean_len_x100: int = 300,
                   max_mean_len_x100: int = 1000,
                   min_stop_hits: int = 2) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, App. A): the published
    heuristic battery every major pre-training pipeline reuses —
    word-count bounds, mean-word-length band [3,10], symbol-to-word
    ratio (# and ellipses) <= 0.1, bullet-line ratio <= 0.9, >= 80% of
    words containing an alphabetic char, and >= 2 distinct hits from the
    8-word stop list.

    Every rule is a per-row ARRAY expression — split/filter/aggregate on
    the token array, no explode, no shuffle, nothing but a narrow
    projection: the whole filter runs inside one whole-stage-codegen
    scan even at 10^12 docs.  Ratio comparisons are integer
    cross-multiplications (n_alpha*10 >= n_words*8) so the pass/fail
    bits are bit-identical on any engine — no float thresholds.

    Returns (doc_id, n_words, mean_word_len_x100, n_alpha_words,
    n_symbols, n_bullet_lines, n_lines, stop_hits, passes).
    """
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    n_words = F.size(toks)
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0), lambda acc, v: acc + v)
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    n_symbols = (F.coalesce(F.regexp_count("text", F.lit("#")), F.lit(0))
                 + F.coalesce(F.regexp_count("text", F.lit(r"\.\.\.")),
                              F.lit(0)))
    lines = F.split("text", "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(
        lines, lambda ln: ln.startswith("•") | ln.startswith("- ")
        | ln.startswith("* ")))
    stop_hits = None
    for w in _GOPHER_STOPWORDS:
        hit = F.array_contains(toks, w).cast("int")
        stop_hits = hit if stop_hits is None else stop_hits + hit
    base = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.floor(tok_chars * 100 / n_words).cast("long")
        .alias("mean_word_len_x100"),
        n_alpha.alias("n_alpha_words"),
        n_symbols.alias("n_symbols"),
        n_bullet.alias("n_bullet_lines"),
        n_lines.alias("n_lines"),
        stop_hits.alias("stop_hits"),
    )
    passes = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len_x100") >= min_mean_len_x100)
        & (F.col("mean_word_len_x100") <= max_mean_len_x100)
        & (F.col("n_symbols") * 10 <= F.col("n_words"))
        & (F.col("n_bullet_lines") * 10 <= F.col("n_lines") * 9)
        & (F.col("n_alpha_words") * 10 >= F.col("n_words") * 8)
        & (F.col("stop_hits") >= min_stop_hits)
    )
    return base.withColumn("passes", passes)


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """Corpus-trained unigram LM score: avg -ln p(tok) per document,
    p estimated from the corpus itself — the shuffle-cheap stand-in for
    CCNet's KenLM perplexity filter (an external LM is a model artifact;
    the unigram self-estimate needs none and ranks documents the same
    way for the templated-vs-prose split).  High score = rare-token-heavy
    (jargon/noise); low = stopword-heavy boilerplate.

    Plan: one vocab aggregation (Zipf-bounded — token types grow
    ~O(corpus^0.5), vastly sub-corpus), a token->vocab join AQE
    broadcasts when the vocab side fits (hash join otherwise), one
    groupBy(doc).  logprob_x1000 is floor(round(.,6)*1000) — the same
    drift-absorbing integerization the entropy oracle uses.
    Returns (doc_id, n_tokens, logprob_x1000).
    """
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    vocab = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    return (
        toks.join(vocab, "tok").crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"),
             F.sum(-F.log(F.col("c") / F.col("n"))).alias("lp"))
        .select("doc_id",
                F.col("n_tokens").cast("long").alias("n_tokens"),
                F.floor(F.round(F.col("lp") / F.col("n_tokens"), 6)
                        * 1000).cast("long").alias("logprob_x1000"))
    )


def bigram_logprob(docs: DataFrame, *, k_smooth: float = 1.0) -> DataFrame:
    """Corpus-trained bigram LM score: avg -ln p(w2|w1) per document
    with add-k smoothing — one order up from :func:`unigram_logprob`
    and the closer stand-in for CCNet's KenLM perplexity gate (bigram
    surprise separates templated/boilerplate word sequences from prose
    even when their unigram mix matches).

    p(w2|w1) = (c(w1,w2) + k) / (c_left(w1) + k·V), where c_left counts
    w1 as a bigram left-hand side and V is the corpus vocab size.  Docs
    with fewer than 2 tokens have no bigrams and are omitted.

    Plan: per-doc bigrams are built WITHOUT a shuffle (arrays_zip of
    the token array against its own 1-shifted slice, then one explode);
    the count tables are Zipf-bounded (bigram types grow far
    sub-corpus) and join on their own keys — AQE broadcasts when a side
    fits, never forced; V and the smoothing constant ride a 1-row
    broadcast.  logprob_x1000 = floor(round(.,6)*1000), the same
    drift-absorbing integerization as the entropy/unigram oracles.
    Returns (doc_id, n_bigrams, logprob_x1000).
    """
    toks_arr = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), " "),
        lambda t: t != "")
    n = F.size(toks_arr)
    # greatest(.., 0): slice() raises on negative length when a doc has
    # zero tokens (found by the degenerate-input tests)
    pairs = F.arrays_zip(
        F.slice(toks_arr, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks_arr, 2, F.greatest(n - 1, F.lit(0))))
    bi = (docs
          .select("doc_id", F.explode(pairs).alias("p"))
          .select("doc_id", F.col("p.0").alias("w1"),
                  F.col("p.1").alias("w2")))
    big_counts = bi.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    left_counts = bi.groupBy("w1").agg(F.count("*").alias("c1"))
    toks = docs.select(F.explode(toks_arr).alias("tok"))
    vsize = toks.agg(F.countDistinct("tok").alias("v"))
    p = (F.col("c12") + F.lit(k_smooth)) / \
        (F.col("c1") + F.lit(k_smooth) * F.col("v"))
    return (bi.join(big_counts, ["w1", "w2"])
            .join(left_counts, "w1")
            .crossJoin(F.broadcast(vsize))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_bigrams"),
                 F.sum(-F.log(p)).alias("lp"))
            .select("doc_id",
                    F.col("n_bigrams").cast("long").alias("n_bigrams"),
                    F.floor(F.round(F.col("lp") / F.col("n_bigrams"), 6)
                            * 1000).cast("long")
                    .alias("logprob_x1000")))


def regex_token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_regex_tokens): BPE-ish pre-tokenization count, JVM-side
    via regexp_count (no Python)."""
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(BPE_ISH_PATTERN))
        .cast("long").alias("n_regex_tokens"),
    )


def winnowing_fingerprints(docs: DataFrame, *, k: int = 5,
                           window: int = 4,
                           hash_fn: str = "xxhash64") -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    rolling k-gram hashes, keep the min hash of each sliding window,
    distinct per doc.  Returns (doc_id, fp) — multiple rows per doc.

    All JVM-side: token k-grams -> hash -> sliding-window min via
    transform over the hash array.  The selected fingerprints are the
    standard plagiarism/near-dup sketch with guaranteed match windows.

    ``hash_fn``: "xxhash64" (default, fastest) or "md5_32" — a 32-bit
    md5-prefix hash reproducible in any SQL engine (used for the exact
    DuckDB oracle; winnowing only needs *a* hash with a total order).
    """
    if hash_fn == "md5_32":
        def gram_hash(s):
            return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    else:
        gram_hash = F.xxhash64
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: t != "").alias("ts"),
    )
    grams = toks.select(
        "doc_id",
        F.transform(
            F.slice("ts", 1, F.greatest(F.size("ts") - (k - 1), F.lit(0))),
            lambda _x, i: gram_hash(F.concat_ws(" ", F.slice("ts", i + 1, k))),
        ).alias("hs"),
    )
    # min over each sliding window of `window` hashes
    wins = grams.select(
        "doc_id",
        F.transform(
            F.slice("hs", 1, F.greatest(F.size("hs") - (window - 1),
                                        F.lit(0))),
            lambda _x, i: F.array_min(F.slice("hs", i + 1, window)),
        ).alias("mins"),
    )
    return (wins.select("doc_id", F.explode("mins").alias("fp"))
            .distinct())


def tfidf_top_terms(docs: DataFrame, *, k: int = 3,
                    min_df: int = 1) -> DataFrame:
    """Per-document top-k terms by tf-idf — the classic keyword /
    topic-signal extractor over a corpus (salton-style ltc weighting
    simplified to tf * ln((N+1)/(df+1)), smooth idf).

    All JVM-side: one explode, tf agg, df agg (both map-side partial),
    a broadcastable 1-row corpus count, and a per-doc top-k window —
    the window shuffle is keyed on doc_id so it scales like any
    doc-keyed agg at 10^12 docs; the term-df table is corpus-vocabulary
    sized (bounded), NOT corpus sized.

    Deterministic output: score_x1000 = floor(round(tf*idf, 6) * 1000)
    (the entropy-operator trick — identical libm doubles in Spark and
    DuckDB, round(6) absorbing summation-order jitter), ties broken by
    term text.  Returns (doc_id, term, rank, score_x1000).
    """
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = (toks.select("doc_id", "term").distinct()
          .groupBy("term").agg(F.count("*").alias("df"))
          .where(F.col("df") >= min_df))
    n_docs = docs.select(
        F.countDistinct("doc_id").alias("n_docs"))
    scored = (tf.join(df, "term")
              .crossJoin(F.broadcast(n_docs))
              .withColumn(
                  "score",
                  F.col("tf") * F.log((F.col("n_docs") + 1)
                                      / (F.col("df") + 1))))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term"))
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("doc_id", "term",
                    F.col("rank").cast("long").alias("rank"),
                    F.floor(F.round("score", 6) * 1000)
                    .cast("long").alias("score_x1000")))


def length_percentiles(docs: DataFrame, *, by: str = "lang",
                       value_col: str = "n_chars") -> DataFrame:
    """Exact per-group length percentiles (p50/p90/p99, linear
    interpolation) — the distribution sanity check every corpus build
    records per shard/language before training.

    Uses Spark's exact ``percentile`` aggregate (sort-based within
    group; at 10^12 rows switch to approx_percentile — this exact
    variant exists because the DuckDB oracle demands bit-equality,
    quantile_cont uses the same linear interpolation).  One keyed
    shuffle with map-side partial.  Values floored x10 for
    float-drift-free comparison.
    """
    def pct(p: float, name: str):
        return F.floor(
            F.round(F.percentile(F.col(value_col), F.lit(p)), 6) * 10
        ).cast("long").alias(name)

    return (docs.groupBy(by)
            .agg(F.count("*").alias("n_docs"),
                 pct(0.5, "p50_x10"), pct(0.9, "p90_x10"),
                 pct(0.99, "p99_x10")))


def fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp64, fp8): content fingerprints — xxhash64 for fast
    clustering keys, md5 prefix for portable joins with external systems."""
    return docs.select(
        "doc_id",
        F.xxhash64("text").alias("fp64"),
        F.substring(F.md5("text"), 1, 8).alias("fp8"),
    )


# PII-scrub patterns: deliberately simple (no lookaround) so the same
# regex text runs identically under Java regex (Spark) and DuckDB RE2.
PII_EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_URL_RX = r"https?://[^\s]+"
PII_PHONE_RX = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"


def scrub_pii(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Replace emails / URLs / phone-number-shaped spans with typed
    placeholder tokens, plus per-doc counts of each replacement — the
    standard pre-training scrub pass.  URL first (an email-looking
    userinfo inside a URL must scrub as part of the URL), then email,
    then phone.  Whole-stage codegen; no Python workers.
    Returns (doc_id, clean_text, n_urls, n_emails, n_phones).
    """
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(t, PII_URL_RX, "<URL>"),
                PII_EMAIL_RX, "<EMAIL>"),
            PII_PHONE_RX, "<PHONE>").alias("clean_text"),
        F.regexp_count(t, F.lit(PII_URL_RX)).cast("long").alias("n_urls"),
        F.regexp_count(t, F.lit(PII_EMAIL_RX)).cast("long")
        .alias("n_emails"),
        F.regexp_count(t, F.lit(PII_PHONE_RX)).cast("long")
        .alias("n_phones"),
    )


# ------------------------------------------------------- subword tokens

def subword_vocab(docs: DataFrame, *, vocab_size: int = 256,
                  min_len: int = 2, max_len: int = 6,
                  text_col: str = "text",
                  sample_fraction: float | None = None,
                  id_col: str = "doc_id",
                  salt: str = "svocab") -> DataFrame:
    """Corpus-derived subword vocabulary: the ``vocab_size`` most
    frequent word-internal character n-grams (length min_len..max_len),
    counted over word OCCURRENCES, ties broken by piece ascending so
    the ranking is total and engine-portable (the DuckDB oracle
    recomputes the identical list).

    This is the deterministic stand-in for a BPE merge table: greedy
    longest-match over frequent substrings tracks subword counts far
    closer than whitespace on code/CJK-ish text (VERDICT r3 task #6),
    without shipping a trained artifact.  The piece explode is ~5x the
    token volume, so at 10^12 docs derive the vocab from a sample:
    ``sample_fraction`` keeps that share of documents by a
    deterministic id hash (xxhash64 — reproducible across runs and
    engines, unlike rand()-based sampling); top-substring frequencies
    are Zipf-stable under sampling, so the ranking barely moves.  The
    top-k runs as TakeOrdered (per-partition partial top-k, no full
    sort).  Returns (piece, n) ordered by the ranking.
    """
    if sample_fraction is not None:
        if not 0 < sample_fraction <= 1:
            raise ValueError("sample_fraction must be in (0, 1]")
        m = 1_000_000
        docs = docs.where(
            F.pmod(F.xxhash64(F.concat(
                F.lit(salt + ":"), F.col(id_col).cast("string"))),
                F.lit(m)) < int(sample_fraction * m))
    words = docs.select(
        F.explode(F.filter(F.split(text_col, " "), lambda t: t != ""))
        .alias("w"))

    def pieces_of_len(l):
        # factory, NOT a defaulted lambda: pyspark treats a 2-parameter
        # lambda in transform() as (element, index)
        return F.transform(
            F.sequence(F.lit(1), F.length("w") - l + 1),
            lambda i: F.substring(F.col("w"), i, l))

    per_len = [
        F.when(F.length("w") >= l, pieces_of_len(l))
        .otherwise(F.array().cast("array<string>"))
        for l in range(min_len, max_len + 1)
    ]
    # explicit empty-array fallback: F.sequence(1, n) flips to a
    # DESCENDING sequence when n < 1, which would fabricate pieces
    return (words
            .select(F.explode(F.flatten(F.array(*per_len)))
                    .alias("piece"))
            .groupBy("piece").agg(F.count("*").alias("n"))
            .orderBy(F.col("n").desc(), "piece")
            .limit(vocab_size))


def subword_token_count(docs: DataFrame, vocab: list[str], *,
                        min_len: int = 2, max_len: int = 6,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_subword_tokens): greedy longest-match tokenization
    against a fixed subword vocabulary, entirely in whole-stage codegen
    (nested higher-order functions — zero Python workers, zero shuffle:
    the count is a narrow per-row expression).

    Per word, a cursor walks left to right; at each position the
    longest vocab piece (max_len first, down to min_len) consumes its
    length, else one character consumes as an implicit single-char
    token — exactly the greedy-longest-match decode of a BPE-style
    vocab.  The walk is an ``aggregate`` over character indices with
    (pos, cnt) struct state, skipping indices the last match already
    consumed.  End-of-word probes need no length guard: ``substring``
    past the end returns the shorter remainder on both Spark and
    DuckDB, and matching the remainder advances the cursor past the
    end with the same +1 token either way.

    The vocab ships as per-length literal arrays (index-sized — a few
    hundred strings — the same class of broadcast as the media
    manifest); probes are linear scans of the one length class.  At a
    much larger vocab, swap the arrays for a bloom-filtered hash map
    side input.  Use the result as ``tokens_col`` for
    ``curation.pack_shards`` / ``chunk_documents`` so shard and
    context-window budgets track subword (not whitespace) counts.
    """
    word_count = subword_word_counter(vocab, min_len=min_len,
                                      max_len=max_len)
    # null text counts 0 (coalesce BEFORE split: split(NULL) is NULL and
    # would null the whole aggregate)
    words = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda t: t != "")
    return docs.select(
        id_col,
        F.aggregate(words, F.lit(0), lambda a, w: a + word_count(w))
        .cast("long").alias("n_subword_tokens"))


def subword_word_counter(vocab: list[str], *, min_len: int = 2,
                         max_len: int = 6):
    """Build the per-WORD greedy longest-match count expression: a
    callable word-column -> int column, reusable by any operator that
    needs subword weights (doc counting, subword-budget chunking).
    See :func:`subword_token_count` for the walk semantics."""
    by_len: dict[int, list[str]] = {}
    for p in vocab:
        by_len.setdefault(len(p), []).append(p)
    lit = {
        ln: F.array(*[F.lit(p) for p in sorted(ps)])
        for ln, ps in by_len.items()
    }

    def step(w, acc):
        out = None
        for ln in range(max_len, min_len - 1, -1):
            if ln not in lit:
                continue
            hit = F.array_contains(lit[ln], F.substring(w, acc["pos"], ln))
            nxt = F.struct((acc["pos"] + ln).alias("pos"),
                           (acc["cnt"] + 1).alias("cnt"))
            out = F.when(hit, nxt) if out is None else out.when(hit, nxt)
        fallback = F.struct((acc["pos"] + 1).alias("pos"),
                            (acc["cnt"] + 1).alias("cnt"))
        return fallback if out is None else out.otherwise(fallback)

    def word_count(w):
        return F.aggregate(
            F.sequence(F.lit(1), F.length(w)),
            F.struct(F.lit(1).alias("pos"), F.lit(0).alias("cnt")),
            lambda acc, i: F.when(i != acc["pos"], acc)
                            .otherwise(step(w, acc)),
            lambda acc: acc["cnt"])

    return word_count


# ------------------------------------------------------- BPE training

def _select_merge_batch(candidates, guards, vocab, limit):
    """Driver-side selection of a PROVABLY-sequential-equal batch of
    merges from one pair-count snapshot (the scan-batching trick that
    cuts BPE's per-merge corpus scans m-fold without changing a single
    merge).

    ``candidates``: [(left, right, count)] in classic order (count
    desc, then (left, right) asc) — exactly the order sequential BPE
    would pick them.  ``guards``: {(l, r): g} where g is the max
    corpus count of any trigram having (l, r) as its first or last two
    pieces — an upper bound on the count of ANY pair the merge (l, r)
    can CREATE (each created pair (x, lr)/(lr, y) occurrence descends
    from a pre-merge trigram occurrence).  ``vocab`` is a superset of
    the piece strings currently in the corpus; it is mutated in place
    (accepted merged strings are added).

    A candidate is accepted after earlier ones only when sequential
    BPE would provably still pick it next:

    - its symbols are disjoint from every earlier accepted merge's
      {left, right, merged} — so its own count is unchanged and it
      cannot have been consumed;
    - every earlier accepted merge's guard is STRICTLY below its
      count — so no pair created by an earlier merge can outrank (or
      tie) it;
    - its merged string is brand new to ``vocab`` — otherwise created
      occurrences would ADD to an existing pair's count, which the
      guard alone cannot bound; such a merge is accepted but ends the
      batch.

    Any violation ends the batch (never skips a candidate — skipping
    would reorder against the sequential algorithm).  Returns the
    accepted [(left, right, merged)] list, possibly of length 1.
    """
    accepted = []
    for left, right, count in candidates:
        if accepted:
            used = set()
            for al, ar, am in accepted:
                used.update((al, ar, am))
            if left in used or right in used:
                break
            if any(guards.get((al, ar), 0) >= count
                   for al, ar, am in accepted):
                break
        merged = left + right
        pre_existing = merged in vocab
        accepted.append((left, right, merged))
        vocab.add(merged)
        if pre_existing or len(accepted) >= limit:
            break
    return accepted


def bpe_train(docs: DataFrame, *, n_merges: int = 50,
              text_col: str = "text", batch_m: int = 16) -> DataFrame:
    """Learn byte-pair-encoding merges from the corpus — the tokenizer-
    TRAINING step a pre-training pipeline runs before counting/packing
    (the greedy counters in :func:`subword_token_count` consume the
    resulting pieces as their vocab).

    Classic BPE over word types weighted by frequency: start from
    character pieces, repeatedly count adjacent piece pairs corpus-wide
    and merge the most frequent one (ties: lexicographic (left, right)
    — a total order, so training is deterministic).  Word boundaries
    are never crossed.

    Distribution: the working set is the WORD-TYPE table (Zipf-bounded,
    vastly sub-corpus — "the" is one row with count n).  Per ROUND (not
    per merge): (1) one pair-count agg + a top-K collect (K = 4 x
    ``batch_m``, bounded), (2) one trigram-guard agg restricted to the
    K candidate pairs (collect <= K rows), (3) driver-side selection of
    up to ``batch_m`` merges that are PROVABLY identical to what
    sequential BPE would pick from this snapshot
    (:func:`_select_merge_batch` — symbol-disjointness + a trigram
    upper bound on every pair a merge can create), then (4) ONE
    Arrow-batched pandas apply of the whole accepted batch per word
    (left-to-right non-overlapping, in rank order) + localCheckpoint to
    cut the iterative lineage.  A 50k-merge vocab therefore costs
    ~50k/batch_m corpus-table scans and driver round-trips instead of
    50k of each, with bit-identical output — the scan-batching half of
    the standard parallel-BPE layout (count distributed, argmax
    central).

    Words fully merged to one piece are dropped from the working table
    (no pairs left to contribute), so the table shrinks as training
    converges.  Returns the merge table (rank:int, left, right,
    merged) — rank is application order.  Stops early when no pair
    occurs twice.
    """
    from pyspark.sql import types as T

    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.substring(F.col("w"), i, 1))
    words = (docs
             .select(F.explode(
                 F.filter(F.split(text_col, " "), lambda t: t != ""))
                 .alias("w"))
             .groupBy("w").agg(F.count("*").alias("n"))
             .select(chars.alias("p"), "n")
             .where(F.size("p") >= 2)
             .localCheckpoint())

    # piece-string superset for the merged-string-collision check:
    # distinct single chars now, plus every merged string we create
    vocab = {r.c for r in
             words.select(F.explode("p").alias("c")).distinct()
             .collect()}

    merges: list[tuple[int, str, str, str]] = []
    while len(merges) < n_merges:
        sz = F.size("p")
        pair_col = F.arrays_zip(F.slice("p", 1, sz - 1),
                                F.slice("p", 2, sz - 1))
        top_k = 4 * batch_m
        top = (words
               .select(F.explode(pair_col).alias("pr"), "n")
               .groupBy(F.col("pr.0").alias("l"),
                        F.col("pr.1").alias("r"))
               .agg(F.sum("n").alias("c"))
               .where(F.col("c") >= 2)
               .orderBy(F.col("c").desc(), "l", "r")
               .limit(top_k)
               .collect())
        if not top:
            break
        candidates = [(row.l, row.r, row.c) for row in top]
        guards: dict[tuple[str, str], int] = {}
        if len(candidates) > 1:
            # trigram guard: for each candidate pair, the max count of
            # any trigram carrying it as prefix or suffix — the bound
            # on every pair the merge can create.  One filtered agg;
            # the isin pushes the K-key filter into the explode scan.
            sep = "\x00"
            keys = [l + sep + r for l, r, _ in candidates]
            tri_col = F.arrays_zip(F.slice("p", 1, sz - 2),
                                   F.slice("p", 2, sz - 2),
                                   F.slice("p", 3, sz - 2))
            tri = (words
                   .where(sz >= 3)
                   .select(F.explode(tri_col).alias("tr"), "n")
                   .select(F.col("tr.0").alias("x"),
                           F.col("tr.1").alias("y"),
                           F.col("tr.2").alias("z"), "n"))
            k_pre = F.concat_ws(sep, "y", "z")
            k_post = F.concat_ws(sep, "x", "y")
            both = (tri
                    .where(k_pre.isin(keys) | k_post.isin(keys))
                    .groupBy("x", "y", "z").agg(F.sum("n").alias("c"))
                    .select(F.explode(F.array(
                        F.concat_ws(sep, "y", "z").alias("k"),
                        F.concat_ws(sep, "x", "y").alias("k")))
                        .alias("k"), "c")
                    .where(F.col("k").isin(keys))
                    .groupBy("k").agg(F.max("c").alias("g"))
                    .collect())
            for row in both:
                l, r = row.k.split(sep)
                guards[(l, r)] = row.g
        accepted = _select_merge_batch(
            candidates, guards, vocab, n_merges - len(merges))
        for left, right, merged in accepted:
            merges.append((len(merges), left, right, merged))

        batch = [(left, right, left + right)
                 for left, right, _ in accepted]

        @F.pandas_udf(T.ArrayType(T.StringType()))
        def apply_batch(ps: pd.Series) -> pd.Series:
            def app(p):
                p = list(p)
                for left, right, merged in batch:
                    out = []
                    i, m = 0, len(p)
                    while i < m:
                        if (i < m - 1 and p[i] == left
                                and p[i + 1] == right):
                            out.append(merged)
                            i += 2
                        else:
                            out.append(p[i])
                            i += 1
                    p = out
                return p
            return ps.map(app)

        words = (words.select(apply_batch("p").alias("p"), "n")
                 .where(F.size("p") >= 2)
                 .localCheckpoint())

    spark = docs.sparkSession
    schema = T.StructType([
        T.StructField("rank", T.IntegerType()),
        T.StructField("left", T.StringType()),
        T.StructField("right", T.StringType()),
        T.StructField("merged", T.StringType()),
    ])
    return spark.createDataFrame(merges, schema)


def linear_classifier_score(docs: DataFrame, *, dim: int = 1024,
                            weights: list[float] | None = None,
                            salt: str = "lcls",
                            hash_fn: str = "xxhash64") -> DataFrame:
    """Hashed bag-of-words linear classifier — the application plumbing
    for fastText-style quality/educational-value classifiers (DCLM,
    FineWeb-Edu): score = mean over tokens of w[h(tok) mod dim].

    ``weights`` is the trained model (index-sized, ships as a literal
    array — the classifier IS small; that's why this family is used at
    corpus scale).  Default weights are a deterministic hash-seeded
    stand-in in [-1, 1) (training is an offline artifact, exactly like
    IVF centroids before :func:`kmeans_centroids`; plug real weights
    in).  The whole scorer is one narrow projection — feature hashing,
    weight lookup, and the mean all run per row in whole-stage codegen:
    zero shuffle, zero Python, which is the entire point of applying a
    linear head instead of an LLM judge at 10^12 docs.

    ``hash_fn="md5_32"`` swaps in the engine-portable md5-prefix hash
    (the DuckDB oracle recomputes identical bucket ids).  Docs with no
    tokens score null.  Returns (doc_id, n_tokens, score_x1000).
    """
    if weights is None:
        import hashlib

        weights = [
            (int(hashlib.md5(f"w:{i}".encode()).hexdigest()[:8], 16)
             % 2000 - 1000) / 1000.0
            for i in range(dim)
        ]
    if len(weights) != dim:
        raise ValueError("len(weights) must equal dim")
    w_arr = F.array(*[F.lit(float(x)) for x in weights])
    toks = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), " "),
        lambda t: t != "")
    if hash_fn == "md5_32":
        def bucket(t):
            return F.pmod(
                F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
                F.lit(dim))
    else:
        def bucket(t):
            return F.pmod(F.xxhash64(F.concat(F.lit(salt + ":"), t)),
                          F.lit(dim))
    total = F.aggregate(
        toks, F.lit(0.0),
        lambda acc, t: acc + F.element_at(w_arr,
                                          (bucket(t) + 1).cast("int")))
    n = F.size(toks)
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.when(n > 0,
               F.floor(F.round(total / n, 6) * 1000).cast("long"))
        .alias("score_x1000"))


# fixed demo merge table for the oracle-checked apply path: common
# English digraph merges, applied in list order (rank order).  A
# trained table from :func:`bpe_train` drops in the same way.
BPE_FIXED_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("o", "r"), ("s", "t"), ("a", "r"), ("o", "n"), ("l", "e"),
    ("in", "g"), ("an", "d"),
]

_BPE_SEP = "\x1f"


def bpe_apply(docs: DataFrame,
              merges: list[tuple[str, str]] | None = None, *,
              text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Tokenize with a GIVEN merge table — the BPE *application* path
    (the half of the tokenizer that runs on every corpus pass, unlike
    training which runs once).  Exactly classic BPE apply: each word
    starts as characters and every merge is applied in rank order,
    left-to-right, non-overlapping.

    Stays entirely in whole-stage codegen via a string encoding: each
    word is rewritten so every piece is wrapped in \\x1f sentinels
    (``␟p␟``), and one merge (l, r)→lr is then EXACTLY one literal
    ``replace(s, '␟l␟␟r␟', '␟lr␟')`` — string replace is leftmost
    non-overlapping, the same traversal the classic algorithm does,
    and every SQL engine implements it identically, which is what
    makes the per-doc output hash oracle-checkable.  The m merges
    compile to m nested replace calls — zero Python, zero shuffle,
    one narrow projection.

    Returns (id_col, n_words, n_pieces, pieces_hash) — the piece
    STREAM is hashed (md5 over \\x1f-joined pieces) so the driver
    check pins every piece boundary without array columns.
    """
    if merges is None:
        merges = BPE_FIXED_MERGES
    s = _BPE_SEP

    def tokenize(w):
        # (?s): '.' must match line terminators too — a token can carry
        # \n/\r (text splits on spaces only), and Java vs RE2 disagree
        # on which terminators '.' excludes, so without dotall the two
        # engines would hash different piece streams
        expr = F.regexp_replace(w, "(?s)(.)", s + "$1" + s)
        for left, right in merges:
            expr = F.replace(
                expr,
                F.lit(s + left + s + s + right + s),
                F.lit(s + left + right + s))
        return F.split(F.regexp_replace(expr, "^\x1f|\x1f$", ""),
                       "\x1f\x1f")

    words = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda t: t != "")
    pieces = F.flatten(F.transform(words, tokenize))
    return docs.select(
        id_col,
        F.size(words).cast("long").alias("n_words"),
        F.size(pieces).cast("long").alias("n_pieces"),
        F.md5(F.concat_ws(s, pieces)).alias("pieces_hash"))


def frequent_ngrams(docs: DataFrame, *, n: int = 5, k: int = 20,
                    min_count: int = 2,
                    text_col: str = "text") -> DataFrame:
    """Corpus-wide top-k word n-grams — the boilerplate-mining pass a
    curation pipeline runs to DISCOVER its removal rules (C4's "three
    sentence" spans, licence blocks, cookie banners all surface here
    before anyone writes a filter for them).

    Plan: shuffle-free per-doc n-gram build (slice + transform over the
    token array), one count aggregation on the Zipf-bounded gram table
    (map-side combined), then a deterministic top-k — ORDER BY count
    DESC with the gram string as tiebreak compiles to TakeOrdered
    (per-partition partial top-k + driver merge of k rows, never a full
    sort).  ``min_count`` prunes the singleton tail before the ordering
    so the top-k heap never sees it.
    Returns (ngram, n_docs, n_occurrences) — k rows.
    """
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda t: t != "")
    grams = spread_input(docs, "doc_id").select(
        "doc_id", toks.alias("_ts")).select(
        "doc_id",
        F.explode(
            F.transform(
                F.slice(F.col("_ts"), 1,
                        F.greatest(F.size("_ts") - (n - 1), F.lit(0))),
                lambda _x, i: F.concat_ws(
                    " ", F.slice(F.col("_ts"), i + 1, n)),
            )).alias("ngram"))
    # two combine-friendly aggregations instead of countDistinct: the
    # per-(doc, ngram) pre-count collapses within-doc repeats in the
    # map-side partial agg BEFORE anything is shuffled (a countDistinct
    # here forces the full (ngram, doc_id) stream through the first
    # exchange); n_docs is then a plain count and n_occurrences a sum —
    # identical results, partial aggregation in both phases.
    per_doc = grams.groupBy("doc_id", "ngram").agg(F.count("*").alias("_c"))
    return (per_doc.groupBy("ngram")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("_c").alias("n_occurrences"))
            .where(F.col("n_occurrences") >= min_count)
            .orderBy(F.col("n_occurrences").desc(),
                     F.col("n_docs").desc(), "ngram")
            .limit(k))
