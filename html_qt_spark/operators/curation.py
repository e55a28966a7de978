"""Corpus-curation operators: deterministic sampling and shard packing.

Production training-data pipelines sample and shard *deterministically*
(a re-run must pick the same documents — RNG-based sample() is not
reproducible across cluster layouts), so both operators here are pure
functions of the data:

- hash_sample: keep a doc iff hash(salt || doc_id) mod M < rate*M — the
  standard reproducible down-sampler; changing the salt draws an
  independent sample.
- pack_shards: assign documents to contiguous training shards of
  ~token_budget tokens (running-sum bucketing in deterministic doc
  order) — the "pack documents into fixed-size shards" step before
  sequence building.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _id_hash(col, salt: str, hash_fn: str):
    s = F.concat(F.lit(salt + ":"), F.col(col).cast("string"))
    if hash_fn == "md5_32":
        return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    return F.pmod(F.xxhash64(s), F.lit(2**31)).cast("long")


def hash_sample(docs: DataFrame, *, rate: float, salt: str = "s0",
                id_col: str = "doc_id",
                hash_fn: str = "xxhash64") -> DataFrame:
    """Deterministic ``rate``-fraction sample keyed on the document id.

    One narrow filter — no shuffle, no RNG state; the same (salt, rate)
    always selects the same documents on any cluster.  ``hash_fn``
    "md5_32" is the engine-portable family used by the DuckDB oracle.
    """
    m = 1_000_000
    return docs.where(
        _id_hash(id_col, salt, hash_fn) % m < int(rate * m))


def decontaminate(docs: DataFrame, benchmark: DataFrame, *,
                  n: int = 3, min_overlap: int = 1,
                  id_col: str = "doc_id") -> DataFrame:
    """Benchmark decontamination: flag training documents whose word
    ``n``-gram sets overlap an evaluation/benchmark set (the standard
    leakage check run before every pre-training job — GPT-3 App. C /
    PaLM / Llama all describe this exact n-gram-collision form).

    Plan shape at 10^12 docs: the benchmark side is an eval suite —
    thousands of documents, not a crawl — so its distinct shingle set is
    genuinely broadcast-sized and ``F.broadcast`` is CORRECT here (the
    one join in this module where forcing it is right, in contrast to
    the corpus-sized sides deliberately left to AQE in
    :mod:`html_qt_spark.operators.dedup`).  The corpus side is one
    narrow explode + a broadcast-join filter + one groupBy(doc) — no
    corpus self-join anywhere.  For a benchmark too big to broadcast,
    drop the hint and the identical plan degrades to a shuffle join.

    Returns (id_col, n_shingles, n_contaminated, overlap_frac,
    contaminated) — one row per document with >= 1 shingle; docs shorter
    than ``n`` tokens have no shingles and are vacuously clean (absent).
    """
    from .dedup import shingles

    doc_sh = shingles(docs, n=n).distinct()
    bench_sh = (shingles(benchmark.select(F.col(id_col).alias("doc_id"),
                                          "text"), n=n)
                .select("shingle").distinct())
    sizes = doc_sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    hits = (doc_sh.join(F.broadcast(bench_sh), "shingle")
            .groupBy(id_col).agg(F.count("*").alias("n_contaminated")))
    return (sizes.join(hits, id_col, "left")
            .select(id_col, "n_shingles",
                    F.coalesce("n_contaminated", F.lit(0))
                    .alias("n_contaminated"),
                    F.round(F.coalesce("n_contaminated", F.lit(0))
                            / F.col("n_shingles"), 3).alias("overlap_frac"),
                    (F.coalesce("n_contaminated", F.lit(0))
                     >= min_overlap).alias("contaminated")))


def cap_per_group(docs: DataFrame, *, group_col: str = "source",
                  max_per_group: int = 100, id_col: str = "doc_id",
                  salt: str = "cap", hash_fn: str = "xxhash64",
                  pre_salt_buckets: int = 16) -> DataFrame:
    """Keep at most ``max_per_group`` documents per ``group_col`` value
    (per-domain caps — the CommonCrawl curation rule that stops one
    mega-domain from dominating the corpus), selected by a deterministic
    pseudo-random priority hash(salt || id) so the kept subset is an
    unbiased sample, reproducible across reruns and cluster layouts.

    Skew is the whole problem at scale: a naive
    ``Window.partitionBy(group)`` funnels a 10^9-page domain through one
    task.  Two-phase cap: rows are first bucketed by
    hash % ``pre_salt_buckets`` and capped at ``max_per_group`` WITHIN
    (group, bucket) — the hot group's sort spreads over
    ``pre_salt_buckets`` tasks and survivors shrink to at most
    buckets*max rows per group — then the exact top-``max_per_group``
    window runs over survivors only.  EXACTLY equivalent to the single
    global window: the group-wide top-N by (priority, id) is contained
    in the union of per-bucket top-Ns (any row in the group's top N is
    a fortiori in its own bucket's top N), so the pre-cap never drops a
    winner.  ``pre_salt_buckets=0`` disables the pre-pass.

    Returns the input columns of the kept rows (no rank column).
    """
    pri = _id_hash(id_col, salt, hash_fn)
    out = docs
    if pre_salt_buckets:
        wb = (Window.partitionBy(group_col, pri % pre_salt_buckets)
              .orderBy(pri.asc(), F.col(id_col).asc()))
        out = (out.withColumn("_prn", F.row_number().over(wb))
               .where(F.col("_prn") <= max_per_group).drop("_prn"))
    w = (Window.partitionBy(group_col)
         .orderBy(pri.asc(), F.col(id_col).asc()))
    return (out.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_per_group).drop("_rn"))


def temperature_sample(docs: DataFrame, *, group_col: str = "lang",
                       alpha: float = 0.5, id_col: str = "doc_id",
                       salt: str = "temp",
                       hash_fn: str = "xxhash64") -> DataFrame:
    """Temperature-based group rebalancing: keep each group with
    probability rate_g = (n_min / n_g)^(1-alpha), so expected kept
    counts are proportional to n_g^alpha (multilingual sampling a la
    mBERT/XLM-R exponent-smoothing; alpha=1 keeps everything, alpha=0
    flattens every group to ~n_min).  Selection is the same
    deterministic hash(salt || id) filter as :func:`hash_sample` — no
    RNG, layout-independent.

    Plan: one groupBy for counts (one row per group), joined back, then
    a narrow filter.  The rates side is NOT force-broadcast: for
    ``group_col=lang`` it is a few hundred rows and AQE broadcasts it
    anyway, but for a high-cardinality group (per-domain rebalancing,
    10^8 rows) a forced broadcast would be the executor-OOM anti-pattern
    — a plain join lets AQE pick per actual size.  The 1-row global
    minimum is the only forced broadcast.

    alpha=0.5 computes the rate via sqrt (IEEE-correctly-rounded in
    every engine) so the kept set is bit-reproducible cross-engine;
    other alphas use pow (1-ulp engine variance possible at the
    keep/drop boundary — fine in production, avoided in the oracle).
    """
    counts = docs.groupBy(group_col).agg(F.count("*").alias("_n"))
    min_n = counts.agg(F.min("_n").alias("_min_n"))
    ratio = F.col("_min_n") / F.col("_n")
    if abs(alpha - 0.5) < 1e-12:
        rate = F.sqrt(ratio)
    else:
        rate = F.pow(ratio, F.lit(1.0 - alpha))
    rates = (counts.crossJoin(F.broadcast(min_n))
             .select(group_col, rate.alias("_rate")))
    m = 1_000_000
    return (docs.join(rates, group_col)
            .where(_id_hash(id_col, salt, hash_fn) % m
                   < (F.col("_rate") * m).cast("long"))
            .drop("_rate"))


def pack_shards(docs: DataFrame, *, token_budget: int,
                tokens_col: str = "n_tokens",
                id_col: str = "doc_id",
                partition_cols: list[str] | None = None) -> DataFrame:
    """Assign each document a shard_id so consecutive documents (in
    deterministic ``id_col`` order) fill ~``token_budget`` tokens per
    shard: shard_id = floor(exclusive-prefix-sum(tokens) / budget).

    A document larger than the budget gets its own shard (never split
    here — sequence-level splitting happens downstream).

    ``partition_cols`` (e.g. a date / lang / bucket column) is the scale
    path: each partition packs independently — the prefix-sum window is
    ``Window.partitionBy(*partition_cols)``, so the physical plan is one
    hash Exchange on those columns instead of a single-partition global
    sort, and shard identity is (partition_cols..., shard_id).  The
    unpartitioned default is a GLOBAL pack — an explicit special case
    that funnels every row through one task's sort; only use it for
    small curated sets (or oracle checks), never at corpus scale.
    Returns input columns + shard_id.
    """
    if partition_cols:
        w = (Window.partitionBy(*partition_cols).orderBy(id_col)
             .rowsBetween(Window.unboundedPreceding, -1))
    else:
        w = (Window.orderBy(id_col)
             .rowsBetween(Window.unboundedPreceding, -1))
    return (docs.withColumn(
        "_cum_before",
        F.coalesce(F.sum(tokens_col).over(w), F.lit(0)))
        .withColumn("shard_id",
                    (F.col("_cum_before") / F.lit(token_budget))
                    .cast("long"))
        .drop("_cum_before"))


def chunk_documents(docs: DataFrame, *, chunk_tokens: int = 512,
                    overlap: int = 64, text_col: str = "text",
                    id_col: str = "doc_id",
                    min_tail_tokens: int = 1) -> DataFrame:
    """Context-window splitting: cut each document's token stream into
    chunks of ``chunk_tokens`` whitespace tokens with ``overlap`` tokens
    of left context repeated at every boundary (stride =
    chunk_tokens - overlap) — the sequence-building step between corpus
    curation and the trainer.  Chunk starts: 0, stride, 2*stride, ...;
    a final window shorter than ``min_tail_tokens`` (fully contained in
    the previous chunk's overlap) is not emitted.

    Pure per-row ARRAY arithmetic (split/sequence/transform/slice) +
    one posexplode — narrow, zero shuffle, whole-stage codegen until the
    generator.  Returns (id_col, chunk_idx, chunk_text, n_tokens).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(F.split(text_col, " "), lambda t: t != "")
    n = F.size(toks)
    # number of chunk starts: 1 + max(0, ceil((n - chunk_tokens)/stride))
    extra = F.greatest(
        F.ceil((n - chunk_tokens) / F.lit(stride)).cast("int"), F.lit(0))
    starts = F.sequence(F.lit(0), extra)
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            F.concat_ws(
                " ", F.slice(toks, i * stride + 1, chunk_tokens))
            .alias("chunk_text"),
            F.least(n - i * stride, F.lit(chunk_tokens)).cast("int")
            .alias("n_tokens")))
    exploded = docs.select(
        id_col, F.posexplode(chunks).alias("chunk_idx", "c"))
    return (exploded
            .where(F.col("c.n_tokens") >= min_tail_tokens)
            .select(id_col, F.col("chunk_idx").cast("int"),
                    F.col("c.chunk_text").alias("chunk_text"),
                    F.col("c.n_tokens").alias("n_tokens")))


def chunk_documents_subword(docs: DataFrame, *, chunk_tokens: int,
                            vocab: list[str], min_len: int = 2,
                            max_len: int = 6, text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Context-window splitting budgeted by SUBWORD cost (the round-4
    complement to :func:`chunk_documents`, which budgets whitespace
    tokens): each word is weighted by its greedy longest-match subword
    count (``textstats.subword_word_counter`` — pure codegen), and a
    word joins chunk ``floor(exclusive-prefix-subwords / chunk_tokens)``
    — the same prefix-sum fill rule as :func:`pack_shards`, at word
    granularity, so chunks never split a word and fill ~chunk_tokens
    subwords (one oversized word still gets placed, never dropped).

    Plan: posexplode words (narrow) → per-doc ordered window prefix sum
    (ONE hash shuffle on the doc key — the same key the extraction
    pipeline already partitions by) → groupBy (doc, chunk) rebuilding
    text with an array_sort over (pos, word) structs, which shares the
    window's partitioning so the agg adds no further Exchange at
    runtime.  Returns (id_col, chunk_idx, chunk_text, n_subword_tokens).
    """
    from html_qt_spark.operators.textstats import subword_word_counter

    counter = subword_word_counter(vocab, min_len=min_len,
                                   max_len=max_len)
    words = docs.select(
        id_col,
        F.posexplode(F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
            lambda t: t != "")).alias("pos", "w"))
    weighted = words.withColumn("wtok", counter(F.col("w")))
    win = (Window.partitionBy(id_col).orderBy("pos")
           .rowsBetween(Window.unboundedPreceding, -1))
    chunked = weighted.withColumn(
        "chunk_idx",
        (F.coalesce(F.sum("wtok").over(win), F.lit(0))
         / F.lit(chunk_tokens)).cast("long"))
    return (chunked
            .groupBy(id_col, "chunk_idx")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "w")))
                 .alias("pw"),
                 F.sum("wtok").cast("long").alias("n_subword_tokens"))
            .select(id_col, F.col("chunk_idx").cast("int"),
                    F.concat_ws(
                        " ", F.transform("pw", lambda s: s["w"]))
                    .alias("chunk_text"),
                    "n_subword_tokens"))


def shard_manifest(packed: DataFrame, *, tokens_col: str = "n_tokens",
                   id_col: str = "doc_id",
                   partition_cols: list[str] | None = None) -> DataFrame:
    """Per-shard manifest for the trainer dataloader: the documents a
    shard holds IN PACK ORDER plus their exclusive token offsets — the
    metadata a sequence-packing reader needs to rebuild document
    boundaries (attention-mask resets) without re-scanning text.

    One groupBy on the shard key (same partitioning the pack's window
    already established); in-shard order is ``id_col`` ascending —
    identical to :func:`pack_shards`'s fill order, so offsets line up
    with the prefix sums that assigned the shards.  The offsets array
    builds in one fold over the (small) per-shard doc list.
    Returns (partition_cols..., shard_id, n_docs, total_tokens,
    doc_ids, offsets).
    """
    keys = list(partition_cols or []) + ["shard_id"]
    dt = F.array_sort(F.collect_list(F.struct(id_col, tokens_col)))
    offs = F.aggregate(
        F.transform("dt", lambda s: s[tokens_col].cast("long")),
        F.struct(F.lit(0).cast("long").alias("acc"),
                 F.array().cast("array<bigint>").alias("o")),
        lambda st, t: F.struct(
            (st["acc"] + t).alias("acc"),
            F.concat(st["o"], F.array(st["acc"])).alias("o")),
        lambda st: st["o"])
    return (packed
            .groupBy(*keys)
            .agg(dt.alias("dt"),
                 F.sum(tokens_col).cast("long").alias("total_tokens"))
            .select(*keys,
                    F.size("dt").alias("n_docs"),
                    "total_tokens",
                    F.transform("dt", lambda s: s[id_col])
                    .alias("doc_ids"),
                    offs.alias("offsets")))


def shard_manifest_rows(packed: DataFrame, *,
                        tokens_col: str = "n_tokens",
                        id_col: str = "doc_id",
                        partition_cols: list[str] | None = None
                        ) -> DataFrame:
    """:func:`shard_manifest` exploded to one scalar row per packed
    document: (partition_cols..., shard_id, pack_pos, doc_id, n_tokens,
    token_offset).  pack_pos is the document's 0-based position in its
    shard's fill order (``id_col`` ascending — identical to
    :func:`pack_shards`); token_offset is the exclusive prefix sum of
    tokens before it in the shard, so a sequence-packing reader can
    rebuild document boundaries without re-scanning text.

    Same single hash Exchange on the shard key as the array-valued
    manifest, but via two window functions over one sort instead of a
    collect_list + fold — no array columns anywhere, so downstream
    sorts/compares (including the driver's pandas canonicalizer, which
    cannot hash list cells) handle it natively.  The array-valued
    :func:`shard_manifest` remains the dataloader-facing API.
    """
    keys = list(partition_cols or []) + ["shard_id"]
    w_ord = Window.partitionBy(*keys).orderBy(id_col)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    return (packed
            .withColumn("pack_pos",
                        (F.row_number().over(w_ord) - 1).cast("int"))
            .withColumn("token_offset",
                        F.coalesce(F.sum(tokens_col).over(w_cum),
                                   F.lit(0)).cast("long"))
            .select(*keys, "pack_pos", id_col,
                    F.col(tokens_col).cast("long").alias("n_tokens"),
                    "token_offset"))


def _hashed_bigram_buckets(docs: DataFrame, *, buckets: int,
                           text_col: str, id_col: str,
                           hash_fn: str) -> DataFrame:
    """(id_col, b): one row per word-bigram OCCURRENCE, hashed into
    ``buckets`` feature buckets.  Shuffle-free per doc: the bigram list
    is arrays_zip of the token array against its own shifted slice."""
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda t: t != "")
    n = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))))
    g = F.concat_ws(" ", F.col("p.0"), F.col("p.1"))
    if hash_fn == "md5_32":
        h = F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
    else:
        h = F.xxhash64(g)
    return (docs
            .where(n >= 2)
            .select(id_col, F.explode(pairs).alias("p"))
            .select(id_col, F.pmod(h, F.lit(buckets)).alias("b")))


def dsir_logweights(docs: DataFrame, target: DataFrame, *,
                    buckets: int = 1024, alpha: float = 1.0,
                    text_col: str = "text", id_col: str = "doc_id",
                    hash_fn: str = "xxhash64") -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al., NeurIPS
    2023): score every raw document by how much more likely its hashed
    n-gram features are under a TARGET corpus (the high-quality domain
    you want more of) than under the raw corpus itself —
    log w(d) = Σ_g [ln p_target(g) − ln p_raw(g)] over the document's
    hashed word-bigram occurrences, add-``alpha`` smoothed over the
    ``buckets``-bucket feature space.  Sampling ∝ exp(log w) then
    reshapes the raw corpus toward the target distribution.

    Plan at 10^12 docs: two Zipf-free aggregations of the hashed gram
    stream (the count tables are at most ``buckets`` rows — constant,
    broadcastable by construction), one broadcast join back to the
    per-doc gram stream, one doc-keyed groupBy.  No corpus-sized
    shuffle beyond the gram groupBy; nothing quadratic.

    Returns (id_col, n_grams, logw_x1000) for EVERY raw document —
    logw_x1000 = floor(round(Σ, 6)·1000) (the drift-absorbing
    integerization the other scored operators use); NULL when the doc
    has no bigrams.
    """
    raw_g = _hashed_bigram_buckets(docs, buckets=buckets,
                                   text_col=text_col, id_col=id_col,
                                   hash_fn=hash_fn)
    tgt_g = _hashed_bigram_buckets(target, buckets=buckets,
                                   text_col=text_col, id_col=id_col,
                                   hash_fn=hash_fn)
    # ONE aggregation pass per gram stream: the <=buckets-row count
    # tables are collected (bounded, index-sized) and totals derived
    # from them — running separate .count() actions over the
    # corpus-sized gram streams would cost two whole extra scans
    raw_rows = raw_g.groupBy("b").agg(F.count("*").alias("rc")).collect()
    tgt_rows = tgt_g.groupBy("b").agg(F.count("*").alias("tc")).collect()
    raw_n = sum(r.rc for r in raw_rows)
    tgt_n = sum(r.tc for r in tgt_rows)
    import math

    tgt_by_b = {r.b: r.tc for r in tgt_rows}
    w_rows = [
        (r.b,
         math.log((tgt_by_b.get(r.b, 0) + alpha)
                  / (tgt_n + alpha * buckets))
         - math.log((r.rc + alpha) / (raw_n + alpha * buckets)))
        for r in raw_rows
    ]
    w = docs.sparkSession.createDataFrame(w_rows, ["b", "lw"]) \
        if w_rows else docs.sparkSession.createDataFrame(
            [], "b long, lw double")
    s = (raw_g.join(F.broadcast(w), "b")
         .groupBy(id_col)
         .agg(F.count("*").alias("n_grams"),
              F.sum("lw").alias("lw")))
    return (docs.select(id_col).join(s, id_col, "left")
            .select(id_col,
                    F.coalesce("n_grams", F.lit(0)).cast("long")
                    .alias("n_grams"),
                    F.when(F.col("n_grams") > 0,
                           F.floor(F.round("lw", 6) * 1000)
                           .cast("long")).alias("logw_x1000")))


def perplexity_buckets(docs: DataFrame, *, n_buckets: int = 3,
                       group_col: str = "lang") -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): rank
    documents by their LM score WITHIN each language and split into
    equal-count buckets — bucket 1 is the most-predictable "head" the
    pipeline keeps, the last bucket the noisy "tail" it drops or
    down-samples.  The LM is the corpus-trained bigram model
    (:func:`textstats.bigram_logprob` — the engine's KenLM stand-in).

    One window over (group_col) ordered by (score, doc_id) — ties
    broken deterministically so the split is engine-portable.  Docs
    with fewer than 2 tokens have no bigram score and are omitted,
    matching the scorer.  Returns (doc_id, group_col, n_bigrams,
    logprob_x1000, ppl_bucket).
    """
    from html_qt_spark.operators.textstats import bigram_logprob

    scored = bigram_logprob(docs).join(
        docs.select("doc_id", group_col), "doc_id")
    w = Window.partitionBy(group_col).orderBy("logprob_x1000", "doc_id")
    return scored.select(
        "doc_id", group_col, "n_bigrams", "logprob_x1000",
        F.ntile(n_buckets).over(w).cast("int").alias("ppl_bucket"))


def hash_split(docs: DataFrame, *,
               fractions: dict[str, float] | None = None,
               salt: str = "split0", id_col: str = "doc_id",
               hash_fn: str = "xxhash64") -> DataFrame:
    """Deterministic train/val/test assignment keyed on the document
    id — the split every pipeline needs to be REPRODUCIBLE and
    leak-free: a document's split never changes when the corpus grows,
    is re-partitioned, or is re-processed on a different cluster,
    because it depends only on (salt, id), never on row order or RNG
    state (`randomSplit` guarantees neither across re-runs).

    ``fractions`` maps split name -> fraction (must sum to <= 1; any
    remainder falls into the last split).  One narrow projection — no
    shuffle, no sort.  Returns input id column + split:string.
    """
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    m = 1_000_000
    h = _id_hash(id_col, salt, hash_fn) % m
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        # round, not truncate: int(0.29*1e6) is 289999 under binary
        # float, silently moving the boundary bucket
        cond = h < round(acc * m)
        expr = F.when(cond, name) if expr is None else \
            expr.when(cond, name)
    last = F.lit(names[-1]) if expr is None else \
        expr.otherwise(names[-1])
    return docs.select(id_col, last.alias("split"))
