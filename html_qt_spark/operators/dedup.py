"""Deduplication operators for large-scale training-data pipelines.

Exact and near-duplicate detection over the ``documents`` table, all
expressed as DataFrame plans (shuffle-aware, no driver loops):

- exact: hash-groupBy on md5(text) — one shuffle, map-side partial agg.
- minhash: k independent signatures via min(md5(seed || token)) — explode
  + 2-level agg; signatures are deterministic and DuckDB-reproducible.
- minhash LSH bands: group signature vector into bands, bucket-join docs
  sharing a band hash — the scale path (candidate pairs without O(n²)).
- simhash: 64-bit weighted-bit fingerprint via xxhash64, pure JVM-side
  (no Python), hamming-distance candidates by band equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.spread import spread_input


def exact_dedup(docs: DataFrame) -> DataFrame:
    """md5-fingerprint groups: (fp, dup_count, keep_id).

    At 10^12 docs this is one hash-shuffle on a 128-bit key with map-side
    combine; output is the dedup decision table (keep_id survives).
    """
    return (
        docs.groupBy(F.md5("text").alias("fp"))
        .agg(F.count("*").alias("dup_count"),
             F.min("doc_id").alias("keep_id"))
    )


def _tokens(docs: DataFrame) -> DataFrame:
    return spread_input(docs, "doc_id").select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")


def _token_arrays(docs: DataFrame) -> DataFrame:
    """(doc_id, ts: array<string>) — spread + split + empty-filter, the
    shared tokenization both MinHash families build shingles from."""
    return spread_input(docs, "doc_id").select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: t != "").alias("ts"),
    )


def shingles(docs: DataFrame, *, n: int = 3) -> DataFrame:
    """(doc_id, shingle) word n-gram shingles, JVM-side.

    Built without a window: slice the token array to the first len-n+1
    positions, transform each position into the joined n-gram.  Unigram
    shingles are useless for near-dup detection on corpora with a shared
    vocabulary (every doc collides); n>=3 keeps LSH candidate sets sparse.
    Docs with fewer than n tokens emit no shingles.
    """
    toks = _token_arrays(docs)
    return toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.slice("ts", 1, F.greatest(F.size("ts") - (n - 1), F.lit(0))),
                lambda _x, i: F.concat_ws(" ", F.slice("ts", i + 1, n)),
            )
        ).alias("shingle"),
    )


def minhash_signatures(docs: DataFrame, *, num_hashes: int = 8,
                       shingle_n: int = 3,
                       hash_fn: str = "xxhash64") -> DataFrame:
    """(doc_id, sig_0..sig_{k-1}) MinHash over word n-gram shingles.

    Hash families (the same dual-family pattern as :func:`simhash` /
    ``similarity.srp_buckets``): "xxhash64" (default) keeps the k
    per-shingle hashes native 64-bit JVM ops — no hex-string
    allocation, ~an order of magnitude cheaper per shingle, the family
    a production run wants; "md5" computes md5(seed || shingle) hex
    strings — deterministic AND engine-portable, the family the DuckDB
    oracle queries pin.  Both are valid MinHash families (identical
    docs get identical signatures; collision behavior is equivalent),
    so every downstream semantic (LSH banding, components, first-wins)
    is family-agnostic.  Explode + groupBy is one shuffle; the k mins
    fold in a single aggregation pass (min over the multiset equals
    min over the set, so no distinct needed).
    """
    if hash_fn == "md5":
        sh = shingles(docs, n=shingle_n)
        aggs = [
            F.min(F.md5(F.concat(F.lit(str(j) + ":"),
                                 F.col("shingle"))))
            .alias(f"sig_{j}")
            for j in range(num_hashes)
        ]
        return sh.groupBy("doc_id").agg(*aggs)
    # xxhash64 family: hash each TOKEN once, then fold each shingle's n
    # consecutive token hashes with one fixed-width xxhash64 (3 longs =
    # 24 bytes) — no per-shingle array slice is ever allocated and no
    # token byte is hashed more than once (measured 3.3x vs hashing a
    # sliced token array per shingle: the higher-order slice allocated
    # 2.4M arrays and re-hashed every token's bytes n times at sf_x10).
    # The k signature values then derive from the 64-bit shingle digest
    # (`xxhash64(j, h0)` — 12 bytes per derivation).  Classic
    # one-hash + k-derived-permutations MinHash; the family changes, the
    # MinHash semantics (identical docs -> identical signatures,
    # per-hash minima over the shingle set) do not —
    # tests/test_minhash_family.py pins the family-invariant properties
    # against the md5 oracle family.
    n = shingle_n
    toks = _token_arrays(docs)
    hashed = toks.withColumn(
        "ht", F.transform("ts", lambda t: F.xxhash64(t))
    ).select(
        "doc_id",
        F.explode(
            F.transform(
                F.slice("ts", 1, F.greatest(F.size("ts") - (n - 1), F.lit(0))),
                lambda _x, i: F.xxhash64(
                    *[F.element_at("ht", i + 1 + d) for d in range(n)]),
            )
        ).alias("h0"),
    )
    aggs = [
        F.min(F.xxhash64(F.lit(j), F.col("h0"))).alias(f"sig_{j}")
        for j in range(num_hashes)
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(docs: DataFrame, *, num_hashes: int = 16,
                      bands: int = 4,
                      max_docs_per_bucket: int = 1000,
                      hash_fn: str = "xxhash64") -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH.

    Signature split into ``bands`` bands of ``num_hashes/bands`` rows;
    docs sharing any band-hash are candidates.  Self-join happens on the
    band bucket (small, high-selectivity keys) — never on the full corpus.

    Hot-bucket cap: a degenerate band value (e.g. millions of boilerplate
    or near-empty docs sharing one bucket) makes the self-join quadratic
    in that bucket, so buckets holding more than ``max_docs_per_bucket``
    docs are excluded from the join (same prune as
    :func:`ngram_jaccard_pairs`'s ``max_pairs_per_shingle``).  They are
    NOT dropped: an over-cap bucket instead emits STAR pairs
    (bucket-min doc_id → every other member) at linear cost, so the
    near-dup cluster still forms — connected components collapses the
    star into one component exactly as it would the quadratic pair set,
    since every member is reachable through the hub.  The star hub is
    ``min(doc_id)`` per (band, bucket), computed in the SAME window pass
    as the cap count (no extra shuffle); a mega-bucket of size m costs
    m-1 pairs instead of C(m,2).  Singleton buckets are pruned in the
    same pass.  Returns (doc_a, doc_b) with doc_a < doc_b, distinct.
    """
    sig = minhash_signatures(docs, num_hashes=num_hashes,
                             hash_fn=hash_fn)
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [f"sig_{b * rows_per_band + r}" for r in range(rows_per_band)]
        if hash_fn == "md5":
            bucket = F.md5(F.concat_ws("|", *cols))
        else:
            # native 64-bit band hash over the numeric sigs — no string
            bucket = F.xxhash64(*cols).cast("string")
        band_cols.append(
            F.struct(F.lit(b).alias("band"), bucket.alias("bucket"))
        )
    buckets = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")
    # cap via a count window over (band, bucket): ONE shuffle of the
    # bucket table instead of two (count agg + semi-join back), and the
    # self-join below reuses the same hashpartitioning so it adds no
    # further Exchange.  A degenerate bucket's rows land in one window
    # partition, which is exactly the same placement the join shuffle
    # would produce — no new skew exposure, and the cap then drops it.
    w_bucket = Window.partitionBy("band", "bucket")
    annotated = (buckets
                 .withColumn("_n", F.count("*").over(w_bucket))
                 .withColumn("_hub", F.min("doc_id").over(w_bucket)))
    # The star path costs NO extra plan branch: restrict the LEFT side
    # of the self-join to under-cap members plus mega-bucket hubs.  For
    # a normal bucket both sides hold every member -> full pair set;
    # for a mega bucket the left side holds only the hub, so the join
    # emits exactly the m-1 star pairs (doc_a < doc_b holds because the
    # hub is the bucket min).  Same two filtered reads of one window
    # output, same single bucket-table shuffle as the plain cap.
    left = (annotated
            .where((F.col("_n") >= 2)
                   & ((F.col("_n") <= max_docs_per_bucket)
                      | (F.col("doc_id") == F.col("_hub"))))
            .drop("_n", "_hub"))
    right = annotated.where(F.col("_n") >= 2).drop("_n", "_hub")
    a = left.alias("a")
    b = right.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash(docs: DataFrame, *, bits: int = 64,
            hash_fn: str = "xxhash64") -> DataFrame:
    """SimHash fingerprint, fully JVM-side (token hash + bit ops).

    Classic Charikar sketch: sum ±1 per bit over token hashes, sign →
    fingerprint bit.  Everything stays in whole-stage codegen: explode,
    bitwise ops, groupBy — no Python worker round-trip.
    Returns (doc_id, simhash:long).

    ``hash_fn``: "xxhash64" (default, 64 usable bits) or "md5_32" — a
    32-bit md5-prefix hash reproducible in any SQL engine (pass bits<=32
    with it; used for the exact DuckDB oracle).
    """
    if hash_fn == "md5_32":
        tok_hash = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10) \
            .cast("long")
    else:
        tok_hash = F.xxhash64("tok")
    toks = _tokens(docs).withColumn("h", tok_hash)
    per_bit = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1,
                   F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*per_bit)
    fp = F.lit(0).cast("long")
    for i in range(bits):
        fp = fp + F.when(F.col(f"b{i}") > 0,
                         F.shiftleft(F.lit(1).cast("long"), i)
                         ).otherwise(F.lit(0).cast("long"))
    return agg.select("doc_id", fp.alias("simhash"))


def ngram_jaccard_pairs(docs: DataFrame, *, n: int = 3,
                        min_jaccard: float = 0.5,
                        max_pairs_per_shingle: int = 1000) -> DataFrame:
    """Exact n-gram Jaccard over shingle sets, candidate-pruned.

    Shingles built with a window-free trick: posexplode tokens, self-align
    by (doc_id, pos) using concat of leads via collect over a small array —
    here done with F.transform over a sliced token array (JVM-side).
    Candidates = docs sharing a shingle (grouped, capped against
    mega-buckets); exact Jaccard computed from shingle-set sizes:
    J = |A∩B| / (|A| + |B| - |A∩B|).
    Returns (doc_a, doc_b, jaccard double).
    """
    shingled = shingles(docs, n=n).distinct()
    sizes = shingled.groupBy("doc_id").agg(F.count("*").alias("sz"))
    # prune shingles shared by too many docs (stopword-like n-grams):
    # they explode the pair count quadratically at scale
    freq = shingled.groupBy("shingle").agg(F.count("*").alias("df"))
    pruned = shingled.join(
        freq.where(F.col("df").between(2, max_pairs_per_shingle)),
        "shingle")
    a = pruned.alias("a")
    b = pruned.alias("b")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    # NOTE: `sizes` has one row per document — corpus-sized, so it must
    # NOT be broadcast (a forced broadcast here is a driver/executor OOM
    # at 10^12 docs).  Plain joins let AQE pick broadcast only when the
    # post-prune side genuinely fits.
    return (
        inter.join(sizes.alias("sa"),
                   F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"),
              F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a", "doc_b",
            (F.col("n_common") /
             (F.col("sa.sz") + F.col("sb.sz") - F.col("n_common"))
             ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )


def paragraph_dedup(docs: DataFrame, *, sep_rx: str = r"\n{2,}",
                    join_sep: str = "\n\n", text_col: str = "text",
                    id_col: str = "doc_id",
                    min_para_chars: int = 1) -> DataFrame:
    """Corpus-level EXACT paragraph dedup (CCNet / RefinedWeb style):
    split each document on paragraph boundaries, keep only the globally
    FIRST occurrence of every distinct paragraph (ordered by
    (doc_id, para_idx)), and re-assemble each document from its
    surviving paragraphs.  Boilerplate-heavy crawls (shared footers,
    cookie banners, navigation text that survived extraction) dedup at
    paragraph granularity where document-level hashing sees every page
    as unique.

    Plan shape at 10^12 docs: explode (narrow) → one shuffle keyed on
    md5(paragraph) for the first-wins window → one groupBy(doc_id) to
    reassemble → a doc-keyed join for the totals.  All JVM-side
    (split/posexplode/md5/window), no Python workers.

    Returns (id_col, clean_text, n_paras, n_kept, n_dropped) — one row
    per document that had at least one non-empty paragraph; documents
    whose every paragraph was a duplicate come back with clean_text=''.
    """
    paras = (docs.select(
                id_col,
                F.posexplode(F.split(text_col, sep_rx))
                .alias("para_idx", "para"))
             .where(F.length("para") >= min_para_chars))
    w = Window.partitionBy(F.md5("para")).orderBy(id_col, "para_idx")
    kept = (paras.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1))
    kept_agg = (kept.groupBy(id_col)
                .agg(F.concat_ws(
                        join_sep,
                        F.sort_array(
                            F.collect_list(F.struct("para_idx", "para")))
                        .getField("para")).alias("clean_text"),
                     F.count("*").alias("n_kept")))
    totals = paras.groupBy(id_col).agg(F.count("*").alias("n_paras"))
    return (totals.join(kept_agg, id_col, "left")
            .select(id_col,
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    F.col("n_paras"),
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                    (F.col("n_paras")
                     - F.coalesce("n_kept", F.lit(0))).alias("n_dropped")))


def paragraph_filter_common(docs: DataFrame, *, max_doc_freq: int = 2,
                            sep_rx: str = r"\n{2,}",
                            join_sep: str = "\n\n",
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            min_para_chars: int = 1) -> DataFrame:
    """Drop paragraphs that occur in ``max_doc_freq``-or-more DISTINCT
    documents — CCNet's actual boilerplate rule (commonness, not
    first-wins): a cookie banner on 10^6 pages is boilerplate everywhere
    including its first occurrence, which :func:`paragraph_dedup` would
    keep.  Within-document repeats of a non-common paragraph survive.

    Plan: explode → distinct-doc count per md5(para) (one keyed shuffle
    with partial agg) → anti-join-style filter → groupBy(doc_id)
    reassembly.  All JVM-side.

    Returns (id_col, clean_text, n_paras, n_kept, n_dropped), one row
    per document with >= 1 non-empty paragraph.
    """
    paras = (docs.select(
                id_col,
                F.posexplode(F.split(text_col, sep_rx))
                .alias("para_idx", "para"))
             .where(F.length("para") >= min_para_chars)
             .withColumn("_fp", F.md5("para")))
    common = (paras.groupBy("_fp")
              .agg(F.countDistinct(id_col).alias("_df"))
              .where(F.col("_df") >= max_doc_freq)
              .select("_fp"))
    kept = paras.join(common, "_fp", "left_anti")
    kept_agg = (kept.groupBy(id_col)
                .agg(F.concat_ws(
                        join_sep,
                        F.sort_array(
                            F.collect_list(F.struct("para_idx", "para")))
                        .getField("para")).alias("clean_text"),
                     F.count("*").alias("n_kept")))
    totals = paras.groupBy(id_col).agg(F.count("*").alias("n_paras"))
    return (totals.join(kept_agg, id_col, "left")
            .select(id_col,
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    F.col("n_paras"),
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                    (F.col("n_paras")
                     - F.coalesce("n_kept", F.lit(0))).alias("n_dropped")))


def connected_components(pairs: DataFrame, *, max_iter: int = 20
                         ) -> DataFrame:
    """(doc_a, doc_b) candidate-pair edges -> (doc_id, component_id):
    duplicate-cluster assignment, component_id = min doc_id reachable.

    Min-label propagation: every vertex repeatedly takes the minimum
    label among itself and its neighbors; one shuffle round (join +
    groupBy) per iteration, converging in O(component diameter) rounds.
    Near-duplicate components are dense near-cliques (every member
    collided with most others in some LSH band), so 2-3 rounds close
    them; ``max_iter`` bounds adversarial chain graphs.  The per-round
    driver-side convergence check is one count() — an iterative
    algorithm's control loop, not per-row driver work.  For graphs with
    genuinely large diameters swap in large-star/small-star
    (Kiveris et al., COSS 2014) — same join primitives.

    Output: one row per vertex that appears in any edge.  Downstream
    dedup keeps component_id == doc_id rows (the canonical member) and
    drops the rest.
    """
    fwd = pairs.select(F.col("doc_a").alias("src"),
                       F.col("doc_b").alias("dst"))
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"),
                   F.col("src").alias("dst"))).localCheckpoint()
    labels = (edges.select(F.col("src").alias("vid")).distinct()
              .withColumn("label", F.col("vid")).localCheckpoint())
    for _ in range(max_iter):
        nbr_min = (edges.join(labels, edges.dst == labels.vid)
                   .groupBy("src")
                   .agg(F.min("label").alias("nbr_label")))
        # localCheckpoint truncates lineage each round: the iterative
        # self-joins would otherwise trip ambiguous-column analysis AND
        # grow the plan exponentially with the iteration count
        new_labels = (
            labels.join(nbr_min, labels.vid == nbr_min.src, "left")
            .select(F.col("vid"),
                    F.least(F.col("label"),
                            F.coalesce("nbr_label", F.col("label")))
                    .alias("label"))).localCheckpoint()
        changed = (new_labels.withColumnRenamed("label", "new_label")
                   .join(labels, "vid")
                   .where(F.col("new_label") != F.col("label")).count())
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("vid").alias("doc_id"),
                         F.col("label").alias("component_id"))


def connected_components_star(pairs: DataFrame, *, max_iter: int = 40,
                              stats: dict | None = None) -> DataFrame:
    """Alternating large-star/small-star connected components
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014): O(log n) shuffle rounds even on adversarial
    high-diameter graphs — a crawl of paginated boilerplate forms
    near-dup CHAINS, where min-label propagation
    (:func:`connected_components`) needs O(diameter) rounds.

    - large-star(u): m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u),
      v > u.  Hooks every larger neighbor directly to the local min.
    - small-star(u): over the resulting parent edges (u > v), m =
      min(children ∪ {u}); emit (v, m) for the children and u itself.

    Both are one groupBy + one keyed join per application — the same
    shuffle primitives as the min-label loop, just log-round
    convergence.  Converged when an alternation leaves the edge set
    unchanged (two count()s per round — control-plane only).

    ``stats``: pass a dict to receive {"rounds": n} for convergence
    tests.  Output matches :func:`connected_components`:
    (doc_id, component_id) with component_id = min reachable id, one
    row per vertex appearing in any edge.
    """
    verts = (pairs.select(F.col("doc_a").alias("vid"))
             .union(pairs.select(F.col("doc_b").alias("vid")))
             .distinct().localCheckpoint())
    # parent-pointer form: every edge as (child=max, parent=min)
    edges = (pairs.select(
                F.greatest("doc_a", "doc_b").alias("u"),
                F.least("doc_a", "doc_b").alias("v"))
             .where(F.col("u") != F.col("v"))
             .distinct().localCheckpoint())

    def _large_star(e: DataFrame) -> DataFrame:
        nbrs = e.union(e.select(F.col("v").alias("u"),
                                F.col("u").alias("v")))
        mins = (nbrs.groupBy("u").agg(F.min("v").alias("_mv"))
                .select("u", F.least("_mv", "u").alias("m")))
        return (nbrs.join(mins, "u")
                .where(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .where(F.col("u") != F.col("v"))
                .distinct())

    def _small_star(e: DataFrame) -> DataFrame:
        # e is parent-pointer form (u > v): children of u are its v's
        mins = e.groupBy("u").agg(F.min("v").alias("m"))
        hooked = (e.join(mins, "u")
                  .select(F.col("v").alias("u"), F.col("m").alias("v"))
                  .union(mins.select("u", F.col("m").alias("v"))))
        return (hooked.where(F.col("u") != F.col("v")).distinct())

    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        nxt = _small_star(_large_star(edges)).localCheckpoint()
        # converged when the alternation is a no-op on the edge set
        same = (nxt.exceptAll(edges).count() == 0
                and edges.exceptAll(nxt).count() == 0)
        edges = nxt
        if same:
            break
    if stats is not None:
        stats["rounds"] = rounds
    # at convergence edges form stars: child -> component min.  A min()
    # guards the (theoretical) multi-parent leftover under max_iter cutoff.
    roots = edges.groupBy("u").agg(F.min("v").alias("component_id"))
    return (verts.join(roots, verts.vid == roots.u, "left")
            .select(F.col("vid").alias("doc_id"),
                    F.coalesce("component_id", F.col("vid"))
                    .alias("component_id")))


def _merge_hit_intervals(hits_arr, n: int):
    """Collapse a SORTED array of hit start positions into disjoint
    mask intervals [s, s+n) (overlapping/adjacent hits merge — all
    spans share length ``n``, so interval ends are monotone and a new
    hit either extends the last interval or opens a fresh one).
    Shared by the token- and char-level ExactSubstr maskers."""
    return F.aggregate(
        hits_arr,
        F.array().cast("array<struct<s:int,e:int>>"),
        lambda acc, h: F.when(
            (F.size(acc) > 0) & (h <= F.element_at(acc, -1)["e"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.struct(
                    F.element_at(acc, -1)["s"].alias("s"),
                    (h + n).cast("int").alias("e")))))
        .otherwise(F.concat(acc, F.array(F.struct(
            h.cast("int").alias("s"),
            (h + n).cast("int").alias("e"))))))


def mask_common_runs(docs: DataFrame, *, n: int = 10,
                     min_docs: int = 2,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact-substring dedup at token granularity (the Lee et al. 2022
    "Deduplicating Training Data" ExactSubstr shape, on token n-grams
    instead of suffix arrays): any run of ``n`` consecutive tokens that
    appears in >= ``min_docs`` DISTINCT documents is masked out of
    every document containing it — repeated licence blocks, navigation
    chrome, and quoted chain-letters vanish corpus-wide, including
    from the first document that carried them (unlike first-wins
    paragraph dedup, which keeps one copy).

    Plan: posexplode token n-grams (hashed md5 for engine-portable
    compare), count DISTINCT docs per gram (one shuffle on the
    Zipf-bounded gram table), join hits back (no forced broadcast —
    the dup-gram table can be large), collect hit START positions per
    doc (second doc-keyed shuffle), then rebuild each document row-
    locally: the sorted hit starts are first collapsed into DISJOINT
    mask intervals [h, h+n) (one linear fold over the hit array —
    overlapping/adjacent hits merge), then token i survives iff no
    interval contains it.  The per-token probe runs over the merged
    intervals, whose count is the number of distinct masked RUNS, not
    hits — a pathological doc that is ENTIRELY quoted material
    collapses to ONE interval and rebuilds in O(tokens), where probing
    the raw hit list would cost O(tokens·hits).
    Returns (id_col, clean_text, n_tokens_masked).
    """
    toks_arr = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda t: t != "")
    base = docs.select(id_col, toks_arr.alias("_ts"))
    sz = F.size("_ts")
    gram_structs = F.transform(
        F.sequence(F.lit(0),
                   F.greatest(sz - n, F.lit(-1))),
        lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.md5(F.concat_ws("\x00", F.slice("_ts", i + 1, n)))
            .alias("g")))
    grams = (base
             .where(sz >= n)
             .select(id_col, F.explode(gram_structs).alias("ps"))
             .select(id_col, F.col("ps.pos").alias("pos"),
                     F.col("ps.g").alias("g")))
    dup = (grams.groupBy("g")
           .agg(F.countDistinct(id_col).alias("_nd"))
           .where(F.col("_nd") >= min_docs)
           .select("g"))
    hits = (grams.join(dup, "g")
            .groupBy(id_col)
            .agg(F.array_sort(F.collect_list("pos")).alias("_hits")))
    joined = base.join(hits, id_col, "left")
    hits_arr = F.coalesce(F.col("_hits"),
                          F.array().cast("array<int>"))
    ivs = _merge_hit_intervals(hits_arr, n)
    keep = F.filter(
        F.transform("_ts",
                    lambda t, i: F.struct(t.alias("t"),
                                          i.cast("int").alias("i"))),
        lambda s: ~F.exists(ivs,
                            lambda iv: (iv["s"] <= s["i"])
                            & (s["i"] < iv["e"])))
    return joined.select(
        id_col,
        F.concat_ws(" ", F.transform(keep, lambda s: s["t"]))
        .alias("clean_text"),
        (F.size("_ts") - F.size(keep)).cast("long")
        .alias("n_tokens_masked"))


def mask_common_runs_chars(docs: DataFrame, *, n: int = 20,
                           min_docs: int = 2,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Exact-substring dedup at CHARACTER granularity — the closest
    shuffle-native approximation of Lee et al.'s byte-level suffix-array
    ExactSubstr (the token-level :func:`mask_common_runs` cannot catch
    duplicated material that crosses token boundaries differently, e.g.
    re-wrapped or re-punctuated quotes).  Any run of ``n`` consecutive
    characters appearing in >= ``min_docs`` distinct documents is cut
    from every document carrying it.

    Same plan shape as the token version: posexplode hashed char
    n-grams (md5 of the substring — engine-portable), count distinct
    docs per gram, join hits back, collect + interval-merge hit starts
    per doc.  The rebuild is O(kept-runs), not O(chars): the merged
    mask intervals are complemented into keep segments and the clean
    text is the concat of ``substring`` slices — no per-character
    work, so a 1 MB document costs a handful of slice copies.
    Returns (id_col, clean_text, n_chars_masked).
    """
    tx = F.coalesce(F.col(text_col), F.lit(""))
    base = docs.select(id_col, tx.alias("_tx"))
    ln = F.length("_tx")
    gram_structs = F.transform(
        F.sequence(F.lit(0), ln - n),
        lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.md5(F.col("_tx").substr(i + 1, F.lit(n))).alias("g")))
    grams = (base
             .where(ln >= n)
             .select(id_col, F.explode(gram_structs).alias("ps"))
             .select(id_col, F.col("ps.pos").alias("pos"),
                     F.col("ps.g").alias("g")))
    dup = (grams.groupBy("g")
           .agg(F.countDistinct(id_col).alias("_nd"))
           .where(F.col("_nd") >= min_docs)
           .select("g"))
    hits = (grams.join(dup, "g")
            .groupBy(id_col)
            .agg(F.array_sort(F.collect_list("pos")).alias("_hits")))
    joined = base.join(hits, id_col, "left")
    hits_arr = F.coalesce(F.col("_hits"),
                          F.array().cast("array<int>"))
    ivs = _merge_hit_intervals(hits_arr, n)
    # complement into keep segments [prev_end, s) + tail [last_end, len)
    segs = F.aggregate(
        ivs,
        F.struct(F.lit(0).cast("int").alias("prev"),
                 F.array().cast("array<struct<s:int,e:int>>")
                 .alias("ks")),
        lambda acc, iv: F.struct(
            iv["e"].alias("prev"),
            F.concat(acc["ks"], F.array(F.struct(
                acc["prev"].alias("s"), iv["s"].alias("e"))))
            .alias("ks")),
        lambda acc: F.filter(
            F.concat(acc["ks"], F.array(F.struct(
                acc["prev"].alias("s"), ln.cast("int").alias("e")))),
            lambda seg: seg["e"] > seg["s"]))
    clean = F.concat_ws(
        "", F.transform(segs, lambda seg: F.col("_tx").substr(
            seg["s"] + 1, seg["e"] - seg["s"])))
    kept = F.aggregate(
        segs, F.lit(0).cast("long"),
        lambda acc, seg: acc + (seg["e"] - seg["s"]).cast("long"))
    return joined.select(
        id_col,
        clean.alias("clean_text"),
        (ln.cast("long") - kept).alias("n_chars_masked"))
