"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship extraction; ``queries()`` exposes
one entry per implemented operator (SURVEY.md §2 inventory + the
training-data ops); ``oracle_sql()`` gives DuckDB-runnable equivalents for
every SQL-expressible stage.  The interleaved input table is synthesized
deterministically from documents.parquet by ONE shared SQL text
(html_qt_spark.sources.interleaved.INTERLEAVED_SPANS_SQL) that runs
unchanged in both engines — that is what makes the oracles exact.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from html_qt_spark.sources.interleaved import (
    INTERLEAVED_SPANS_SQL,
    interleaved_exploded,
    interleaved_nested,
    oracle_cte,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# --------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interleaved docs → boilerplate-stripped ordered spans."""
    from html_qt_spark.operators.extract import extract_spans_doc

    nested = interleaved_nested(spark, "/root/testdata/sf0.001")
    return extract_spans_doc(nested)


# ------------------------------------------------------------- queries

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from html_qt_spark.operators import dedup, multimodal, similarity, textstats
    from html_qt_spark.operators.extract import (
        extract_spans_doc,
        extract_spans_exploded,
    )

    def q_explode_spans(spark, sf):
        return interleaved_exploded(spark, sf)

    def q_media_filter(spark, sf):
        return (interleaved_exploded(spark, sf)
                .where(F.col("kind") == "media")
                .select("doc_id", "offset", "media_ref"))

    def q_span_stats(spark, sf):
        return (interleaved_exploded(spark, sf)
                .groupBy("doc_id")
                .agg(F.count("*").alias("n_spans"),
                     F.sum(F.when(F.col("kind") == "text", 1).otherwise(0))
                     .cast("long").alias("n_text"),
                     F.sum(F.when(F.col("kind") == "media", 1).otherwise(0))
                     .cast("long").alias("n_media"),
                     F.sum(F.coalesce(F.length("text"), F.lit(0)))
                     .cast("long").alias("sum_chars")))

    def q_span_order(spark, sf):
        w = Window.partitionBy("doc_id").orderBy("offset")
        return (interleaved_exploded(spark, sf)
                .select("doc_id", "offset", "kind",
                        F.row_number().over(w).cast("long")
                        .alias("span_rank")))

    def q_media_join(spark, sf):
        manifest = spark.createDataFrame(
            [("img", "image"), ("vid", "video"), ("aud", "audio")],
            ["scheme", "media_type"])
        media = (interleaved_exploded(spark, sf)
                 .where(F.col("kind") == "media")
                 .withColumn("scheme", F.substring("media_ref", 1, 3)))
        return (media.join(F.broadcast(manifest), "scheme", "left")
                .select("doc_id", "media_ref", "media_type"))

    def q_metrics_rollup(spark, sf):
        return (interleaved_exploded(spark, sf)
                .rollup("kind")
                .agg(F.count("*").alias("n_spans"),
                     F.sum(F.coalesce(F.length("text"), F.lit(0)))
                     .cast("long").alias("sum_chars")))

    def q_exact_dedup(spark, sf):
        return dedup.exact_dedup(_docs(spark, sf))

    def q_minhash_signatures(spark, sf):
        # oracle pins the engine-portable md5 family (production
        # default is the native xxhash64 family; same pattern as simhash)
        return dedup.minhash_signatures(_docs(spark, sf), num_hashes=8,
                                        hash_fn="md5")

    def q_token_count(spark, sf):
        return textstats.token_count(_docs(spark, sf))

    def q_quality_score(spark, sf):
        return textstats.quality_score(_docs(spark, sf))

    def q_lang_id(spark, sf):
        return textstats.lang_id(_docs(spark, sf))

    def q_fingerprint(spark, sf):
        return textstats.fingerprint(_docs(spark, sf)).select("doc_id", "fp8")

    def q_lang_dist(spark, sf):
        return (_docs(spark, sf).groupBy("lang")
                .agg(F.count("*").alias("n_docs"),
                     F.sum("n_chars").cast("long").alias("sum_chars")))

    def q_pricing_summary(spark, sf):
        # TPC-H Q1 shape: scan + filter + hash agg with partial combine
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        return (li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
                .groupBy("l_returnflag", "l_linestatus")
                .agg(F.floor(F.sum("l_quantity")).cast("long").alias("sum_qty"),
                     F.floor(F.sum("l_extendedprice")).cast("long")
                     .alias("sum_base_price"),
                     F.floor(F.sum(F.col("l_extendedprice")
                                   * (1 - F.col("l_discount"))))
                     .cast("long").alias("sum_disc_price"),
                     F.count("*").alias("count_order")))

    def q_top_customers(spark, sf):
        # join + agg + top-k (broadcast dim, TakeOrdered)
        cust = spark.read.parquet(f"{sf}/customer.parquet")
        orders = spark.read.parquet(f"{sf}/orders.parquet")
        return (orders.join(F.broadcast(cust),
                            orders.o_custkey == cust.c_custkey)
                .groupBy("c_custkey", "c_name")
                .agg(F.floor(F.sum("o_totalprice")).cast("long")
                     .alias("revenue"),
                     F.count("*").alias("n_orders"))
                .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
                .limit(10))

    def q_region_nation_rollup(spark, sf):
        # 3-way join + rollup over the region/nation dims
        region = spark.read.parquet(f"{sf}/region.parquet")
        nation = spark.read.parquet(f"{sf}/nation.parquet")
        supplier = spark.read.parquet(f"{sf}/supplier.parquet")
        return (supplier
                .join(F.broadcast(nation),
                      supplier.s_nationkey == nation.n_nationkey)
                .join(F.broadcast(region),
                      nation.n_regionkey == region.r_regionkey)
                .rollup("r_name", "n_name")
                .agg(F.count("*").alias("n_suppliers"),
                     F.floor(F.sum("s_acctbal")).cast("long")
                     .alias("sum_acctbal")))

    def q_event_sessions(spark, sf):
        # gap-based sessionization (30-min inactivity): lag + running sum
        ev = spark.read.parquet(f"{sf}/events.parquet")
        w = Window.partitionBy("user_id").orderBy("ts")
        gaps = ev.select(
            "user_id", "ts", "value",
            F.when(
                (F.unix_timestamp("ts")
                 - F.unix_timestamp(F.lag("ts").over(w))) > 1800, 1
            ).otherwise(0).alias("new_sess"))
        sess = gaps.withColumn(
            "session_id",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
        return (sess.groupBy("user_id", "session_id")
                .agg(F.count("*").alias("n_events"),
                     F.floor(F.sum("value")).cast("long").alias("sum_value")))

    def q_event_windows(spark, sf):
        # tumbling 1-hour windows: epoch-bucketed (portable across engines)
        ev = spark.read.parquet(f"{sf}/events.parquet")
        return (ev.groupBy(
                    F.floor(F.unix_timestamp("ts") / 3600).cast("long")
                    .alias("hour_bucket"),
                    "event_type")
                .agg(F.count("*").alias("n_events"),
                     F.floor(F.sum("value")).cast("long").alias("sum_value")))

    def q_asof_join(spark, sf):
        # kdb/pandas-merge_asof semantics via union + ordered window
        # (ONE shuffle); oracle = DuckDB's native ASOF LEFT JOIN
        from html_qt_spark.operators.timeseries import asof_join
        ev = spark.read.parquet(f"{sf}/events.parquet")
        purchases = ev.where(F.col("event_type") == "purchase") \
            .select("event_id", "user_id", "ts", "value")
        views = ev.where(F.col("event_type") == "view") \
            .select("user_id", "ts", "value")
        j = asof_join(purchases, views, on="ts", by="user_id",
                      value_cols=["value"])
        return j.select(
            "event_id", "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            F.unix_micros(F.col("asof_ts").cast("timestamp"))
            .alias("asof_ts_us"),
            F.round("asof_value", 3).alias("asof_value3"))

    def q_range_join(spark, sf):
        # interval containment via bin-equi-join decomposition; the
        # oracle is the naive BETWEEN join (exact same pairs)
        from html_qt_spark.operators.timeseries import range_join_binned
        ev = spark.read.parquet(f"{sf}/events.parquet")
        pts = ev.select("event_id", "value",
                        F.unix_timestamp("ts").alias("ts_s"))
        ranges = (pts.select(
                      F.floor(F.col("ts_s") / 3600).alias("h"))
                  .distinct().where(F.col("h") % 5 == 0)
                  .select(F.col("h").alias("range_id"),
                          (F.col("h") * 3600).alias("range_start"),
                          (F.col("h") * 3600 + 7199).alias("range_end")))
        joined = range_join_binned(pts, ranges, point_col="ts_s",
                                   start_col="range_start",
                                   end_col="range_end", bin_width=3600)
        return (joined.groupBy("range_id")
                .agg(F.count("*").alias("n_events"),
                     F.floor(F.sum("value")).cast("long").alias("sum_v")))

    def q_cosine_topk(spark, sf):
        return similarity.cosine_topk(_emb(spark, sf), query_vec_id=0, k=10) \
            .select("vec_id", F.col("rank").cast("long").alias("rank"))

    def q_cosine_topk_batch(spark, sf):
        # k-NN join: top-10 per query over a 3-vector query set
        return (similarity.cosine_topk_batch(_emb(spark, sf),
                                             [0, 7, 42], k=10)
                .select("q_id", "vec_id",
                        F.col("rank").cast("long").alias("rank")))

    def q_regex_tokens(spark, sf):
        return textstats.regex_token_count(_docs(spark, sf))

    def q_cosine_dupes(spark, sf):
        # exact small-N mode so the DuckDB oracle is feasible; the SRP
        # bucketed scale path is q_cosine_dupes_lsh (rows-only)
        return (similarity.cosine_dup_pairs(
                    _emb(spark, sf), threshold=0.4, exact_below=300)
                .select("vec_a", "vec_b",
                        F.round("cos", 3).alias("cos3")))

    def q_cosine_dupes_lsh(spark, sf):
        # md5_32 hyperplanes = exact DuckDB oracle for the bucketed path
        # (xxhash64 is the production default; identical plan shape)
        return similarity.cosine_dup_pairs(
            _emb(spark, sf), threshold=0.35, n_planes=4, hash_fn="md5_32")

    def q_scrub_pii(spark, sf):
        return textstats.scrub_pii(_docs(spark, sf))

    def q_hash_sample(spark, sf):
        from html_qt_spark.operators.curation import hash_sample
        return (hash_sample(_docs(spark, sf), rate=0.25, salt="r2",
                            hash_fn="md5_32")
                .select("doc_id", "lang", "n_chars"))

    def q_pack_shards(spark, sf):
        from html_qt_spark.operators.curation import pack_shards
        from html_qt_spark.operators.textstats import token_count
        return pack_shards(token_count(_docs(spark, sf)),
                           token_budget=2000).select("doc_id", "n_tokens",
                                                     "shard_id")

    def q_kmv_distinct(spark, sf):
        # KMV distinct-count sketch per language (deterministic md5
        # family -> the ESTIMATE itself is exact-oracle-checkable,
        # unlike HLL's opaque binary sketch)
        from html_qt_spark.operators.sketches import kmv_distinct
        return kmv_distinct(_docs(spark, sf), col="text",
                            group_col="lang", k=16)

    def q_gopher_quality(spark, sf):
        return textstats.gopher_quality(_docs(spark, sf))

    def q_unigram_logprob(spark, sf):
        return textstats.unigram_logprob(_docs(spark, sf))

    def q_bigram_logprob(spark, sf):
        # corpus-trained bigram LM surprise (r4 — one order above the
        # unigram stand-in for the CCNet perplexity gate)
        return textstats.bigram_logprob(_docs(spark, sf))

    def q_decontaminate(spark, sf):
        # benchmark = every 50th doc (a synthesized "eval suite" that is
        # genuinely IN the corpus, the exact leakage scenario); the
        # benchmark shingle set is the one correctly-broadcast side
        from html_qt_spark.operators.curation import decontaminate
        docs = _docs(spark, sf)
        bench = docs.where(F.col("doc_id") % 50 == 0)
        return decontaminate(docs, bench, n=3)

    def q_cap_per_source(spark, sf):
        # per-domain cap with the skew-proof two-phase window (pre-cap
        # within (source, hash%4) provably preserves the global top-20)
        from html_qt_spark.operators.curation import cap_per_group
        return (cap_per_group(_docs(spark, sf), group_col="source",
                              max_per_group=20, salt="r3cap",
                              hash_fn="md5_32", pre_salt_buckets=4)
                .select("doc_id", "source"))

    def q_temperature_sample(spark, sf):
        # alpha=0.5 multilingual rebalancing; sqrt-rate path is
        # bit-reproducible cross-engine (correctly-rounded IEEE sqrt)
        from html_qt_spark.operators.curation import temperature_sample
        return (temperature_sample(_docs(spark, sf), group_col="lang",
                                   alpha=0.5, salt="r3temp",
                                   hash_fn="md5_32")
                .select("doc_id", "lang"))

    def q_repetition(spark, sf):
        return textstats.repetition_score(_docs(spark, sf))

    def q_entropy(spark, sf):
        return textstats.unigram_entropy(_docs(spark, sf))

    def q_json_meta(spark, sf):
        # JSON function surface: build (to_json) -> path-extract
        # (get_json_object) -> schema parse (from_json) roundtrip
        docs = _docs(spark, sf)
        j = docs.select(
            "doc_id",
            F.to_json(F.struct(
                "lang", F.col("n_chars").cast("long").alias("n"),
                "source")).alias("meta"))
        return j.select(
            "doc_id", "meta",
            F.get_json_object("meta", "$.lang").alias("lang_x"),
            F.from_json(
                "meta", "lang string, n long, source string").alias("s"),
        ).select("doc_id", "meta", "lang_x",
                 F.col("s.n").alias("n_x"),
                 F.col("s.source").alias("source_x"))

    def q_winnowing(spark, sf):
        # md5_32 hash family = exact DuckDB oracle; same plan shape as the
        # xxhash64 production default
        return textstats.winnowing_fingerprints(_docs(spark, sf),
                                                hash_fn="md5_32")

    def q_tfidf_top(spark, sf):
        return textstats.tfidf_top_terms(_docs(spark, sf), k=3)

    def q_length_percentiles(spark, sf):
        return textstats.length_percentiles(_docs(spark, sf))

    def q_para_filter_common(spark, sf):
        # commonness-based paragraph boilerplate drop (CCNet rule) over
        # the same synthesized tumbling-window paragraphs as para_dedup
        from html_qt_spark.operators.dedup import paragraph_filter_common
        toks = F.filter(F.split("text", " "), lambda t: t != "")
        n_last = F.greatest(
            F.floor((F.size(toks) - 1) / 10).cast("int"), F.lit(0))
        paras = _docs(spark, sf).select(
            "doc_id",
            F.concat_ws("\n\n", F.transform(
                F.sequence(F.lit(0), n_last),
                lambda i: F.concat_ws(" ", F.slice(toks, i * 10 + 1, 10)))
            ).alias("text"))
        out = paragraph_filter_common(paras, max_doc_freq=2)
        return out.select(
            "doc_id", "n_paras", "n_kept", "n_dropped",
            F.substring(F.md5("clean_text"), 1, 8).alias("fp8"))

    def q_nfc_normalize(spark, sf):
        # NFC normalization (the DuckDB-portable slice; NFKC is pinned by
        # pytest).  A decomposed suffix (e+U+0301, U+212B, A+U+030A) is
        # appended so composition genuinely fires on this ASCII corpus.
        from html_qt_spark.operators.normalize import normalize_text
        suffixed = _docs(spark, sf).select(
            "doc_id",
            F.concat("text", F.lit(" cafe\u0301 \u212b A\u030a"))
            .alias("text"))
        normed = normalize_text(suffixed, form="NFC", out_col="norm_text")
        return normed.select(
            "doc_id",
            F.length("text").cast("long").alias("n_chars_raw"),
            F.length("norm_text").cast("long").alias("n_chars_nfc"),
            F.substring(F.md5("norm_text"), 1, 8).alias("fp8"))

    def q_para_dedup(spark, sf):
        # paragraph-level exact dedup (CCNet/RefinedWeb style).  The
        # corpus has no newlines, so paragraph boundaries are synthesized
        # deterministically as tumbling 10-token windows — identically in
        # the DuckDB oracle.
        from html_qt_spark.operators.dedup import paragraph_dedup
        toks = F.filter(F.split("text", " "), lambda t: t != "")
        n_last = F.greatest(
            F.floor((F.size(toks) - 1) / 10).cast("int"), F.lit(0))
        paras = _docs(spark, sf).select(
            "doc_id",
            F.concat_ws("\n\n", F.transform(
                F.sequence(F.lit(0), n_last),
                lambda i: F.concat_ws(" ", F.slice(toks, i * 10 + 1, 10)))
            ).alias("text"))
        out = paragraph_dedup(paras)
        return out.select(
            "doc_id", "n_paras", "n_kept", "n_dropped",
            F.substring(F.md5("clean_text"), 1, 8).alias("fp8"))

    # ----- non-SQL-expressible (rows-only checks): kernel + scale paths
    def q_extract_doc(spark, sf):
        return extract_spans_doc(interleaved_nested(spark, sf))

    def q_extract_exploded(spark, sf):
        return extract_spans_exploded(interleaved_exploded(spark, sf))

    def q_extract_compat(spark, sf):
        return extract_spans_doc(interleaved_nested(spark, sf),
                                 reference_compat=True)

    def q_extract_chunked(spark, sf):
        # mega-span chunk-split path: thresholds lowered so the sandbox
        # corpus actually splits; must produce byte-identical spans to
        # extract_doc (same golden oracle)
        from html_qt_spark.operators.extract import chunk_split_exploded
        ex = interleaved_exploded(spark, sf)
        return extract_spans_exploded(chunk_split_exploded(
            ex, threshold_bytes=4096, target_chunk_bytes=2048))

    def q_extract_fragments(spark, sf):
        # innerHTML semantics: every text span parsed as the contents of
        # a <td> context element (WHATWG 13.4).  Oracle = golden spans
        # from the independent recursive extractor run in fragment mode.
        return extract_spans_doc(interleaved_nested(spark, sf),
                                 fragment_context="td")

    def q_extract_markdown(spark, sf):
        # structure-preserving Markdown rendering (kernel/markdown.py);
        # oracle = golden markdown from the independent recursive
        # renderer (tests/oracle.py::oracle_markdown)
        from html_qt_spark.operators.extract import extract_markdown_doc
        return extract_markdown_doc(interleaved_nested(spark, sf))

    def q_doc_parse_stats(spark, sf):
        from html_qt_spark.operators.extract import doc_parse_stats
        return doc_parse_stats(interleaved_nested(spark, sf))

    def q_doc_metadata(spark, sf):
        from html_qt_spark.operators.extract import doc_metadata
        return doc_metadata(interleaved_nested(spark, sf))

    def q_clean_corpus(spark, sf):
        # composite training-data pipeline in ONE plan: extract ->
        # reassemble doc text -> NFC normalize -> quality gate ->
        # exact-dedup (first wins).  Normalization runs BEFORE the md5
        # dedup so composed/decomposed twins collapse (the oracle mirrors
        # with DuckDB nfc_normalize).
        from html_qt_spark.operators.normalize import normalize_text
        spans = extract_spans_doc(interleaved_nested(spark, sf))
        doc_text = normalize_text(
            (spans.where(F.col("kind") == "text")
             .groupBy("doc_id")
             .agg(F.concat_ws(" ", F.sort_array(
                     F.collect_list(F.struct("span_idx", "text"))
                  ).getField("text")).alias("clean_text"))),
            form="NFC", text_col="clean_text")
        scored = doc_text.select(
            "doc_id", "clean_text",
            F.size(F.split("clean_text", " ")).alias("n_tokens"))
        quality = scored.where(F.col("n_tokens") >= 5)
        w = Window.partitionBy(F.md5("clean_text")).orderBy("doc_id")
        return (quality
                .withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .select("doc_id", "n_tokens",
                        F.substring(F.md5("clean_text"), 1, 8).alias("fp8")))

    def q_minhash_lsh_pairs(spark, sf):
        return dedup.minhash_lsh_pairs(_docs(spark, sf),
                                       hash_fn="md5")

    def q_lsh_pairs_megabucket(spark, sf):
        # cap=2 < real sf0.01 max bucket size: over-cap buckets emit
        # linear star pairs (VERDICT r3 task #4 recall-hole fix)
        return dedup.minhash_lsh_pairs(_docs(spark, sf),
                                       max_docs_per_bucket=2,
                                       hash_fn="md5")

    def q_dup_components(spark, sf):
        # duplicate-cluster assignment: iterative min-label propagation
        # over the LSH candidate graph (O(diameter) shuffle rounds)
        return dedup.connected_components(
            dedup.minhash_lsh_pairs(_docs(spark, sf), hash_fn="md5"))

    def q_dup_components_star(spark, sf):
        # same clustering via alternating large-star/small-star
        # (Kiveris et al.): O(log n) rounds on adversarial chain graphs
        # where min-label needs O(diameter); identical output contract,
        # same recursive-CTE oracle
        return dedup.connected_components_star(
            dedup.minhash_lsh_pairs(_docs(spark, sf), hash_fn="md5"))

    def q_simhash(spark, sf):
        # 32-bit md5_32 family = exact DuckDB oracle; the 64-bit xxhash64
        # default is the production path (identical plan shape)
        return dedup.simhash(_docs(spark, sf), bits=32, hash_fn="md5_32")

    def q_ngram_jaccard(spark, sf):
        return (dedup.ngram_jaccard_pairs(_docs(spark, sf), n=3,
                                          min_jaccard=0.2)
                .select("doc_a", "doc_b",
                        F.round("jaccard", 3).alias("j3")))

    def q_ann_lsh_topk(spark, sf):
        # integer-only projection (rank, not cos) so the oracle compare is
        # float-drift-free; md5_32 hyperplanes for DuckDB reproducibility
        ann = similarity.ann_lsh_topk(_emb(spark, sf), query_vec_id=0,
                                      k=10, hash_fn="md5_32")
        w = Window.orderBy(F.col("cos").desc(), F.col("vec_id"))
        return ann.select("vec_id", F.row_number().over(w).cast("long")
                          .alias("rank"))

    def q_ivf_topk(spark, sf):
        # IVF-style ANN (hash-seeded coarse quantizer, 2-probe); rank
        # output only so the compare is float-drift-free, md5_32 seeds
        # for DuckDB reproducibility
        ivf = similarity.ivf_topk(_emb(spark, sf), query_vec_id=0, k=10,
                                  n_centroids=8, n_probe=2,
                                  hash_fn="md5_32")
        w = Window.orderBy(F.col("cos").desc(), F.col("vec_id"))
        return ivf.select("vec_id", F.row_number().over(w).cast("long")
                          .alias("rank"))

    def q_media_decode(spark, sf):
        # feature:array<float> is quantized back to its byte form and
        # '|'-joined so the result is all-scalar (hash-comparable); the
        # oracle recomputes every column from media_ref alone in SQL.
        media = (interleaved_exploded(spark, sf)
                 .where(F.col("kind") == "media"))
        return (multimodal.decode_media(media)
                .select("media_ref", "modality", "width", "height",
                        "duration_ms",
                        F.concat_ws("|", F.transform(
                            "feature",
                            lambda x: F.round(x * 255).cast("int")
                        )).alias("feature_q")))

    def q_frame_sample(spark, sf):
        media = (interleaved_exploded(spark, sf)
                 .where(F.col("kind") == "media"))
        return multimodal.frame_sample_plan(
            multimodal.decode_media(media), every_ms=60000)

    def q_resize_plan(spark, sf):
        media = (interleaved_exploded(spark, sf)
                 .where(F.col("kind") == "media"))
        return multimodal.resize_plan(multimodal.decode_media(media))

    def q_chunk_docs(spark, sf):
        # context-window splitting: 40-token chunks, 8-token overlap
        from html_qt_spark.operators.curation import chunk_documents
        return chunk_documents(_docs(spark, sf), chunk_tokens=40,
                               overlap=8)

    def q_subword_tokens(spark, sf):
        # corpus-derived greedy longest-match subword counts (r4):
        # vocab = top-64 char 2..4-grams; the collect is index-sized
        docs = _docs(spark, sf)
        vocab = [r.piece for r in textstats.subword_vocab(
            docs, vocab_size=64, min_len=2, max_len=4).collect()]
        return textstats.subword_token_count(docs, vocab,
                                             min_len=2, max_len=4)

    def q_semantic_dedup(spark, sf):
        # SemDeDup (r4): cluster-bounded semantic pruning; md5_32
        # centroids so the oracle recomputes the identical lists
        return similarity.semantic_dedup(
            _emb(spark, sf), n_centroids=8, threshold=0.4,
            hash_fn="md5_32")

    def q_semantic_dedup_star(spark, sf):
        # r5: hot-list cap engaged — lists over max_list_size degrade
        # to the linear hub-star pass (cap=40 < the ~62-vector average
        # list at sf0.01, so BOTH the quadratic and star paths run and
        # the oracle replicates the exact hub-star semantics)
        return similarity.semantic_dedup(
            _emb(spark, sf), n_centroids=8, threshold=0.4,
            max_list_size=40, hash_fn="md5_32")

    def q_classifier_score(spark, sf):
        # hashed linear quality-classifier application (r4): md5_32
        # buckets + md5-seeded stand-in weights, both recomputed by
        # the oracle; one narrow projection, zero shuffle
        return textstats.linear_classifier_score(
            _docs(spark, sf), dim=1024, hash_fn="md5_32")

    def q_mask_runs(spark, sf):
        # exact-substring dedup (r4): duplicated 8-token runs masked
        # from EVERY doc carrying them (Lee et al. ExactSubstr shape)
        return dedup.mask_common_runs(_docs(spark, sf), n=8,
                                      min_docs=2)

    def q_shard_manifest(spark, sf):
        # trainer dataloader manifest over the packed shards, exploded
        # to one scalar row per packed doc (r5): the r4 array-valued
        # form crashed the driver canonicalizer (pandas cannot sort
        # list cells); the array API stays in the library
        # (curation.shard_manifest), this row form is what the driver
        # hash-checks
        from html_qt_spark.operators.curation import (
            pack_shards,
            shard_manifest_rows,
        )
        packed = pack_shards(
            textstats.token_count(_docs(spark, sf)),
            token_budget=512)
        return shard_manifest_rows(packed)

    def q_bpe_merges(spark, sf):
        # distributed BPE tokenizer training (r4): data-dependent
        # iterative merges -> rows-only driver check (no SQL oracle,
        # per the driver contract for iterative algorithms); pinned
        # merge-for-merge against the classic reference in pytest
        return textstats.bpe_train(_docs(spark, sf), n_merges=12)

    def q_bpe_apply(spark, sf):
        # BPE *application* with a fixed merge table (r5): the per-pass
        # tokenizer hot path, pure codegen (m nested replaces), hashed
        # piece stream so the oracle pins every boundary
        return textstats.bpe_apply(_docs(spark, sf))

    def q_frequent_ngrams(spark, sf):
        # corpus-wide boilerplate mining (r5): deterministic top-k
        # 5-gram counts, TakeOrdered (partial top-k), never a full sort
        return textstats.frequent_ngrams(_docs(spark, sf), n=5, k=20)

    def q_hash_split(spark, sf):
        # reproducible train/val/test assignment (r5): order- and
        # cluster-independent, md5_32 so the oracle recomputes it
        from html_qt_spark.operators.curation import hash_split

        return hash_split(_docs(spark, sf),
                          fractions={"train": 0.9, "val": 0.05,
                                     "test": 0.05},
                          hash_fn="md5_32")

    def q_mask_runs_char(spark, sf):
        # character-level ExactSubstr masking (r5): catches duplicated
        # material that re-wraps across token boundaries
        return dedup.mask_common_runs_chars(_docs(spark, sf), n=16,
                                            min_docs=2)

    def q_dsir_weights(spark, sf):
        # DSIR importance resampling weights (r5): hashed-bigram
        # log-ratio of target (lang='en') vs raw corpus; md5_32 buckets
        # so the oracle recomputes the identical feature space
        from html_qt_spark.operators.curation import dsir_logweights

        docs = _docs(spark, sf)
        return dsir_logweights(docs, docs.where(F.col("lang") == "en"),
                               buckets=256, hash_fn="md5_32")

    def q_ppl_buckets(spark, sf):
        # CCNet head/middle/tail perplexity split (r5): per-lang ntile
        # over the corpus-trained bigram LM score, deterministic ties
        from html_qt_spark.operators.curation import perplexity_buckets

        return perplexity_buckets(_docs(spark, sf))

    def q_media_captions(spark, sf):
        # nearest text context per media span (caption pairing, r4)
        return multimodal.media_captions(interleaved_exploded(spark, sf))

    def q_ivf_topk_batch(spark, sf):
        # batch probed-list ANN (r4): shared assignment table, per-query
        # WindowGroupLimit probes + ranks; md5_32 for the DuckDB oracle
        return (similarity.ivf_topk_batch(
            _emb(spark, sf), [0, 7, 42], k=10, n_centroids=8,
            n_probe=2, hash_fn="md5_32")
            .select("q_id", "vec_id",
                    F.col("rank").cast("long").alias("rank")))

    def q_chunk_subword(spark, sf):
        # context-window splitting budgeted by subword cost (r4):
        # word-boundary chunks filled to ~64 subword tokens
        from html_qt_spark.operators.curation import (
            chunk_documents_subword,
        )
        docs = _docs(spark, sf)
        vocab = [r.piece for r in textstats.subword_vocab(
            docs, vocab_size=64, min_len=2, max_len=4).collect()]
        return chunk_documents_subword(docs, chunk_tokens=64,
                                       vocab=vocab, min_len=2,
                                       max_len=4)

    # Registration ORDER is part of the driver contract: the driver's
    # correctness artifact caps at the FIRST 50 entries.  Round-6 order
    # (VERDICT r5 task #3): the 31 entries past the r5 cap lead — their
    # newest driver rows are from r4, two rounds stale; then every query
    # whose operator the round-6 optimization touched (extraction fast
    # path, MinHash spread/plan changes, vectorized decode, the
    # frequent_ngrams rewrite) stays in-cap so the driver re-verifies
    # them this round; the slots left fill with round-5 entries.  The 31
    # entries now past the cap are all r5-driver-green, so across r5+r6
    # every registered query keeps a green row within two rounds.  All
    # entries remain locally parity-checked regardless of position
    # (tools/check_parity.py runs the full dict).
    return {
        # -- no r5 driver row (r4-green): rotated into the cap ---------
        "kmv_distinct": q_kmv_distinct,
        "classifier_score": q_classifier_score,
        "media_decode": q_media_decode,
        "ivf_topk": q_ivf_topk,
        "cosine_topk": q_cosine_topk,
        "doc_metadata": q_doc_metadata,
        "clean_corpus": q_clean_corpus,
        "simhash": q_simhash,
        "ngram_jaccard": q_ngram_jaccard,
        "ann_lsh_topk": q_ann_lsh_topk,
        "frame_sample": q_frame_sample,
        "resize_plan": q_resize_plan,
        "media_captions": q_media_captions,
        "ivf_topk_batch": q_ivf_topk_batch,
        "event_sessions": q_event_sessions,
        "event_windows": q_event_windows,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "cosine_topk_batch": q_cosine_topk_batch,
        "cosine_dupes": q_cosine_dupes,
        "cosine_dupes_lsh": q_cosine_dupes_lsh,
        "scrub_pii": q_scrub_pii,
        "hash_sample": q_hash_sample,
        "gopher_quality": q_gopher_quality,
        "unigram_logprob": q_unigram_logprob,
        "bigram_logprob": q_bigram_logprob,
        "decontaminate": q_decontaminate,
        "cap_per_source": q_cap_per_source,
        "temperature_sample": q_temperature_sample,
        "repetition": q_repetition,
        "entropy": q_entropy,
        # -- operators touched by the round-6 optimization -------------
        "extract_doc": q_extract_doc,
        "extract_exploded": q_extract_exploded,
        "extract_compat": q_extract_compat,
        "extract_chunked": q_extract_chunked,
        "extract_fragments": q_extract_fragments,
        "extract_markdown": q_extract_markdown,
        "doc_parse_stats": q_doc_parse_stats,
        "minhash_signatures": q_minhash_signatures,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "lsh_pairs_megabucket": q_lsh_pairs_megabucket,
        "dup_components": q_dup_components,
        "dup_components_star": q_dup_components_star,
        "quality_score": q_quality_score,
        "frequent_ngrams": q_frequent_ngrams,
        "exact_dedup": q_exact_dedup,
        "span_stats": q_span_stats,
        # -- r5-green fillers to the 50-row cap ------------------------
        "token_count": q_token_count,
        "mask_runs_char": q_mask_runs_char,
        "hash_split": q_hash_split,
        # -- past the 50-row cap: all r5-driver-green ------------------
        "json_meta": q_json_meta,
        "winnowing": q_winnowing,
        "nfc_normalize": q_nfc_normalize,
        "para_dedup": q_para_dedup,
        "para_filter_common": q_para_filter_common,
        "tfidf_top": q_tfidf_top,
        "length_percentiles": q_length_percentiles,
        "explode_spans": q_explode_spans,
        "media_filter": q_media_filter,
        "span_order": q_span_order,
        "media_join": q_media_join,
        "metrics_rollup": q_metrics_rollup,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "lang_dist": q_lang_dist,
        "pricing_summary": q_pricing_summary,
        "top_customers": q_top_customers,
        "region_nation_rollup": q_region_nation_rollup,
        "regex_tokens": q_regex_tokens,
        "shard_manifest": q_shard_manifest,
        "mask_runs": q_mask_runs,
        "semantic_dedup": q_semantic_dedup,
        "semantic_dedup_star": q_semantic_dedup_star,
        "bpe_merges": q_bpe_merges,
        "bpe_apply": q_bpe_apply,
        "dsir_weights": q_dsir_weights,
        "ppl_buckets": q_ppl_buckets,
        "chunk_docs": q_chunk_docs,
        "chunk_subword": q_chunk_subword,
        "subword_tokens": q_subword_tokens,
        "pack_shards": q_pack_shards,
    }


# ---------------------------------------------------------- oracle SQL

_FIXTURES = "/root/repo/tests/fixtures"

# minhash LSH oracle: same md5 family as the minhash_signatures oracle,
# extended to 16 signatures, banded 4x4, hot-bucket cap mirrored in SQL
_LSH_SIGS = ", ".join(
    f"min(md5('{j}:' || shingle)) AS sig_{j}" for j in range(16))
_LSH_BANDS = " UNION ALL ".join(
    "SELECT doc_id, {b} AS band, md5({expr}) AS bucket FROM sig".format(
        b=b,
        expr=" || '|' || ".join(f"sig_{b * 4 + r}" for r in range(4)))
    for b in range(4))
def _lsh_ctes(cap: int) -> str:
    """LSH oracle CTE chain, parameterized by the hot-bucket cap.

    Mirrors dedup.minhash_lsh_pairs exactly: buckets holding 2..cap
    docs self-join; buckets over the cap emit linear STAR pairs
    (bucket-min hub -> every other member) instead of being dropped."""
    return (
        "ts AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS toks FROM documents), "
        "pos AS (SELECT doc_id, toks, "
        "unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i FROM ts), "
        "sh AS (SELECT doc_id, array_to_string(toks[i:i+2], ' ') "
        "AS shingle FROM pos), "
        f"sig AS (SELECT doc_id, {_LSH_SIGS} FROM sh GROUP BY doc_id), "
        f"buckets AS ({_LSH_BANDS}), "
        "bs AS (SELECT band, bucket, count(*) AS n, min(doc_id) AS hub "
        "FROM buckets GROUP BY band, bucket), "
        "capped AS (SELECT b.* FROM buckets b JOIN bs USING (band, bucket) "
        f"WHERE bs.n BETWEEN 2 AND {cap}), "
        "mega AS (SELECT bs.hub, b.doc_id FROM buckets b "
        "JOIN bs USING (band, bucket) "
        f"WHERE bs.n > {cap} AND b.doc_id <> bs.hub)")


_LSH_PAIRS_SELECT = (
    "SELECT DISTINCT doc_a, doc_b FROM ("
    "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "FROM capped a JOIN capped b USING (band, bucket) "
    "WHERE a.doc_id < b.doc_id "
    "UNION ALL SELECT hub AS doc_a, doc_id AS doc_b FROM mega)")
_LSH_CTES = _lsh_ctes(1000)
_LSH_ORACLE = f"WITH {_LSH_CTES} {_LSH_PAIRS_SELECT}"
# cap=2 exceeds real sf0.01 bucket sizes (max observed = 3): the size-3
# buckets take the star path, so the driver artifact itself covers the
# over-cap branch on real data
_LSH_MEGA_ORACLE = f"WITH {_lsh_ctes(2)} {_LSH_PAIRS_SELECT}"

# subword token counts: recompute the ENTIRE pipeline in SQL — the
# corpus-derived top-64 2..4-gram vocab (same total ordering: count
# desc, piece asc) and the greedy longest-match walk as a recursive CTE
# stepping one match per iteration.  The length()=L guards mirror the
# engine's per-length vocab arrays, which can never match a shorter
# end-of-word remainder.
def _subword_probe(ln: int) -> str:
    sub = f"substr(w, CAST(pos AS INT), {ln})"
    return (f"WHEN list_contains((SELECT v FROM vlist), {sub}) "
            f"AND length({sub}) = {ln} THEN {ln}")


def _bpe_apply_oracle() -> str:
    # generated from the SAME constant merge table the Spark operator
    # uses, so the m nested replace() calls are literally identical
    from html_qt_spark.operators.textstats import (
        _BPE_SEP,
        BPE_FIXED_MERGES,
    )

    s = _BPE_SEP
    expr = f"regexp_replace(w, '(?s)(.)', '{s}\\1{s}', 'g')"
    for left, right in BPE_FIXED_MERGES:
        expr = (f"replace({expr}, '{s}{left}{s}{s}{right}{s}', "
                f"'{s}{left}{right}{s}')")
    return (
        "WITH ws AS (SELECT doc_id, "
        "list_filter(string_split(coalesce(text, ''), ' '), "
        "x -> x <> '') AS words FROM documents), "
        "tok AS (SELECT doc_id, len(words) AS n_words, "
        "flatten(list_transform(words, w -> "
        f"string_split(regexp_replace({expr}, '^{s}|{s}$', '', 'g'), "
        f"'{s}{s}'))) AS pieces FROM ws) "
        "SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, "
        "CAST(len(pieces) AS BIGINT) AS n_pieces, "
        f"md5(array_to_string(pieces, '{s}')) AS pieces_hash FROM tok")


_SUBWORD_ORACLE = (
    "WITH RECURSIVE "
    "ts AS (SELECT doc_id, list_filter(string_split(text, ' '), "
    "x -> x <> '') AS toks FROM documents), "
    "words AS (SELECT doc_id, unnest(toks) AS w FROM ts), "
    "wlen AS (SELECT w, unnest(range(2, 5)) AS l FROM words), "
    "wpos AS (SELECT w, l, unnest(range(1, length(w) - l + 2)) AS i "
    "FROM wlen), "
    "pieces AS (SELECT substr(w, CAST(i AS INT), CAST(l AS INT)) "
    "AS piece FROM wpos), "
    "vocab AS (SELECT piece, count(*) AS n FROM pieces GROUP BY piece "
    "ORDER BY n DESC, piece LIMIT 64), "
    "vlist AS (SELECT list(piece) AS v FROM vocab), "
    "wi AS (SELECT doc_id, row_number() OVER () AS wid, w FROM words), "
    "step(doc_id, wid, w, pos, cnt) AS ("
    "SELECT doc_id, wid, w, 1, 0 FROM wi "
    "UNION ALL SELECT doc_id, wid, w, "
    f"pos + CASE {_subword_probe(4)} {_subword_probe(3)} "
    f"{_subword_probe(2)} ELSE 1 END, cnt + 1 "
    "FROM step WHERE pos <= length(w)), "
    "wc AS (SELECT doc_id, wid, max(cnt) AS c FROM step "
    "GROUP BY doc_id, wid), "
    "agg AS (SELECT doc_id, sum(c) AS n FROM wc GROUP BY doc_id) "
    "SELECT d.doc_id, CAST(coalesce(a.n, 0) AS BIGINT) "
    "AS n_subword_tokens FROM documents d LEFT JOIN agg a USING (doc_id)")

# subword-budget chunking: same vocab + greedy-walk CTEs, then the
# pack_shards prefix-sum fill rule at word granularity (exclusive
# cumulative subwords // budget = chunk id), text rebuilt in pos order
_CHUNK_SUBWORD_ORACLE = (
    "WITH RECURSIVE "
    "ts AS (SELECT doc_id, list_filter(string_split(text, ' '), "
    "x -> x <> '') AS toks FROM documents), "
    "wordsall AS (SELECT doc_id, unnest(toks) AS w FROM ts), "
    "wlen AS (SELECT w, unnest(range(2, 5)) AS l FROM wordsall), "
    "wpos AS (SELECT w, l, unnest(range(1, length(w) - l + 2)) AS i "
    "FROM wlen), "
    "pieces AS (SELECT substr(w, CAST(i AS INT), CAST(l AS INT)) "
    "AS piece FROM wpos), "
    "vocab AS (SELECT piece, count(*) AS n FROM pieces GROUP BY piece "
    "ORDER BY n DESC, piece LIMIT 64), "
    "vlist AS (SELECT list(piece) AS v FROM vocab), "
    "wi AS (SELECT doc_id, unnest(toks) AS w, "
    "unnest(range(0, len(toks))) AS pos FROM ts), "
    "step(doc_id, pos, w, p, cnt) AS ("
    "SELECT doc_id, pos, w, 1, 0 FROM wi "
    "UNION ALL SELECT doc_id, pos, w, "
    f"p + CASE {_subword_probe(4).replace('pos', 'p')} "
    f"{_subword_probe(3).replace('pos', 'p')} "
    f"{_subword_probe(2).replace('pos', 'p')} ELSE 1 END, cnt + 1 "
    "FROM step WHERE p <= length(w)), "
    "wc AS (SELECT doc_id, pos, any_value(w) AS w, max(cnt) AS wtok "
    "FROM step GROUP BY doc_id, pos), "
    "cum AS (SELECT doc_id, pos, w, wtok, "
    "coalesce(sum(wtok) OVER (PARTITION BY doc_id ORDER BY pos "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb "
    "FROM wc) "
    "SELECT doc_id, CAST(cumb // 64 AS INT) AS chunk_idx, "
    "string_agg(w, ' ' ORDER BY pos) AS chunk_text, "
    "CAST(sum(wtok) AS BIGINT) AS n_subword_tokens "
    "FROM cum GROUP BY doc_id, CAST(cumb // 64 AS INT)")

# bigram LM: same count tables + add-one smoothing + the standard
# drift-absorbing integerization (floor(round(.,6)*1000))
_BIGRAM_ORACLE = (
    "WITH ts AS (SELECT doc_id, list_filter(string_split(text, ' '), "
    "x -> x <> '') AS toks FROM documents), "
    "pos AS (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i "
    "FROM ts), "
    "bi AS (SELECT doc_id, toks[CAST(i AS INT)] AS w1, "
    "toks[CAST(i AS INT) + 1] AS w2 FROM pos), "
    "bc AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2), "
    "lc AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY w1), "
    "vs AS (SELECT count(DISTINCT tok) AS v FROM "
    "(SELECT unnest(toks) AS tok FROM ts)), "
    "j AS (SELECT bi.doc_id, "
    "-ln((bc.c12 + 1.0) / (lc.c1 + 1.0 * vs.v)) AS nl "
    "FROM bi JOIN bc USING (w1, w2) JOIN lc USING (w1), vs) "
    "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, "
    "CAST(floor(round(sum(nl) / count(*), 6) * 1000) AS BIGINT) "
    "AS logprob_x1000 FROM j GROUP BY doc_id")

# connected components over the LSH candidate pairs: exact transitive
# closure via a recursive CTE (fine at oracle scale), min reachable
# doc_id = component label — matches the Spark min-label propagation
_COMPONENTS_ORACLE = (
    f"WITH RECURSIVE {_LSH_CTES}, "
    f"pairs AS ({_LSH_PAIRS_SELECT}), "
    "edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs "
    "UNION SELECT doc_b, doc_a FROM pairs), "
    "reach(u, r) AS ("
    "SELECT u, u FROM (SELECT DISTINCT u FROM edges) "
    "UNION "
    "SELECT r0.u, e.v FROM reach r0 JOIN edges e ON r0.r = e.u) "
    "SELECT u AS doc_id, min(r) AS component_id FROM reach GROUP BY u")

# media_decode oracle: recompute the deterministic decode entirely in SQL
# from media_ref (the 31-bit polynomial hash h = fold(h*131 + ord(c)))
_MEDIA_H = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(range(1, length(media_ref)+1), "
    "i -> CAST(ord(substr(media_ref, CAST(i AS INT), 1)) AS BIGINT))), "
    "(acc, x) -> (acc * 131 + x) % 2147483648)")
_MEDIA_FEATURE = " || '|' || ".join(
    f"CAST((h >> {i}) % 256 AS STRING)" for i in range(8))
# continues the oracle_cte() WITH-chain (leading comma)
_MEDIA_M_CTE = (
    ", m AS (SELECT media_ref, "
    "CASE WHEN media_ref LIKE 'img://%' THEN 'image' "
    "WHEN media_ref LIKE 'vid://%' THEN 'video' "
    "WHEN media_ref LIKE 'aud://%' THEN 'audio' ELSE 'unknown' END "
    "AS modality, "
    f"{_MEDIA_H} AS h "
    "FROM interleaved_spans WHERE kind = 'media') ")
_MEDIA_ORACLE_BODY = (
    _MEDIA_M_CTE
    + "SELECT media_ref, modality, "
    "CAST(160 + h % 1920 AS INT) AS width, "
    "CAST(90 + (h >> 8) % 1080 AS INT) AS height, "
    "CAST(CASE WHEN modality = 'image' THEN 0 "
    "ELSE 1000 + (h >> 16) % 600000 END AS INT) AS duration_ms, "
    f"{_MEDIA_FEATURE} AS feature_q "
    "FROM m")
_FRAME_ORACLE_BODY = (
    _MEDIA_M_CTE
    + ", d AS (SELECT media_ref, "
    "CAST(1000 + (h >> 16) % 600000 AS INT) AS duration_ms "
    "FROM m WHERE modality = 'video') "
    "SELECT media_ref, CAST(unnest(range(0, duration_ms + 1, 60000)) "
    "AS INT) AS frame_ts_ms FROM d")

# portable 32-bit md5-prefix token hash (matches Spark's
# conv(substring(md5(x),1,8),16,10) exactly)
def _md5_32(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


# SRP bucket recomputation in SQL: plane p's sign bit over a 64-dim
# embedding, with the md5_32 hyperplane family and a left-to-right
# list_reduce fold matching Spark's aggregate() summation order exactly
# (bucket parity verified bit-for-bit on sf0.01)
def _srp_bit(p: int) -> str:
    return (
        "CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(range(0, 64), d -> embedding[CAST(d+1 AS INT)] * "
        f"((('0x' || substr(md5('{p}:' || CAST(d AS STRING)), 1, 8))"
        "::BIGINT % 1001 - 500) / 500.0))), "
        "(a, b) -> a + b) >= 0 THEN '1' ELSE '0' END")


def _srp_bucket(n_planes: int) -> str:
    return " || ".join(_srp_bit(p) for p in range(n_planes))


_HAMMING_LE1 = "(" + " + ".join(
    f"CASE WHEN substr(bucket, {i + 1}, 1) <> substr(qb, {i + 1}, 1) "
    "THEN 1 ELSE 0 END" for i in range(6)) + ") <= 1"

_COSINE_DUPES_LSH_ORACLE = (
    f"WITH b AS (SELECT vec_id, embedding, {_srp_bucket(4)} AS bucket "
    "FROM embeddings) "
    "SELECT a.vec_id AS vec_a, c.vec_id AS vec_b, "
    "round(list_cosine_similarity(a.embedding::DOUBLE[], "
    "c.embedding::DOUBLE[]), 4) AS cos "
    "FROM b a JOIN b c ON a.bucket = c.bucket "
    "AND a.vec_id < c.vec_id "
    "WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], "
    "c.embedding::DOUBLE[]), 4) >= 0.35")

_ANN_LSH_ORACLE = (
    f"WITH b AS (SELECT vec_id, embedding, {_srp_bucket(6)} AS bucket "
    "FROM embeddings), "
    "q AS (SELECT bucket AS qb, embedding AS q_emb FROM b "
    "WHERE vec_id = 0), "
    "cand AS (SELECT b.vec_id, b.embedding, q.q_emb FROM b, q "
    f"WHERE {_HAMMING_LE1} AND b.vec_id <> 0) "
    "SELECT vec_id, CAST(row_number() OVER (ORDER BY "
    "list_cosine_similarity(embedding, q_emb) DESC, vec_id) AS BIGINT) "
    "AS rank "
    "FROM cand ORDER BY list_cosine_similarity(embedding, q_emb) DESC, "
    "vec_id LIMIT 10")


# IVF oracle: hash-seeded centroids -> argmax-cosine assignment ->
# 2-probe -> exact re-rank, all recomputed in SQL.  Tie-breaks mirror
# Spark exactly: assignment max(struct(sim, centroid_id)) == row_number
# ORDER BY sim DESC, centroid_id DESC; final rank on round(cos, 6).
_IVF_ORACLE = (
    "WITH pri AS (SELECT vec_id, embedding, "
    "('0x' || substr(md5('ivf:' || CAST(vec_id AS STRING)), 1, 8))"
    "::BIGINT AS p FROM embeddings), "
    "cents AS (SELECT vec_id AS centroid_id, embedding AS c_emb "
    "FROM pri ORDER BY p, vec_id LIMIT 8), "
    "sims AS (SELECT e.vec_id, c.centroid_id, "
    "list_cosine_similarity(e.embedding::DOUBLE[], c.c_emb::DOUBLE[]) "
    "AS sim FROM embeddings e, cents c), "
    "assign AS (SELECT vec_id, centroid_id AS list_id FROM "
    "(SELECT vec_id, centroid_id, row_number() OVER (PARTITION BY vec_id "
    "ORDER BY sim DESC, centroid_id DESC) AS rn FROM sims) WHERE rn = 1), "
    "q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0), "
    "probe AS (SELECT centroid_id AS list_id FROM cents, q "
    "ORDER BY list_cosine_similarity(c_emb::DOUBLE[], q_emb::DOUBLE[]) "
    "DESC, centroid_id LIMIT 2), "
    "cand AS (SELECT a.vec_id FROM assign a JOIN probe USING (list_id)), "
    "s AS (SELECT e.vec_id, "
    "round(list_cosine_similarity(e.embedding::DOUBLE[], "
    "q.q_emb::DOUBLE[]), 6) AS cos "
    "FROM embeddings e JOIN cand USING (vec_id), q WHERE e.vec_id <> 0) "
    "SELECT vec_id, CAST(row_number() OVER (ORDER BY cos DESC, vec_id) "
    "AS BIGINT) AS rank FROM s ORDER BY cos DESC, vec_id LIMIT 10")

# batch IVF: the single-query oracle's CTEs with q/probe/rank made
# per-q_id (row_number partitions) — same hash-seeded centroids
_IVF_BATCH_ORACLE = (
    "WITH pri AS (SELECT vec_id, embedding, "
    "('0x' || substr(md5('ivf:' || CAST(vec_id AS STRING)), 1, 8))"
    "::BIGINT AS p FROM embeddings), "
    "cents AS (SELECT vec_id AS centroid_id, embedding AS c_emb "
    "FROM pri ORDER BY p, vec_id LIMIT 8), "
    "sims AS (SELECT e.vec_id, c.centroid_id, "
    "list_cosine_similarity(e.embedding::DOUBLE[], c.c_emb::DOUBLE[]) "
    "AS sim FROM embeddings e, cents c), "
    "assign AS (SELECT vec_id, centroid_id AS list_id FROM "
    "(SELECT vec_id, centroid_id, row_number() OVER (PARTITION BY vec_id "
    "ORDER BY sim DESC, centroid_id DESC) AS rn FROM sims) WHERE rn = 1), "
    "q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings "
    "WHERE vec_id IN (0, 7, 42)), "
    "probe AS (SELECT q_id, centroid_id AS list_id FROM "
    "(SELECT q.q_id, c.centroid_id, row_number() OVER "
    "(PARTITION BY q.q_id ORDER BY "
    "list_cosine_similarity(c.c_emb::DOUBLE[], q.q_emb::DOUBLE[]) DESC, "
    "c.centroid_id) AS rn FROM cents c, q) WHERE rn <= 2), "
    "cand AS (SELECT DISTINCT p.q_id, a.vec_id FROM assign a "
    "JOIN probe p USING (list_id)), "
    "s AS (SELECT c.q_id, e.vec_id, "
    "round(list_cosine_similarity(e.embedding::DOUBLE[], "
    "q.q_emb::DOUBLE[]), 6) AS cos "
    "FROM embeddings e JOIN cand c USING (vec_id) "
    "JOIN q ON q.q_id = c.q_id WHERE e.vec_id <> c.q_id) "
    "SELECT q_id, vec_id, rank FROM (SELECT q_id, vec_id, "
    "CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, "
    "vec_id) AS BIGINT) AS rank FROM s) WHERE rank <= 10")

_SIMHASH_BITSUMS = ", ".join(
    f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
    for i in range(32))
_SIMHASH_FOLD = " + ".join(
    f"CASE WHEN b{i} > 0 THEN (1::BIGINT << {i}) ELSE 0 END"
    for i in range(32))
_SIMHASH_ORACLE = (
    "WITH toks AS (SELECT doc_id, "
    "unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok "
    "FROM documents), "
    f"h AS (SELECT doc_id, {_md5_32('tok')} AS h FROM toks), "
    f"bs AS (SELECT doc_id, {_SIMHASH_BITSUMS} FROM h GROUP BY doc_id) "
    f"SELECT doc_id, CAST({_SIMHASH_FOLD} AS BIGINT) AS simhash FROM bs")

_WINNOWING_ORACLE = (
    "WITH ts AS (SELECT doc_id, list_filter(string_split(text, ' '), "
    "x -> x <> '') AS toks FROM documents), "
    "g AS (SELECT doc_id, "
    "list_transform(range(1, greatest(len(toks) - 4, 0) + 1), "
    "i -> " + _md5_32("array_to_string(toks[i:i+4], ' ')")
    + ") AS hs FROM ts), "
    "w AS (SELECT doc_id, "
    "list_transform(range(1, greatest(len(hs) - 3, 0) + 1), "
    "i -> list_min(hs[i:i+3])) AS mins FROM g) "
    "SELECT DISTINCT doc_id, fp FROM "
    "(SELECT doc_id, unnest(mins) AS fp FROM w)")

_NGRAM_JACCARD_ORACLE = (
    "WITH ts AS (SELECT doc_id, list_filter(string_split(text, ' '), "
    "x -> x <> '') AS toks FROM documents), "
    "pos AS (SELECT doc_id, toks, "
    "unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i FROM ts), "
    "sh AS (SELECT DISTINCT doc_id, "
    "array_to_string(toks[i:i+2], ' ') AS shingle FROM pos), "
    "sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id), "
    "freq AS (SELECT shingle FROM sh GROUP BY shingle "
    "HAVING count(*) BETWEEN 2 AND 1000), "
    "pruned AS (SELECT sh.* FROM sh JOIN freq USING (shingle)), "
    "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    "count(*) AS n_common FROM pruned a JOIN pruned b USING (shingle) "
    "WHERE a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id) "
    "SELECT doc_a, doc_b, round(n_common / "
    "(sa.sz + sb.sz - n_common), 3) AS j3 "
    "FROM inter "
    "JOIN sizes sa ON doc_a = sa.doc_id "
    "JOIN sizes sb ON doc_b = sb.doc_id "
    "WHERE n_common / (sa.sz + sb.sz - n_common) >= 0.2")


def oracle_sql() -> dict[str, str]:
    return {
        "explode_spans": oracle_cte(
            'SELECT doc_id, "offset", kind, text, media_ref '
            "FROM interleaved_spans"),
        "media_filter": oracle_cte(
            'SELECT doc_id, "offset", media_ref FROM interleaved_spans '
            "WHERE kind = 'media'"),
        "span_stats": oracle_cte(
            "SELECT doc_id, count(*) AS n_spans, "
            "CAST(sum(CASE WHEN kind='text' THEN 1 ELSE 0 END) AS BIGINT) AS n_text, "
            "CAST(sum(CASE WHEN kind='media' THEN 1 ELSE 0 END) AS BIGINT) AS n_media, "
            "CAST(sum(coalesce(length(text), 0)) AS BIGINT) AS sum_chars "
            "FROM interleaved_spans GROUP BY doc_id"),
        "span_order": oracle_cte(
            'SELECT doc_id, "offset", kind, '
            'CAST(row_number() OVER (PARTITION BY doc_id ORDER BY "offset") '
            "AS BIGINT) AS span_rank FROM interleaved_spans"),
        "media_join": oracle_cte(
            "SELECT s.doc_id, s.media_ref, m.media_type "
            "FROM interleaved_spans s "
            "LEFT JOIN (VALUES ('img','image'),('vid','video'),"
            "('aud','audio')) AS m(scheme, media_type) "
            "ON substr(s.media_ref, 1, 3) = m.scheme "
            "WHERE s.kind = 'media'"),
        "metrics_rollup": oracle_cte(
            "SELECT kind, count(*) AS n_spans, "
            "CAST(sum(coalesce(length(text), 0)) AS BIGINT) AS sum_chars "
            "FROM interleaved_spans GROUP BY ROLLUP(kind)"),
        "exact_dedup": (
            "SELECT md5(text) AS fp, count(*) AS dup_count, "
            "min(doc_id) AS keep_id FROM documents GROUP BY md5(text)"),
        "minhash_signatures": (
            "WITH ts AS (SELECT doc_id, list_filter(string_split(text, ' '), "
            "x -> x <> '') AS toks FROM documents), "
            "pos AS (SELECT doc_id, toks, "
            "unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i FROM ts), "
            "sh AS (SELECT doc_id, array_to_string(toks[i:i+2], ' ') "
            "AS shingle FROM pos) "
            "SELECT doc_id, "
            + ", ".join(
                f"min(md5('{j}:' || shingle)) AS sig_{j}" for j in range(8))
            + " FROM sh GROUP BY doc_id"),
        "token_count": (
            "SELECT doc_id, "
            "CAST(len(list_filter(string_split(text, ' '), "
            "x -> x <> '')) AS INT) AS n_tokens, "
            "CAST(length(text) AS INT) AS n_chars FROM documents"),
        "quality_score": (
            "WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok "
            "FROM documents) "
            "SELECT doc_id, count(*) AS n_tokens, "
            "count(DISTINCT tok) AS vocab, "
            "CAST(floor(sum(length(tok)) * 100.0 / count(*)) AS BIGINT) "
            "AS mean_tok_len_x100, "
            "CAST(floor(count(DISTINCT tok) * 1000.0 / count(*)) AS BIGINT) "
            "AS ttr_x1000 "
            "FROM toks WHERE tok <> '' GROUP BY doc_id"),
        "lang_id": (
            "WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok "
            "FROM documents), "
            "scored AS (SELECT doc_id, "
            "sum(CASE WHEN tok IN ('the','and','of','to','in') THEN 1 ELSE 0 END) AS s_en, "
            "sum(CASE WHEN tok IN ('el','la','de','que','los') THEN 1 ELSE 0 END) AS s_es, "
            "sum(CASE WHEN tok IN ('le','la','et','les','des') THEN 1 ELSE 0 END) AS s_fr, "
            "sum(CASE WHEN tok IN ('der','die','und','das','ist') THEN 1 ELSE 0 END) AS s_de "
            "FROM toks GROUP BY doc_id) "
            "SELECT doc_id, "
            "CASE WHEN greatest(s_en,s_es,s_fr,s_de) = 0 THEN 'und' "
            "WHEN s_en = greatest(s_en,s_es,s_fr,s_de) THEN 'en' "
            "WHEN s_es = greatest(s_en,s_es,s_fr,s_de) THEN 'es' "
            "WHEN s_fr = greatest(s_en,s_es,s_fr,s_de) THEN 'fr' "
            "ELSE 'de' END AS lang_pred, "
            "CAST(greatest(s_en,s_es,s_fr,s_de) AS BIGINT) AS lang_hits "
            "FROM scored"),
        "fingerprint": (
            "SELECT doc_id, substr(md5(text), 1, 8) AS fp8 FROM documents"),
        "lang_dist": (
            "SELECT lang, count(*) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars "
            "FROM documents GROUP BY lang"),
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(floor(sum(l_quantity)) AS BIGINT) AS sum_qty, "
            "CAST(floor(sum(l_extendedprice)) AS BIGINT) AS sum_base_price, "
            "CAST(floor(sum(l_extendedprice * (1 - l_discount))) AS BIGINT) "
            "AS sum_disc_price, "
            "count(*) AS count_order "
            "FROM lineitem WHERE l_shipdate <= '1998-09-02' "
            "GROUP BY l_returnflag, l_linestatus"),
        "top_customers": (
            "SELECT c_custkey, c_name, "
            "CAST(floor(sum(o_totalprice)) AS BIGINT) AS revenue, "
            "count(*) AS n_orders "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_custkey, c_name "
            "ORDER BY revenue DESC, c_custkey LIMIT 10"),
        "region_nation_rollup": (
            "SELECT r_name, n_name, count(*) AS n_suppliers, "
            "CAST(floor(sum(s_acctbal)) AS BIGINT) AS sum_acctbal "
            "FROM supplier "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "GROUP BY ROLLUP(r_name, n_name)"),
        "event_sessions": (
            "WITH gaps AS (SELECT user_id, ts, value, "
            "CASE WHEN epoch(ts) - epoch(lag(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts)) > 1800 THEN 1 ELSE 0 END "
            "AS new_sess FROM events), "
            "sess AS (SELECT user_id, value, "
            "CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM gaps) "
            "SELECT user_id, session_id, count(*) AS n_events, "
            "CAST(floor(sum(value)) AS BIGINT) AS sum_value "
            "FROM sess GROUP BY user_id, session_id"),
        "event_windows": (
            "SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket, "
            "event_type, count(*) AS n_events, "
            "CAST(floor(sum(value)) AS BIGINT) AS sum_value "
            "FROM events GROUP BY 1, 2"),
        "asof_join": (
            "WITH l AS (SELECT event_id, user_id, ts, value FROM events "
            "WHERE event_type = 'purchase'), "
            "r AS (SELECT user_id, ts, value FROM events "
            "WHERE event_type = 'view') "
            "SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us, "
            "epoch_us(r.ts) AS asof_ts_us, "
            "round(r.value, 3) AS asof_value3 "
            "FROM l ASOF LEFT JOIN r "
            "ON l.user_id = r.user_id AND l.ts >= r.ts"),
        "range_join": (
            "WITH p AS (SELECT event_id, value, "
            "CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events), "
            "hrs AS (SELECT DISTINCT CAST(floor(ts_s / 3600) AS BIGINT) "
            "AS h FROM p), "
            "rg AS (SELECT h AS range_id, h * 3600 AS range_start, "
            "h * 3600 + 7199 AS range_end FROM hrs WHERE h % 5 = 0) "
            "SELECT rg.range_id, count(*) AS n_events, "
            "CAST(floor(sum(p.value)) AS BIGINT) AS sum_v "
            "FROM rg JOIN p ON p.ts_s BETWEEN rg.range_start "
            "AND rg.range_end GROUP BY rg.range_id"),
        "regex_tokens": (
            r"SELECT doc_id, CAST(len(regexp_extract_all(text, "
            r"'[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) "
            "AS n_regex_tokens FROM documents"),
        "cosine_dupes": (
            "WITH e AS (SELECT vec_id, embedding FROM embeddings "
            "WHERE vec_id < 300) "
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
            "round(round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4), 3) AS cos3 "
            "FROM e a, e b WHERE a.vec_id < b.vec_id "
            "AND round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.4"),
        "cosine_topk": (
            "WITH q AS (SELECT embedding AS q_emb FROM embeddings "
            "WHERE vec_id = 0) "
            "SELECT vec_id, CAST(row_number() OVER (ORDER BY "
            "list_cosine_similarity(e.embedding, q.q_emb) DESC, vec_id) "
            "AS BIGINT) AS rank "
            "FROM embeddings e, q WHERE vec_id <> 0 "
            "ORDER BY list_cosine_similarity(e.embedding, q.q_emb) DESC, "
            "vec_id LIMIT 10"),
        "cosine_topk_batch": (
            "WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb "
            "FROM embeddings WHERE vec_id IN (0, 7, 42)), "
            "s AS (SELECT q.q_id, e.vec_id, "
            "round(list_cosine_similarity(e.embedding::DOUBLE[], "
            "q.q_emb::DOUBLE[]), 6) AS cos "
            "FROM embeddings e, q WHERE e.vec_id <> q.q_id), "
            "r AS (SELECT q_id, vec_id, row_number() OVER "
            "(PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank "
            "FROM s) "
            "SELECT q_id, vec_id, CAST(rank AS BIGINT) AS rank "
            "FROM r WHERE rank <= 10"),
        # ---- flagship extraction: golden spans materialized from the
        # independent recursive extractor (tests/oracle.py) over the exact
        # sf0.01 synthesis — see tools/make_golden_spans.py
        "extract_doc": (
            'SELECT doc_id, span_idx, kind, text, media_ref, "offset" '
            f"FROM read_parquet('{_FIXTURES}/golden_spans_sf001.parquet')"),
        "extract_exploded": (
            'SELECT doc_id, span_idx, kind, text, media_ref, "offset" '
            f"FROM read_parquet('{_FIXTURES}/golden_spans_sf001.parquet')"),
        "extract_chunked": (
            'SELECT doc_id, span_idx, kind, text, media_ref, "offset" '
            f"FROM read_parquet('{_FIXTURES}/golden_spans_sf001.parquet')"),
        "extract_compat": (
            'SELECT doc_id, span_idx, kind, text, media_ref, "offset" '
            "FROM read_parquet("
            f"'{_FIXTURES}/golden_spans_compat_sf001.parquet')"),
        "extract_fragments": (
            'SELECT doc_id, span_idx, kind, text, media_ref, "offset" '
            "FROM read_parquet("
            f"'{_FIXTURES}/golden_spans_fragment_td_sf001.parquet')"),
        "extract_markdown": (
            "SELECT doc_id, markdown, n_segments, quarantined "
            f"FROM read_parquet('{_FIXTURES}/golden_markdown_sf001"
            ".parquet')"),
        # span-count columns recomputed independently in SQL; kernel
        # token/node/error counts pinned by the out-of-Spark golden
        "doc_parse_stats": oracle_cte(
            "SELECT c.doc_id, c.n_text_spans_in, c.n_media_spans_in, "
            "g.n_tokens, g.n_nodes, g.n_parse_errors, g.error_codes "
            "FROM (SELECT doc_id, "
            "CAST(sum(CASE WHEN kind='text' THEN 1 ELSE 0 END) AS INT) "
            "AS n_text_spans_in, "
            "CAST(sum(CASE WHEN kind='media' THEN 1 ELSE 0 END) AS INT) "
            "AS n_media_spans_in "
            "FROM interleaved_spans GROUP BY doc_id) c "
            f"JOIN read_parquet('{_FIXTURES}/golden_parse_stats_sf001"
            ".parquet') g USING (doc_id)"),
        "doc_metadata": (
            "SELECT doc_id, title, meta_description, canonical_url, lang "
            f"FROM read_parquet('{_FIXTURES}/golden_doc_metadata_sf001"
            ".parquet')"),
        "minhash_lsh_pairs": _LSH_ORACLE,
        "lsh_pairs_megabucket": _LSH_MEGA_ORACLE,
        "subword_tokens": _SUBWORD_ORACLE,
        "bigram_logprob": _BIGRAM_ORACLE,
        "semantic_dedup": "WITH pri AS (SELECT vec_id, embedding, ('0x' || substr(md5('ivf:' || CAST(vec_id AS STRING)), 1, 8))::BIGINT AS p FROM embeddings), cents AS (SELECT vec_id AS centroid_id, embedding AS c_emb FROM pri ORDER BY p, vec_id LIMIT 8), sims AS (SELECT e.vec_id, c.centroid_id, list_cosine_similarity(e.embedding::DOUBLE[], c.c_emb::DOUBLE[]) AS sim FROM embeddings e, cents c), assign AS (SELECT vec_id, centroid_id AS list_id FROM (SELECT vec_id, centroid_id, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, centroid_id DESC) AS rn FROM sims) WHERE rn = 1), e AS (SELECT a.vec_id, a.list_id, b.embedding FROM assign a JOIN embeddings b USING (vec_id)), dropped AS (SELECT DISTINCT b.vec_id FROM e a JOIN e b ON a.list_id = b.list_id AND a.vec_id < b.vec_id WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4) SELECT a.vec_id, a.list_id, d.vec_id IS NULL AS keep FROM assign a LEFT JOIN dropped d USING (vec_id)",
        "semantic_dedup_star": "WITH pri AS (SELECT vec_id, embedding, ('0x' || substr(md5('ivf:' || CAST(vec_id AS STRING)), 1, 8))::BIGINT AS p FROM embeddings), cents AS (SELECT vec_id AS centroid_id, embedding AS c_emb FROM pri ORDER BY p, vec_id LIMIT 8), sims AS (SELECT e.vec_id, c.centroid_id, list_cosine_similarity(e.embedding::DOUBLE[], c.c_emb::DOUBLE[]) AS sim FROM embeddings e, cents c), assign AS (SELECT vec_id, centroid_id AS list_id FROM (SELECT vec_id, centroid_id, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, centroid_id DESC) AS rn FROM sims) WHERE rn = 1), e AS (SELECT a.vec_id, a.list_id, b.embedding FROM assign a JOIN embeddings b USING (vec_id)), ann AS (SELECT vec_id, list_id, embedding, count(*) OVER (PARTITION BY list_id) AS n, min(vec_id) OVER (PARTITION BY list_id) AS hub FROM e), dropped AS (SELECT DISTINCT b.vec_id FROM ann a JOIN ann b ON a.list_id = b.list_id AND a.vec_id < b.vec_id WHERE (a.n <= 40 OR a.vec_id = a.hub) AND round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4) SELECT a.vec_id, a.list_id, d.vec_id IS NULL AS keep FROM assign a LEFT JOIN dropped d USING (vec_id)",
        "classifier_score": "WITH w AS (SELECT i, (('0x' || substr(md5('w:' || CAST(i AS STRING)), 1, 8))::BIGINT % 2000 - 1000) / 1000.0 AS wt FROM range(0, 1024) t(i)), ts AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents), tok AS (SELECT doc_id, unnest(toks) AS t FROM ts), b AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT % 1024 AS i FROM tok), s AS (SELECT doc_id, sum(w.wt) AS tot, count(*) AS n FROM b JOIN w USING (i) GROUP BY doc_id) SELECT d.doc_id, CAST(coalesce(s.n, 0) AS BIGINT) AS n_tokens, CASE WHEN s.n > 0 THEN CAST(floor(round(s.tot / s.n, 6) * 1000) AS BIGINT) END AS score_x1000 FROM documents d LEFT JOIN s USING (doc_id)",
        "mask_runs": "WITH ts AS (SELECT doc_id, list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '') AS toks FROM documents), gr AS (SELECT doc_id, i - 1 AS pos, md5(array_to_string(toks[i:i+7], chr(0))) AS g FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 8 + 2)) AS i FROM ts WHERE len(toks) >= 8)), dup AS (SELECT g FROM gr GROUP BY g HAVING count(DISTINCT doc_id) >= 2), hits AS (SELECT doc_id, list(pos ORDER BY pos) AS hs FROM gr JOIN dup USING (g) GROUP BY doc_id), j AS (SELECT t.doc_id, t.toks, coalesce(h.hs, CAST([] AS BIGINT[])) AS hs FROM ts t LEFT JOIN hits h USING (doc_id)), k AS (SELECT doc_id, toks, list_filter(range(0, len(toks)), i -> len(list_filter(hs, h -> h <= i AND i < h + 8)) = 0) AS keep FROM j) SELECT doc_id, coalesce(array_to_string(list_transform(keep, i -> toks[CAST(i + 1 AS INT)]), ' '), '') AS clean_text, CAST(len(toks) - len(keep) AS BIGINT) AS n_tokens_masked FROM k",
        "shard_manifest": (
            "WITH tc AS (SELECT doc_id, "
            "len(list_filter(string_split(text, ' '), x -> x <> '')) "
            "AS n_tokens FROM documents), "
            "packed AS (SELECT doc_id, n_tokens, "
            "CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "// 512 AS BIGINT) AS shard_id FROM tc) "
            "SELECT shard_id, "
            "CAST(row_number() OVER (PARTITION BY shard_id "
            "ORDER BY doc_id) - 1 AS INT) AS pack_pos, "
            "doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, "
            "CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard_id "
            "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING), 0) AS BIGINT) AS token_offset "
            "FROM packed"),
        "bpe_apply": _bpe_apply_oracle(),
        "frequent_ngrams": "WITH ts AS (SELECT doc_id, list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '') AS toks FROM documents), g AS (SELECT doc_id, array_to_string(toks[i:i+4], ' ') AS ngram FROM (SELECT doc_id, toks, unnest(range(1, greatest(len(toks) - 4, 0) + 1)) AS i FROM ts)) SELECT ngram, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, CAST(count(*) AS BIGINT) AS n_occurrences FROM g GROUP BY ngram HAVING count(*) >= 2 ORDER BY n_occurrences DESC, n_docs DESC, ngram LIMIT 20",
        "hash_split": "WITH h AS (SELECT doc_id, ('0x' || substr(md5('split0:' || CAST(doc_id AS STRING)), 1, 8))::BIGINT % 1000000 AS hv FROM documents) SELECT doc_id, CASE WHEN hv < 900000 THEN 'train' WHEN hv < 950000 THEN 'val' ELSE 'test' END AS split FROM h",
        "mask_runs_char": "WITH t AS (SELECT doc_id, coalesce(text, '') AS tx FROM documents), gr AS (SELECT doc_id, i - 1 AS pos, md5(substr(tx, i, 16)) AS g FROM (SELECT doc_id, tx, unnest(range(1, len(tx) - 16 + 2)) AS i FROM t WHERE len(tx) >= 16)), dup AS (SELECT g FROM gr GROUP BY g HAVING count(DISTINCT doc_id) >= 2), hits AS (SELECT doc_id, list(pos ORDER BY pos) AS hs FROM gr JOIN dup USING (g) GROUP BY doc_id), j AS (SELECT t.doc_id, t.tx, coalesce(h.hs, CAST([] AS BIGINT[])) AS hs FROM t LEFT JOIN hits h USING (doc_id)), k AS (SELECT doc_id, tx, list_filter(range(0, len(tx)), i -> len(list_filter(hs, h -> h <= i AND i < h + 16)) = 0) AS keep FROM j) SELECT doc_id, coalesce(array_to_string(list_transform(keep, i -> substr(tx, CAST(i + 1 AS INT), 1)), ''), '') AS clean_text, CAST(len(tx) - len(keep) AS BIGINT) AS n_chars_masked FROM k",
        "dsir_weights": "WITH ts AS (SELECT doc_id, list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '') AS toks FROM documents), g AS (SELECT doc_id, ('0x' || substr(md5(toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1]), 1, 8))::BIGINT % 256 AS b FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM ts WHERE len(toks) >= 2)), tg AS (SELECT g.b FROM g JOIN documents d USING (doc_id) WHERE d.lang = 'en'), rc AS (SELECT b, count(*) AS rcn FROM g GROUP BY b), tc AS (SELECT b, count(*) AS tcn FROM tg GROUP BY b), tot AS (SELECT (SELECT count(*) FROM g) AS nr, (SELECT count(*) FROM tg) AS nt), w AS (SELECT rc.b, ln((coalesce(tc.tcn, 0) + 1.0) / (tot.nt + 256.0)) - ln((rc.rcn + 1.0) / (tot.nr + 256.0)) AS lw FROM rc LEFT JOIN tc USING (b), tot), s AS (SELECT doc_id, count(*) AS n_grams, sum(lw) AS lw FROM g JOIN w USING (b) GROUP BY doc_id) SELECT d.doc_id, CAST(coalesce(s.n_grams, 0) AS BIGINT) AS n_grams, CASE WHEN s.n_grams > 0 THEN CAST(floor(round(s.lw, 6) * 1000) AS BIGINT) END AS logw_x1000 FROM documents d LEFT JOIN s USING (doc_id)",
        "ppl_buckets": (
            "SELECT b.doc_id, d.lang, b.n_bigrams, b.logprob_x1000, "
            "CAST(ntile(3) OVER (PARTITION BY d.lang "
            "ORDER BY b.logprob_x1000, b.doc_id) AS INT) AS ppl_bucket "
            f"FROM ({_BIGRAM_ORACLE}) b JOIN documents d USING (doc_id)"),
        "chunk_subword": _CHUNK_SUBWORD_ORACLE,
        "media_captions": oracle_cte(
            'SELECT doc_id, "offset", media_ref, caption_before, '
            "caption_after FROM ("
            'SELECT doc_id, "offset", kind, media_ref, '
            "last_value(CASE WHEN kind = 'text' THEN text END "
            "IGNORE NULLS) OVER (PARTITION BY doc_id ORDER BY "
            '"offset" ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) '
            "AS caption_before, "
            "first_value(CASE WHEN kind = 'text' THEN text END "
            "IGNORE NULLS) OVER (PARTITION BY doc_id ORDER BY "
            '"offset" ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) '
            "AS caption_after "
            "FROM interleaved_spans) WHERE kind = 'media'"),
        "ivf_topk_batch": _IVF_BATCH_ORACLE,
        "dup_components": _COMPONENTS_ORACLE,
        # same transitive-closure truth for the large-star/small-star
        # variant — both algorithms must land on identical components
        "dup_components_star": _COMPONENTS_ORACLE,
        "cosine_dupes_lsh": _COSINE_DUPES_LSH_ORACLE,
        "ann_lsh_topk": _ANN_LSH_ORACLE,
        "ivf_topk": _IVF_ORACLE,
        "media_decode": oracle_cte(_MEDIA_ORACLE_BODY),
        "frame_sample": oracle_cte(_FRAME_ORACLE_BODY),
        "resize_plan": oracle_cte(
            _MEDIA_M_CTE
            + ", d AS (SELECT media_ref, modality, "
            "CAST(160 + h % 1920 AS INT) AS width, "
            "CAST(90 + (h >> 8) % 1080 AS INT) AS height FROM m "
            "WHERE modality IN ('image', 'video')) "
            "SELECT media_ref, width, height, "
            "CAST(CASE WHEN height >= width "
            "THEN floor(width * 224 / height) ELSE 224 END AS INT) "
            "AS out_w, "
            "CAST(CASE WHEN height >= width THEN 224 "
            "ELSE floor(height * 224 / width) END AS INT) AS out_h "
            "FROM d"),
        "chunk_docs": (
            "WITH ts AS (SELECT doc_id, list_filter(string_split(text, "
            "' '), x -> x <> '') AS toks FROM documents), "
            "p AS (SELECT doc_id, toks, len(toks) AS n, "
            "unnest(range(0, greatest(CAST(ceil((len(toks) - 40) / 32.0)"
            " AS BIGINT), 0) + 1)) AS i FROM ts) "
            "SELECT doc_id, CAST(i AS INT) AS chunk_idx, "
            "array_to_string(toks[i*32+1 : i*32+40], ' ') AS chunk_text, "
            "CAST(least(n - i*32, 40) AS INT) AS n_tokens "
            "FROM p WHERE least(n - i*32, 40) >= 1"),
        "simhash": _SIMHASH_ORACLE,
        "winnowing": _WINNOWING_ORACLE,
        "scrub_pii": (
            r"SELECT doc_id, "
            r"regexp_replace(regexp_replace(regexp_replace(text, "
            r"'https?://[^\s]+', '<URL>', 'g'), "
            r"'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', "
            r"'<EMAIL>', 'g'), "
            r"'\+?[0-9][0-9()\-\s]{6,}[0-9]', '<PHONE>', 'g') "
            r"AS clean_text, "
            r"CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) "
            r"AS BIGINT) AS n_urls, "
            r"CAST(len(regexp_extract_all(text, "
            r"'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) "
            r"AS BIGINT) AS n_emails, "
            r"CAST(len(regexp_extract_all(text, "
            r"'\+?[0-9][0-9()\-\s]{6,}[0-9]')) AS BIGINT) AS n_phones "
            r"FROM documents"),
        "hash_sample": (
            "SELECT doc_id, lang, n_chars FROM documents "
            "WHERE ('0x' || substr(md5('r2:' || CAST(doc_id AS STRING)), "
            "1, 8))::BIGINT % 1000000 < 250000"),
        "pack_shards": (
            "WITH tc AS (SELECT doc_id, CAST(len(list_filter("
            "string_split(text, ' '), x -> x <> '')) AS INT) AS n_tokens "
            "FROM documents) "
            "SELECT doc_id, n_tokens, "
            "CAST(floor(coalesce(sum(n_tokens) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "/ 2000) AS BIGINT) AS shard_id FROM tc"),
        "kmv_distinct": (
            "WITH h AS (SELECT DISTINCT lang, "
            "('0x' || substr(md5(text), 1, 8))::BIGINT / 4294967296.0 "
            "AS _h FROM documents), "
            "r AS (SELECT lang, _h, row_number() OVER "
            "(PARTITION BY lang ORDER BY _h) AS rk FROM h) "
            "SELECT lang, count(*) AS n_hashed, "
            "CAST(CASE WHEN count(*) < 16 THEN count(*) "
            "ELSE floor(15 / max(_h)) END AS BIGINT) AS est_distinct "
            "FROM r WHERE rk <= 16 GROUP BY lang"),
        "gopher_quality": (
            "WITH t AS (SELECT doc_id, text, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS toks, "
            "string_split(text, chr(10)) AS lines FROM documents), "
            "f AS (SELECT doc_id, "
            "len(toks) AS n_words, "
            "CAST(floor(list_sum(list_transform(toks, "
            "x -> length(x))) * 100 / len(toks)) AS BIGINT) "
            "AS mean_word_len_x100, "
            "len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) "
            "AS n_alpha_words, "
            "len(regexp_extract_all(text, '#')) + "
            "len(regexp_extract_all(text, '\\.\\.\\.')) AS n_symbols, "
            "len(list_filter(lines, l -> l LIKE '•%' OR l LIKE '- %' "
            "OR l LIKE '* %')) AS n_bullet_lines, "
            "len(lines) AS n_lines, "
            "(CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END + "
            "CASE WHEN list_contains(toks, 'be') THEN 1 ELSE 0 END + "
            "CASE WHEN list_contains(toks, 'to') THEN 1 ELSE 0 END + "
            "CASE WHEN list_contains(toks, 'of') THEN 1 ELSE 0 END + "
            "CASE WHEN list_contains(toks, 'and') THEN 1 ELSE 0 END + "
            "CASE WHEN list_contains(toks, 'that') THEN 1 ELSE 0 END + "
            "CASE WHEN list_contains(toks, 'have') THEN 1 ELSE 0 END + "
            "CASE WHEN list_contains(toks, 'with') THEN 1 ELSE 0 END) "
            "AS stop_hits FROM t) "
            "SELECT doc_id, n_words, mean_word_len_x100, n_alpha_words, "
            "n_symbols, n_bullet_lines, n_lines, stop_hits, "
            "(n_words >= 50 AND n_words <= 100000 "
            "AND mean_word_len_x100 >= 300 AND mean_word_len_x100 <= 1000 "
            "AND n_symbols * 10 <= n_words "
            "AND n_bullet_lines * 10 <= n_lines * 9 "
            "AND n_alpha_words * 10 >= n_words * 8 "
            "AND stop_hits >= 2) AS passes FROM f"),
        "unigram_logprob": (
            "WITH toks AS (SELECT doc_id, unnest(list_filter("
            "string_split(text, ' '), x -> x <> '')) AS tok "
            "FROM documents), "
            "v AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok), "
            "n AS (SELECT sum(c) AS n FROM v) "
            "SELECT doc_id, count(*) AS n_tokens, "
            "CAST(floor(round(sum(-ln(c * 1.0 / n.n)) / count(*), 6) "
            "* 1000) AS BIGINT) AS logprob_x1000 "
            "FROM toks t JOIN v USING (tok), n GROUP BY doc_id"),
        "decontaminate": (
            "WITH ts AS (SELECT doc_id, list_filter(string_split(text, ' '), "
            "x -> x <> '') AS toks FROM documents), "
            "pos AS (SELECT doc_id, toks, "
            "unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i FROM ts), "
            "sh AS (SELECT DISTINCT doc_id, "
            "array_to_string(toks[i:i+2], ' ') AS shingle FROM pos), "
            "bench AS (SELECT DISTINCT shingle FROM sh "
            "WHERE doc_id % 50 = 0), "
            "sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh "
            "GROUP BY doc_id), "
            "hits AS (SELECT doc_id, count(*) AS n_contaminated "
            "FROM sh JOIN bench USING (shingle) GROUP BY doc_id) "
            "SELECT s.doc_id, s.n_shingles, "
            "coalesce(h.n_contaminated, 0) AS n_contaminated, "
            "round(coalesce(h.n_contaminated, 0) / s.n_shingles, 3) "
            "AS overlap_frac, "
            "coalesce(h.n_contaminated, 0) >= 1 AS contaminated "
            "FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id"),
        "cap_per_source": (
            # single-window form: provably identical to the two-phase
            # pre-capped plan the Spark side runs (see cap_per_group)
            "WITH pri AS (SELECT doc_id, source, "
            "('0x' || substr(md5('r3cap:' || CAST(doc_id AS STRING)), "
            "1, 8))::BIGINT AS p FROM documents), "
            "r AS (SELECT doc_id, source, row_number() OVER "
            "(PARTITION BY source ORDER BY p, doc_id) AS rn FROM pri) "
            "SELECT doc_id, source FROM r WHERE rn <= 20"),
        "temperature_sample": (
            "WITH c AS (SELECT lang, count(*) AS n FROM documents "
            "GROUP BY lang), "
            "mn AS (SELECT min(n) AS min_n FROM c), "
            "rates AS (SELECT lang, "
            "sqrt(CAST(min_n AS DOUBLE) / n) AS rate FROM c, mn) "
            "SELECT d.doc_id, d.lang FROM documents d "
            "JOIN rates r USING (lang) "
            "WHERE ('0x' || substr(md5('r3temp:' || "
            "CAST(doc_id AS STRING)), 1, 8))::BIGINT % 1000000 "
            "< CAST(floor(rate * 1000000) AS BIGINT)"),
        "repetition": (
            "WITH ts AS (SELECT doc_id, list_filter(string_split(text, ' '), "
            "x -> x <> '') AS toks FROM documents), "
            "g AS (SELECT doc_id, unnest(list_transform("
            "range(1, greatest(len(toks) - 3, 0) + 1), "
            "i -> array_to_string(toks[i:i+3], ' '))) AS g FROM ts) "
            "SELECT doc_id, count(*) AS n_grams, "
            "count(DISTINCT g) AS n_distinct_grams, "
            "CAST(floor(1000 * (1 - count(DISTINCT g) * 1.0 / count(*))) "
            "AS BIGINT) AS rep_x1000 "
            "FROM g GROUP BY doc_id"),
        "entropy": (
            "WITH toks AS (SELECT doc_id, "
            "unnest(list_filter(string_split(text, ' '), x -> x <> '')) "
            "AS tok FROM documents), "
            "freqs AS (SELECT doc_id, tok, count(*) AS c FROM toks "
            "GROUP BY doc_id, tok), "
            "tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n "
            "FROM freqs GROUP BY doc_id) "
            "SELECT f.doc_id, max(t.n) AS n_tokens, "
            "CAST(floor(round(sum(-(c * 1.0 / t.n) * ln(c * 1.0 / t.n)), 6)"
            " * 1000) AS BIGINT) AS entropy_x1000 "
            "FROM freqs f JOIN tot t ON f.doc_id = t.doc_id "
            "GROUP BY f.doc_id"),
        "json_meta": (
            "WITH j AS (SELECT doc_id, to_json(struct_pack("
            "lang := lang, n := CAST(n_chars AS BIGINT), "
            "source := source)) AS meta FROM documents) "
            "SELECT doc_id, meta, "
            "json_extract_string(meta, '$.lang') AS lang_x, "
            "CAST(json_extract(meta, '$.n') AS BIGINT) AS n_x, "
            "json_extract_string(meta, '$.source') AS source_x FROM j"),
        "ngram_jaccard": _NGRAM_JACCARD_ORACLE,
        "tfidf_top": (
            "WITH toks AS (SELECT doc_id, unnest(list_filter("
            "string_split(text, ' '), x -> x <> '')) AS term "
            "FROM documents), "
            "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
            "GROUP BY doc_id, term), "
            "df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks "
            "GROUP BY term), "
            "nd AS (SELECT count(DISTINCT doc_id) AS n_docs "
            "FROM documents), "
            "scored AS (SELECT tf.doc_id, tf.term, "
            "tf.tf * ln((nd.n_docs + 1) * 1.0 / (df.df + 1)) AS score "
            "FROM tf JOIN df USING (term), nd), "
            "ranked AS (SELECT doc_id, term, score, row_number() OVER "
            "(PARTITION BY doc_id ORDER BY score DESC, term) AS rank "
            "FROM scored) "
            "SELECT doc_id, term, CAST(rank AS BIGINT) AS rank, "
            "CAST(floor(round(score, 6) * 1000) AS BIGINT) AS score_x1000 "
            "FROM ranked WHERE rank <= 3"),
        "length_percentiles": (
            "SELECT lang, count(*) AS n_docs, "
            "CAST(floor(round(quantile_cont(n_chars, 0.5), 6) * 10) "
            "AS BIGINT) AS p50_x10, "
            "CAST(floor(round(quantile_cont(n_chars, 0.9), 6) * 10) "
            "AS BIGINT) AS p90_x10, "
            "CAST(floor(round(quantile_cont(n_chars, 0.99), 6) * 10) "
            "AS BIGINT) AS p99_x10 "
            "FROM documents GROUP BY lang"),
        "para_filter_common": (
            "WITH ts AS (SELECT doc_id, list_filter(string_split(text, ' '), "
            "x -> x <> '') AS toks FROM documents), "
            "p AS (SELECT doc_id, toks, unnest(range(0, "
            "CAST(greatest(floor((len(toks) - 1) / 10.0), 0) AS BIGINT) + 1"
            ")) AS i FROM ts), "
            "paras AS (SELECT doc_id, CAST(i AS INT) AS para_idx, "
            "array_to_string(toks[i*10+1 : i*10+10], ' ') AS para FROM p), "
            "ne AS (SELECT * FROM paras WHERE length(para) >= 1), "
            "common AS (SELECT md5(para) AS fp FROM ne "
            "GROUP BY md5(para) HAVING count(DISTINCT doc_id) >= 2), "
            "kept AS (SELECT ne.* FROM ne "
            "WHERE md5(para) NOT IN (SELECT fp FROM common)), "
            "ka AS (SELECT doc_id, string_agg(para, chr(10) || chr(10) "
            "ORDER BY para_idx) AS clean_text, count(*) AS n_kept "
            "FROM kept GROUP BY doc_id), "
            "tot AS (SELECT doc_id, count(*) AS n_paras FROM ne "
            "GROUP BY doc_id) "
            "SELECT t.doc_id, t.n_paras, "
            "CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept, "
            "CAST(t.n_paras - coalesce(k.n_kept, 0) AS BIGINT) "
            "AS n_dropped, "
            "substr(md5(coalesce(k.clean_text, '')), 1, 8) AS fp8 "
            "FROM tot t LEFT JOIN ka k USING (doc_id)"),
        "nfc_normalize": (
            "WITH s AS (SELECT doc_id, text || ' cafe' || chr(769) || ' ' "
            "|| chr(8491) || ' A' || chr(778) AS raw FROM documents), "
            "n AS (SELECT doc_id, raw, nfc_normalize(raw) AS norm FROM s) "
            "SELECT doc_id, CAST(length(raw) AS BIGINT) AS n_chars_raw, "
            "CAST(length(norm) AS BIGINT) AS n_chars_nfc, "
            "substr(md5(norm), 1, 8) AS fp8 FROM n"),
        "para_dedup": (
            "WITH ts AS (SELECT doc_id, list_filter(string_split(text, ' '), "
            "x -> x <> '') AS toks FROM documents), "
            "p AS (SELECT doc_id, toks, unnest(range(0, "
            "CAST(greatest(floor((len(toks) - 1) / 10.0), 0) AS BIGINT) + 1"
            ")) AS i FROM ts), "
            "paras AS (SELECT doc_id, CAST(i AS INT) AS para_idx, "
            "array_to_string(toks[i*10+1 : i*10+10], ' ') AS para FROM p), "
            "ne AS (SELECT * FROM paras WHERE length(para) >= 1), "
            "ranked AS (SELECT doc_id, para_idx, para, row_number() OVER "
            "(PARTITION BY md5(para) ORDER BY doc_id, para_idx) AS rn "
            "FROM ne), "
            "kept AS (SELECT doc_id, para_idx, para FROM ranked "
            "WHERE rn = 1), "
            "ka AS (SELECT doc_id, string_agg(para, chr(10) || chr(10) "
            "ORDER BY para_idx) AS clean_text, count(*) AS n_kept "
            "FROM kept GROUP BY doc_id), "
            "tot AS (SELECT doc_id, count(*) AS n_paras FROM ne "
            "GROUP BY doc_id) "
            "SELECT t.doc_id, t.n_paras, "
            "CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept, "
            "CAST(t.n_paras - coalesce(k.n_kept, 0) AS BIGINT) "
            "AS n_dropped, "
            "substr(md5(coalesce(k.clean_text, '')), 1, 8) AS fp8 "
            "FROM tot t LEFT JOIN ka k USING (doc_id)"),
        # clean_corpus = SQL pipeline over the golden extraction spans
        "clean_corpus": (
            "WITH spans AS (SELECT * FROM read_parquet("
            f"'{_FIXTURES}/golden_spans_sf001.parquet')), "
            "doc_text AS (SELECT doc_id, "
            "nfc_normalize(string_agg(text, ' ' ORDER BY span_idx)) "
            "AS clean_text "
            "FROM spans WHERE kind = 'text' GROUP BY doc_id), "
            "scored AS (SELECT doc_id, clean_text, "
            "CAST(len(string_split(clean_text, ' ')) AS INT) AS n_tokens "
            "FROM doc_text), "
            "ranked AS (SELECT doc_id, n_tokens, "
            "substr(md5(clean_text), 1, 8) AS fp8, "
            "row_number() OVER (PARTITION BY md5(clean_text) "
            "ORDER BY doc_id) AS rn FROM scored WHERE n_tokens >= 5) "
            "SELECT doc_id, n_tokens, fp8 FROM ranked WHERE rn = 1"),
    }


if __name__ == "__main__":
    from html_qt_spark.plans.session import get_spark

    spark = get_spark(cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    df = entry(spark)
    print("entry rows:", df.count())
    df.show(10, truncate=60)
