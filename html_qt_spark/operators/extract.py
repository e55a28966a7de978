"""Spark extraction operators: the vectorized Arrow path for the kernel.

Two physical strategies for the same logical op (BASELINE.json north_star:
"batch-tokenize raw HTML bytes ... emit ordered (kind,text,media_ref,offset)
spans per document"):

``extract_spans_doc``  — document-at-a-time ``mapInPandas``.  ZERO shuffles:
    each input row (doc_id, spans) maps to its output spans inside one Arrow
    batch.  This is the default path; at 10^12 docs the job is then scan →
    narrow map → write, and scales linearly with executors.

``extract_spans_exploded`` — span-at-a-time for skew: mega-documents whose
    spans are many/huge get their *spans* spread across tasks (explode is
    narrow), extraction runs per HTML fragment, and a single window restores
    per-document span numbering.  One shuffle (the window) buys per-span
    parallelism — use when doc-size skew stalls stragglers (SURVEY.md §4.2:
    value-computation skew AQE cannot see).

Both run the same pure-Python kernel (html_qt_spark.kernel) inside Arrow
batches — no per-row Python UDFs (input_hint mandate).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

OUT_FIELDS = "doc_id string, span_idx int, kind string, text string, media_ref string, offset int"

OUT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("span_idx", T.IntegerType()),
    T.StructField("kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("offset", T.IntegerType()),
])

_FRAGMENT_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("media_ref", T.StringType()),
]))


QUARANTINE_KIND = "__quarantine__"

# extraction thresholds of the exploded path (kept in ONE place: the
# vectorized batch path and its row-loop fallback must apply the same
# values, or output would depend on which physical path a batch took)
_EXPLODED_MIN_WORDS = 1
_EXPLODED_MAX_LINK_DENSITY = 0.5


def extract_spans_doc(df: DataFrame, *, reference_compat: bool = False,
                      max_link_density: float = 0.5,
                      min_words: int = 1,
                      max_span_bytes: int | None = None,
                      fragment_context: str | None = None,
                      memoize_spans: int = 0) -> DataFrame:
    """(doc_id, spans) → (doc_id, span_idx, kind, text, media_ref, offset).

    Narrow transformation: no shuffle, no driver round-trip.  Input text
    spans run through the fused tokenize→tree→extract kernel; media spans
    pass through at their document position.

    ``memoize_spans``: per-task cache of up to N extraction results
    keyed by the exact span bytes (default 0 = off).  In real crawls the
    nav/footer/banner spans of a site are BYTE-IDENTICAL across its
    pages (the same repetition paragraph-dedup exploits downstream), so
    a bounded memo turns those re-parses into dict hits.  Extraction is
    a pure function of (html, flags) — memoization cannot change
    results, which tests/test_spark_pipeline.py pins by equality.  Off
    by default so benchmarks measure parsing, not caching.

    ``fragment_context``: parse each text span with innerHTML semantics
    as the contents of that context element (WHATWG 13.4) — a crawl
    storing non-document snippets (table cells, option lists, svg
    islands) extracts them in their real context instead of through the
    full-document state machine.  Threads straight to the kernel
    (kernel/extractor.py::extract_html).

    Poison-pill policy (engine version of the reference's fatal
    no-progress guard, html-qt/htmltokenizer.cpp:66-80, made non-fatal —
    a 10^12-doc job must not die on one doc): a span larger than
    ``max_span_bytes`` or a kernel exception quarantines the DOCUMENT
    into rows with kind=QUARANTINE_KIND (reason in ``text``) instead of
    failing the task.
    """

    def process(batches):
        # import inside the worker so the kernel ships via --py-files
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from html_qt_spark.kernel.extractor import extract_html
        from html_qt_spark.kernel.trivialbatch import (
            filter_blocks,
            vec_trivial,
        )

        memo: dict[str, list] | None = {} if memoize_spans else None
        # the vectorized batch path (guide §4.2) handles plain document
        # parsing; every special mode keeps the row loop
        vec_enabled = (not reference_compat and fragment_context is None
                       and not memoize_spans)

        def vec_batch(rb):
            """Arrow-native batch extraction; None -> use the row loop.

            Only the rare python-path spans (outside the trivial
            grammar) and quarantine messages are materialized as Python
            strings; everything else moves by pyarrow take/concat over
            the input buffers.  Output row order is grouped by span
            category — the operator's contract orders spans via the
            explicit span_idx column, which is computed per document
            exactly as the row loop counts it."""
            dk, dt, dr, do = (rb.column(1), rb.column(2),
                              rb.column(3), rb.column(4))
            if not (pa.types.is_list(dk.type) and pa.types.is_list(dt.type)
                    and pa.types.is_list(dr.type)
                    and pa.types.is_list(do.type)):
                return None
            if not (pa.types.is_string(dt.type.value_type)
                    and pa.types.is_string(dk.type.value_type)
                    and pa.types.is_string(dr.type.value_type)):
                return None
            if dk.null_count or dt.null_count or dr.null_count \
                    or do.null_count:
                return None  # null span lists: row loop handles them
            offs = dk.offsets.to_numpy().astype(np.int64)
            if not (np.array_equal(offs, dt.offsets.to_numpy())
                    and np.array_equal(offs, dr.offsets.to_numpy())
                    and np.array_equal(offs, do.offsets.to_numpy())):
                return None  # ragged struct-of-lists: row loop
            lo, hi = int(offs[0]), int(offs[-1])
            kv = dk.values.slice(lo, hi - lo)
            tvv = dt.values.slice(lo, hi - lo)
            rvv = dr.values.slice(lo, hi - lo)
            ovv = do.values.slice(lo, hi - lo)
            if ovv.null_count:
                return None  # null offsets: to_numpy below would mangle
            offs = offs - lo
            n_docs = rb.num_rows
            n_spans = hi - lo
            counts = np.diff(offs)
            span_doc = np.repeat(np.arange(n_docs), counts)
            ov_np = ovv.to_numpy(zero_copy_only=False).astype(np.int32)

            media = pc.fill_null(pc.equal(kv, "media"), False).to_numpy(
                zero_copy_only=False)
            text_ok = pc.fill_null(pc.not_equal(tvv, ""), False).to_numpy(
                zero_copy_only=False) & ~media
            if max_span_bytes:
                tlens = pc.fill_null(pc.utf8_length(tvv), 0).to_numpy(
                    zero_copy_only=False)
                oversize = text_ok & (tlens > max_span_bytes)
            else:
                oversize = np.zeros(n_spans, dtype=bool)

            vec = vec_trivial(tvv, min_words=min_words,
                              max_link_density=max_link_density)
            if vec is None:
                return None
            accepted, norm_kept, kept_span = vec
            accepted = accepted & text_ok & ~oversize
            # vec_trivial classified EVERY value (even media-span text);
            # drop blocks of spans the category masks just rejected
            norm_kept, kept_span, within_all = filter_blocks(
                norm_kept, kept_span, accepted)

            # oversize quarantines are known before any extraction; the
            # row loop stops a doc at its first failure, so spans after
            # a known failure need no python work (their rows would be
            # discarded) — spans BEFORE it still run, and their own
            # earlier exception would win the quarantine message
            fails: dict[int, str] = {}
            for j in np.flatnonzero(oversize):
                # codepoint length comes from the vectorized scan above —
                # never materialize the (by definition huge) span itself
                fails[int(j)] = f"ValueError:oversize-span:{int(tlens[j])}"
            first_fail = np.full(n_docs, n_spans + 1, dtype=np.int64)
            for j in fails:
                d = int(span_doc[j])
                first_fail[d] = min(first_fail[d], j)

            # python residue: outside the trivial grammar
            py_mask = text_ok & ~accepted & ~oversize
            py_res: dict[int, list] = {}
            py_idx = np.flatnonzero(
                py_mask & (np.arange(n_spans) < first_fail[span_doc]))
            if len(py_idx):
                for j, html in zip(
                        py_idx,
                        pc.take(tvv, pa.array(py_idx)).to_pylist()):
                    try:
                        py_res[int(j)] = extract_html(
                            html, reference_compat=reference_compat,
                            max_link_density=max_link_density,
                            min_words=min_words,
                            fragment_context=fragment_context)
                    except Exception as exc:  # noqa: BLE001 — poison pill
                        fails[int(j)] = f"{type(exc).__name__}:{exc}"[:512]

            # quarantine: first failing span (in document order) wins;
            # the whole document collapses to one quarantine row
            q_doc: dict[int, str] = {}
            for j in sorted(fails):
                d = int(span_doc[j])
                if d not in q_doc:
                    q_doc[d] = fails[j]
            doc_ok = np.ones(n_docs, dtype=bool)
            if q_doc:
                doc_ok[list(q_doc)] = False

            # per-span output counts -> per-doc running span_idx base
            n_out = np.zeros(n_spans, dtype=np.int64)
            n_out[media] = 1
            if len(kept_span):
                n_out += np.bincount(kept_span, minlength=n_spans)
            for j, res in py_res.items():
                n_out[j] = len(res)
            n_out[~doc_ok[span_doc]] = 0
            c_excl = np.concatenate(([0], np.cumsum(n_out)[:-1]))
            doc_base = np.concatenate(
                ([0], np.cumsum(n_out)))[offs[:-1]]
            base = c_excl - doc_base[span_doc]

            # media rows
            jm = np.flatnonzero(media & doc_ok[span_doc])
            jm_pa = pa.array(jm)
            # vec rows (drop blocks of quarantined docs; per-span
            # ordinals survive whole-span filtering unchanged)
            if len(kept_span):
                vkeep = doc_ok[span_doc[kept_span]]
                ks = kept_span[vkeep]
                within = within_all[vkeep]
                vec_text = pc.filter(norm_kept, pa.array(vkeep))
                if isinstance(vec_text, pa.ChunkedArray):
                    vec_text = vec_text.combine_chunks()
            else:
                ks = np.empty(0, np.int64)
                vec_text = pa.array([], pa.string())
                within = np.empty(0, np.int64)
            # python rows
            p_doc: list[int] = []
            p_idx: list[int] = []
            p_kind: list[str] = []
            p_text: list[str | None] = []
            p_ref: list[str | None] = []
            p_off: list[int] = []
            for j, res in py_res.items():
                if not doc_ok[span_doc[j]]:
                    continue
                b = int(base[j])
                d = int(span_doc[j])
                o = int(ov_np[j])
                for i, (k, t, m) in enumerate(res):
                    p_doc.append(d)
                    p_idx.append(b + i)
                    p_kind.append(k)
                    p_text.append(t)
                    p_ref.append(m)
                    p_off.append(o)
            nq = len(q_doc)
            q_docs = sorted(q_doc)

            nm, nv = len(jm), len(ks)
            doc_sel = np.concatenate([
                span_doc[jm], span_doc[ks],
                np.asarray(p_doc, dtype=np.int64),
                np.asarray(q_docs, dtype=np.int64)])
            str_ty = pa.string()
            text_col = pa.concat_arrays([
                pc.take(tvv, jm_pa).cast(str_ty),
                vec_text.cast(str_ty),
                pa.array(p_text, str_ty),
                pa.array([q_doc[d] for d in q_docs], str_ty)])
            ref_col = pa.concat_arrays([
                pc.take(rvv, jm_pa).cast(str_ty),
                pa.nulls(nv, str_ty),
                pa.array(p_ref, str_ty),
                pa.nulls(nq, str_ty)])
            kind_col = pa.array(
                ["media"] * nm + ["text"] * nv + p_kind
                + [QUARANTINE_KIND] * nq, str_ty)
            idx_col = pa.array(np.concatenate([
                base[jm], base[ks] + within,
                np.asarray(p_idx, dtype=np.int64),
                np.zeros(nq, np.int64)]).astype(np.int32), pa.int32())
            off_col = pa.array(np.concatenate([
                ov_np[jm], ov_np[ks],
                np.asarray(p_off, dtype=np.int64),
                np.zeros(nq, np.int64)]).astype(np.int32), pa.int32())
            doc_col = pc.take(rb.column(0), pa.array(doc_sel)).cast(str_ty)
            return pa.RecordBatch.from_arrays(
                [doc_col, idx_col, kind_col, text_col, ref_col, off_col],
                names=["doc_id", "span_idx", "kind", "text",
                       "media_ref", "offset"])

        def extract_cached(html: str) -> list:
            if memo is None:
                return extract_html(
                    html, reference_compat=reference_compat,
                    max_link_density=max_link_density,
                    min_words=min_words,
                    fragment_context=fragment_context)
            spans = memo.get(html)
            if spans is None:
                spans = extract_html(
                    html, reference_compat=reference_compat,
                    max_link_density=max_link_density,
                    min_words=min_words,
                    fragment_context=fragment_context)
                if len(memo) >= memoize_spans:
                    memo.clear()  # bounded: flush-on-full beats LRU bookkeeping
                memo[html] = spans
            return spans

        str_t, int_t = pa.string(), pa.int32()
        for rb in batches:
            if vec_enabled:
                out = vec_batch(rb)
                if out is not None:
                    yield out
                    continue
            doc_ids: list[str] = []
            span_idxs: list[int] = []
            kinds: list[str] = []
            texts: list[str | None] = []
            refs: list[str | None] = []
            offsets: list[int] = []

            def emit(doc_id, idx, kind, text, ref, offset) -> None:
                doc_ids.append(doc_id)
                span_idxs.append(idx)
                kinds.append(kind)
                texts.append(text)
                refs.append(ref)
                offsets.append(offset)

            for doc_id, s_kinds, s_texts, s_refs, s_offsets in zip(
                    rb.column(0).to_pylist(), rb.column(1).to_pylist(),
                    rb.column(2).to_pylist(), rb.column(3).to_pylist(),
                    rb.column(4).to_pylist()):
                idx = 0
                if s_kinds is None:
                    continue
                mark = len(doc_ids)
                try:
                    for kind, html, ref, offset in zip(
                            s_kinds, s_texts, s_refs, s_offsets):
                        if kind == "media":
                            if isinstance(html, (bytes, bytearray)):
                                html = bytes(html).decode("utf-8", "replace")
                            emit(doc_id, idx, "media", html, ref, offset)
                            idx += 1
                            continue
                        if not html:
                            continue
                        if max_span_bytes and len(html) > max_span_bytes:
                            raise ValueError(
                                f"oversize-span:{len(html)}")
                        for k, t, m in extract_cached(html):
                            emit(doc_id, idx, k, t, m, offset)
                            idx += 1
                except Exception as exc:  # noqa: BLE001 — poison pill
                    del doc_ids[mark:], span_idxs[mark:], kinds[mark:]
                    del texts[mark:], refs[mark:], offsets[mark:]
                    emit(doc_id, 0, QUARANTINE_KIND,
                         f"{type(exc).__name__}:{exc}"[:512], None, 0)
            yield pa.RecordBatch.from_arrays(
                [pa.array(doc_ids, str_t), pa.array(span_idxs, int_t),
                 pa.array(kinds, str_t), pa.array(texts, str_t),
                 pa.array(refs, str_t), pa.array(offsets, int_t)],
                names=["doc_id", "span_idx", "kind", "text",
                       "media_ref", "offset"])

    # Flatten array<struct> into four parallel primitive arrays BEFORE the
    # Arrow boundary: Arrow conversion of array<struct> builds one Python
    # dict per span (measured ~2.5x the whole kernel cost); four primitive
    # list columns convert as flat buffers.  JVM-side projection, still
    # zero shuffles.  mapInArrow (not mapInPandas): the kernel loop needs
    # plain Python lists, so the pandas Series/Block layer in between is
    # pure overhead on both sides of the boundary.
    flat = df.select(
        "doc_id",
        F.col("spans.kind").alias("_kinds"),
        F.col("spans.text").alias("_texts"),
        F.col("spans.media_ref").alias("_refs"),
        F.col("spans.offset").alias("_offsets"),
    )
    return flat.mapInArrow(process, schema=OUT_SCHEMA)


@F.pandas_udf(_FRAGMENT_SCHEMA)
def _extract_fragment(html: pd.Series) -> pd.Series:
    """HTML fragment → array<struct<kind,text,media_ref>> (Arrow-batched).

    Poison-pill: a kernel exception yields one QUARANTINE_KIND entry for
    the fragment instead of failing the task (same policy as the
    doc-mode path)."""
    from html_qt_spark.kernel.extractor import extract_html

    out = []
    for doc in html:
        if not doc:
            out.append([])
            continue
        try:
            out.append([
                {"kind": k, "text": t, "media_ref": m}
                for k, t, m in extract_html(doc)
            ])
        except Exception as exc:  # noqa: BLE001 — poison pill
            out.append([{
                "kind": QUARANTINE_KIND,
                "text": f"{type(exc).__name__}:{exc}"[:512],
                "media_ref": None,
            }])
    return pd.Series(out)


DOC_STATS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("n_text_spans_in", T.IntegerType()),
    T.StructField("n_media_spans_in", T.IntegerType()),
    T.StructField("n_tokens", T.IntegerType()),
    T.StructField("n_nodes", T.IntegerType()),
    T.StructField("n_parse_errors", T.IntegerType()),
    # '|'-joined sorted distinct codes: a metrics table carries scalar
    # columns so downstream sort/compare/export tooling never chokes on
    # list cells (array<string> broke the correctness harness in r1)
    T.StructField("error_codes", T.StringType()),
])


MARKDOWN_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("markdown", T.StringType()),
    T.StructField("n_segments", T.IntegerType()),
    T.StructField("quarantined", T.BooleanType()),
])


_MD_SPAN_SCHEMA = T.StructType([
    T.StructField("md", T.StringType()),
    T.StructField("err", T.StringType()),
])


@F.pandas_udf(_MD_SPAN_SCHEMA)
def _md_span(html: pd.Series) -> pd.DataFrame:
    """One HTML span → (markdown, err) — Arrow-batched, per-span
    poison-pill (err carries the quarantine message)."""
    from html_qt_spark.kernel.markdown import render_markdown
    from html_qt_spark.kernel.treebuilder import parse

    mds: list[str | None] = []
    errs: list[str | None] = []
    for doc in html:
        if not doc:
            mds.append(None)
            errs.append(None)
            continue
        try:
            mds.append(render_markdown(parse(doc)))
            errs.append(None)
        except Exception as exc:  # noqa: BLE001 — poison pill
            mds.append(None)
            errs.append(f"{type(exc).__name__}:{exc}"[:512])
    return pd.DataFrame({"md": mds, "err": errs})


def extract_markdown_exploded(df_exploded: DataFrame) -> DataFrame:
    """Skew path for Markdown rendering over the exploded span table
    (doc_id, offset, kind, text, media_ref): per-span rendering in a
    narrow pandas_udf, then ONE groupBy(doc_id) shuffle reassembles the
    document in offset order — same output contract as
    :func:`extract_markdown_doc` (equality pinned by
    tests/test_markdown.py).  Mega-documents parallelize across spans;
    a quarantined span quarantines its document (first failing span's
    message wins, n_segments=0), matching the doc-mode poison pill.
    """
    r = df_exploded.withColumn("_r", _md_span("text"))
    block = (F.when(F.col("kind") == "media",
                    F.when(F.col("media_ref").isNotNull(),
                           F.concat(F.lit("![]("), "media_ref",
                                    F.lit(")"))))
             .otherwise(F.col("_r.md")))
    rows = r.select(
        "doc_id", "offset",
        block.alias("_block"),
        F.col("_r.err").alias("_err"))
    agg = (rows.groupBy("doc_id")
           .agg(F.min(F.when(F.col("_err").isNotNull(),
                             F.struct("offset", "_err"))).alias("_q"),
                F.sort_array(F.collect_list(
                    F.when(F.col("_block").isNotNull()
                           & (F.col("_block") != ""),
                           F.struct("offset", "_block")))).alias("_bs")))
    quarantined = F.col("_q").isNotNull()
    return agg.select(
        "doc_id",
        F.when(quarantined, F.col("_q._err"))
        .otherwise(F.concat_ws("\n\n", F.col("_bs._block")))
        .alias("markdown"),
        F.when(quarantined, F.lit(0))
        .otherwise(F.size("_bs")).cast("int").alias("n_segments"),
        quarantined.alias("quarantined"))


def extract_markdown_doc(df: DataFrame, *,
                         max_span_bytes: int | None = None) -> DataFrame:
    """(doc_id, spans) → (doc_id, markdown, n_segments, quarantined):
    the structure-preserving Markdown rendering of each document
    (kernel/markdown.py spec) — headings, lists, tables, code fences,
    links/images — with media spans interleaved at their document
    position as image/link blocks.

    Same execution shape as :func:`extract_spans_doc`: narrow
    mapInPandas over four flattened primitive arrays, zero shuffle,
    document-level poison-pill quarantine.  One output row per document.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from html_qt_spark.kernel.markdown import render_markdown
        from html_qt_spark.kernel.treebuilder import parse

        for pdf in batches:
            doc_ids: list[str] = []
            mds: list[str | None] = []
            n_segments: list[int] = []
            quarantined: list[bool] = []
            for doc_id, s_kinds, s_texts, s_refs in zip(
                    pdf["doc_id"], pdf["_kinds"], pdf["_texts"],
                    pdf["_refs"]):
                if s_kinds is None:
                    continue
                blocks: list[str] = []
                try:
                    for kind, html, ref in zip(s_kinds, s_texts, s_refs):
                        if kind == "media":
                            if ref:
                                blocks.append(f"![]({ref})")
                            continue
                        if not html:
                            continue
                        if max_span_bytes and len(html) > max_span_bytes:
                            raise ValueError(f"oversize-span:{len(html)}")
                        md = render_markdown(parse(html))
                        if md:
                            blocks.append(md)
                    doc_ids.append(doc_id)
                    mds.append("\n\n".join(blocks))
                    n_segments.append(len(blocks))
                    quarantined.append(False)
                except Exception as exc:  # noqa: BLE001 — poison pill
                    doc_ids.append(doc_id)
                    mds.append(f"{type(exc).__name__}:{exc}"[:512])
                    n_segments.append(0)
                    quarantined.append(True)
            yield pd.DataFrame({
                "doc_id": doc_ids, "markdown": mds,
                "n_segments": n_segments, "quarantined": quarantined,
            })

    flat = df.select(
        "doc_id",
        F.col("spans.kind").alias("_kinds"),
        F.col("spans.text").alias("_texts"),
        F.col("spans.media_ref").alias("_refs"),
    )
    return flat.mapInPandas(process, schema=MARKDOWN_SCHEMA)


def doc_parse_stats(df: DataFrame) -> DataFrame:
    """(doc_id, spans) → per-document parse metrics.

    The reference records errors as ParserErrorToken rows interleaved in
    the token stream (html-qt/htmltokenizer.cpp:94-101); the engine
    surfaces them as a metrics table instead (SURVEY.md §2.2): token
    count, DOM node count, parse-error count + distinct codes per doc.
    Narrow map, same zero-shuffle shape as extraction.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from html_qt_spark.kernel.tokenizer import HTMLTokenizer
        from html_qt_spark.kernel.treebuilder import TreeBuilder

        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "n_text_spans_in",
                                    "n_media_spans_in", "n_tokens",
                                    "n_nodes", "n_parse_errors",
                                    "error_codes")}
            for doc_id, s_kinds, s_texts in zip(
                    pdf["doc_id"], pdf["_kinds"], pdf["_texts"]):
                n_text = n_media = n_tokens = n_nodes = 0
                codes: set[str] = set()
                n_errs = 0
                if s_kinds is not None:
                    for kind, html in zip(s_kinds, s_texts):
                        if kind == "media":
                            n_media += 1
                            continue
                        n_text += 1
                        if not html:
                            continue
                        if isinstance(html, (bytes, bytearray)):
                            from html_qt_spark.kernel.encoding import (
                                decode_html)
                            html = decode_html(bytes(html))
                        tk = HTMLTokenizer(html)
                        tokens, errors = tk.run()
                        n_tokens += len(tokens)
                        tb = TreeBuilder(collect_errors=True)
                        tb.process(tokens)
                        n_nodes += len(tb.tag) - 1
                        n_errs += len(errors) + len(tb.errors)
                        codes.update(c for c, _ in errors)
                        codes.update(tb.errors)
                rows["doc_id"].append(doc_id)
                rows["n_text_spans_in"].append(n_text)
                rows["n_media_spans_in"].append(n_media)
                rows["n_tokens"].append(n_tokens)
                rows["n_nodes"].append(n_nodes)
                rows["n_parse_errors"].append(n_errs)
                rows["error_codes"].append("|".join(sorted(codes)))
            yield pd.DataFrame(rows)

    flat = df.select(
        "doc_id",
        F.col("spans.kind").alias("_kinds"),
        F.col("spans.text").alias("_texts"),
    )
    return flat.mapInPandas(process, schema=DOC_STATS_SCHEMA)


_EXPLODED_MID_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("offset", T.IntegerType()),
    T.StructField("_chunk", T.IntegerType()),
    T.StructField("_inner", T.IntegerType()),
    T.StructField("kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("media_ref", T.StringType()),
])

# block-start tags are safe HTML cut points for the extractor: a block tag
# always flushes the open text block, so no emitted text span straddles a
# cut (chunk-extraction == whole-extraction on block-structured content)
_BLOCK_CUT_RX = (
    r"(?=<(?:p|div|h[1-6]|section|article|table|ul|ol|li|tr|blockquote|"
    r"header|footer|nav|aside|main|pre)[\s>/])")
# contexts where a literal "<p" inside them is NOT a real tag — a span
# containing any of these openers is never split (correctness over
# parallelism; the poison-pill/oversize quarantine still bounds it)
_UNSAFE_SPLIT_RX = (
    r"(?i)<(?:script|style|textarea|title|xmp|pre|iframe|noembed|"
    r"noframes|plaintext|svg|math)[\s>/]|<!--|<!\[CDATA\[")


def chunk_split_exploded(df_exploded: DataFrame, *,
                         threshold_bytes: int = 1 << 20,
                         target_chunk_bytes: int = 256 << 10) -> DataFrame:
    """Split oversized text spans into chunk rows (SURVEY §4.2 mega-doc
    path): one 1-GB span otherwise lands on ONE task — value-computation
    skew AQE cannot see, and the exact hazard the reference's no-progress
    guard (html-qt/htmltokenizer.cpp:66-80) aborts on.

    All JVM-side: regex-split at block-start tags (lookahead keeps the
    tag with its following chunk), greedy-pack pieces to
    ``target_chunk_bytes`` via a running-length window, reassemble each
    chunk with one groupBy.  Only spans > ``threshold_bytes`` that are
    free of raw-text/comment/foreign openers are split — anything else
    passes through whole, so splitting never changes extraction output
    on content it can't prove safe.  Output schema = input +
    ``_chunk:int`` ordering column, consumed by
    :func:`extract_spans_exploded`.

    The window+groupBy shuffle is keyed (doc_id, offset) and runs ONLY
    over the filtered mega-spans (a vanishing fraction of a crawl), so
    the common path stays shuffle-free.
    """
    from pyspark.sql import Window

    eligible = (
        (F.col("kind") == "text")
        & (F.length("text") > threshold_bytes)
        & (~F.col("text").rlike(_UNSAFE_SPLIT_RX))
    )
    passthrough = (df_exploded.where(~eligible | eligible.isNull())
                   .withColumn("_chunk", F.lit(0)))
    mega = df_exploded.where(eligible)
    pieces = mega.select(
        "doc_id", "offset", "kind", "media_ref",
        F.posexplode(F.split("text", _BLOCK_CUT_RX))
        .alias("_piece_idx", "_piece"),
    )
    w = (Window.partitionBy("doc_id", "offset").orderBy("_piece_idx")
         .rowsBetween(Window.unboundedPreceding, -1))
    packed = pieces.withColumn(
        "_chunk",
        (F.coalesce(F.sum(F.length("_piece")).over(w), F.lit(0))
         / F.lit(target_chunk_bytes)).cast("int"))
    chunks = (
        packed.groupBy("doc_id", "offset", "kind", "media_ref", "_chunk")
        .agg(F.concat_ws(
            "",
            F.sort_array(F.collect_list(F.struct("_piece_idx", "_piece")))
            .getField("_piece")).alias("text"))
    )
    cols = ["doc_id", "offset", "kind", "text", "media_ref", "_chunk"]
    return passthrough.select(*cols).unionByName(chunks.select(*cols))


def extract_spans_exploded(df_exploded: DataFrame, *,
                           fragment_context: str | None = None
                           ) -> DataFrame:
    """Skew path over the exploded form (doc_id, offset, kind, text,
    media_ref[, _chunk]): per-span extraction + one window to number
    spans.  ``fragment_context`` as in :func:`extract_spans_doc`.

    Mega-documents parallelize across their spans; the window shuffle is
    keyed on doc_id so AQE's skew-join splitting and post-shuffle
    coalescing apply.  The UDF emits FLAT rows (no array<struct> build +
    posexplode round-trip — measured ~2x the kernel cost).

    A ``_chunk`` column (from :func:`chunk_split_exploded`) slots into
    the ordering between ``offset`` and the intra-fragment index, so
    chunked mega-spans renumber back into document order.
    """
    has_chunk = "_chunk" in df_exploded.columns
    if not has_chunk:
        df_exploded = df_exploded.withColumn("_chunk", F.lit(0))

    def process(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from html_qt_spark.kernel.extractor import extract_html
        from html_qt_spark.kernel.trivialbatch import (
            filter_blocks,
            vec_trivial,
        )

        vec_enabled = fragment_context is None

        def vec_batch(rb):
            """Arrow-native flat-row extraction; None -> row loop.
            Mirrors the row loop exactly: media rows pass through,
            empty text drops, a failing span quarantines ITSELF (one
            row), and _inner numbers each span's outputs in order.
            Row order is grouped by category; the downstream window
            orders on (offset, _chunk, _inner), never on row order."""
            kvc, tvc = rb.column(3), rb.column(4)
            if not (pa.types.is_string(kvc.type)
                    and pa.types.is_string(tvc.type)):
                return None
            media = pc.fill_null(pc.equal(kvc, "media"), False).to_numpy(
                zero_copy_only=False)
            text_ok = pc.fill_null(pc.not_equal(tvc, ""), False).to_numpy(
                zero_copy_only=False) & ~media
            vec = vec_trivial(tvc, min_words=_EXPLODED_MIN_WORDS,
                              max_link_density=_EXPLODED_MAX_LINK_DENSITY)
            if vec is None:
                return None
            accepted, norm_kept, kept_span = vec
            accepted = accepted & text_ok
            # drop blocks of spans the media/empty masks just rejected
            # (vec_trivial classified every value, media text included)
            norm_kept, ks, within = filter_blocks(
                norm_kept, kept_span, accepted)
            py_mask = text_ok & ~accepted
            py_idx = np.flatnonzero(py_mask)
            p_row: list[int] = []
            p_inner: list[int] = []
            p_kind: list[str] = []
            p_text: list[str | None] = []
            p_ref: list[str | None] = []
            if len(py_idx):
                for j, html in zip(
                        py_idx,
                        pc.take(tvc, pa.array(py_idx)).to_pylist()):
                    try:
                        res = extract_html(
                            html,
                            max_link_density=_EXPLODED_MAX_LINK_DENSITY,
                            min_words=_EXPLODED_MIN_WORDS,
                            fragment_context=fragment_context)
                        for i, (k, t, m) in enumerate(res):
                            p_row.append(int(j))
                            p_inner.append(i)
                            p_kind.append(k)
                            p_text.append(t)
                            p_ref.append(m)
                    except Exception as exc:  # noqa: BLE001 — poison pill
                        p_row.append(int(j))
                        p_inner.append(0)
                        p_kind.append(QUARANTINE_KIND)
                        p_text.append(f"{type(exc).__name__}:{exc}"[:512])
                        p_ref.append(None)

            jm = np.flatnonzero(media)
            jm_pa = pa.array(jm)
            nm, nv = len(jm), len(ks)
            row_sel = np.concatenate(
                [jm, ks, np.asarray(p_row, dtype=np.int64)])
            row_sel_pa = pa.array(row_sel)
            str_ty = pa.string()
            text_col = pa.concat_arrays([
                pc.take(tvc, jm_pa).cast(str_ty),
                norm_kept.cast(str_ty),
                pa.array(p_text, str_ty)])
            ref_col = pa.concat_arrays([
                pc.take(rb.column(5), jm_pa).cast(str_ty),
                pa.nulls(nv, str_ty),
                pa.array(p_ref, str_ty)])
            kind_col = pa.array(["media"] * nm + ["text"] * nv + p_kind,
                                str_ty)
            inner_col = pa.array(np.concatenate([
                np.zeros(nm, np.int64), within,
                np.asarray(p_inner, dtype=np.int64)]).astype(np.int32),
                pa.int32())
            return pa.RecordBatch.from_arrays(
                [pc.take(rb.column(0), row_sel_pa).cast(str_ty),
                 pc.take(rb.column(1), row_sel_pa).cast(pa.int32()),
                 pc.take(rb.column(2), row_sel_pa).cast(pa.int32()),
                 inner_col, kind_col, text_col, ref_col],
                names=["doc_id", "offset", "_chunk", "_inner", "kind",
                       "text", "media_ref"])

        str_t, int_t = pa.string(), pa.int32()
        for rb in batches:
            if vec_enabled:
                out = vec_batch(rb)
                if out is not None:
                    yield out
                    continue
            doc_ids: list[str] = []
            offsets: list[int] = []
            chunks: list[int] = []
            inners: list[int] = []
            kinds: list[str] = []
            texts: list[str | None] = []
            refs: list[str | None] = []
            for doc_id, offset, chunk, kind, html, ref in zip(
                    rb.column(0).to_pylist(), rb.column(1).to_pylist(),
                    rb.column(2).to_pylist(), rb.column(3).to_pylist(),
                    rb.column(4).to_pylist(), rb.column(5).to_pylist()):
                if kind == "media":
                    if isinstance(html, (bytes, bytearray)):
                        html = bytes(html).decode("utf-8", "replace")
                    doc_ids.append(doc_id)
                    offsets.append(offset)
                    chunks.append(chunk)
                    inners.append(0)
                    kinds.append("media")
                    texts.append(html)
                    refs.append(ref)
                    continue
                if not html:
                    continue
                try:
                    for i, (k, t, m) in enumerate(extract_html(
                            html,
                            max_link_density=_EXPLODED_MAX_LINK_DENSITY,
                            min_words=_EXPLODED_MIN_WORDS,
                            fragment_context=fragment_context)):
                        doc_ids.append(doc_id)
                        offsets.append(offset)
                        chunks.append(chunk)
                        inners.append(i)
                        kinds.append(k)
                        texts.append(t)
                        refs.append(m)
                except Exception as exc:  # noqa: BLE001 — poison pill
                    doc_ids.append(doc_id)
                    offsets.append(offset)
                    chunks.append(chunk)
                    inners.append(0)
                    kinds.append(QUARANTINE_KIND)
                    texts.append(f"{type(exc).__name__}:{exc}"[:512])
                    refs.append(None)
            yield pa.RecordBatch.from_arrays(
                [pa.array(doc_ids, str_t), pa.array(offsets, int_t),
                 pa.array(chunks, int_t), pa.array(inners, int_t),
                 pa.array(kinds, str_t), pa.array(texts, str_t),
                 pa.array(refs, str_t)],
                names=["doc_id", "offset", "_chunk", "_inner", "kind",
                       "text", "media_ref"])

    # explicit projection pins the positional column order the Arrow UDF
    # reads AND guarantees only these six columns cross the boundary
    # (guide §4.1: an opaque function otherwise ships every column)
    narrow = df_exploded.select(
        "doc_id", "offset", "_chunk", "kind", "text", "media_ref")
    extracted = narrow.mapInArrow(process, schema=_EXPLODED_MID_SCHEMA)
    w = Window.partitionBy("doc_id").orderBy("offset", "_chunk", "_inner")
    return (
        extracted
        .withColumn("span_idx",
                    (F.row_number().over(w) - F.lit(1)).cast("int"))
        .select("doc_id", "span_idx", "kind", "text", "media_ref", "offset")
    )


DOC_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("meta_description", T.StringType()),
    T.StructField("canonical_url", T.StringType()),
    T.StructField("lang", T.StringType()),
])


def doc_metadata(df: DataFrame) -> DataFrame:
    """(doc_id, spans) -> per-document head metadata (title, meta
    description, canonical link, html lang), first occurrence across the
    document's text spans winning.  Same zero-shuffle narrow-map shape
    as extraction; one row per input document (all-NULL when the
    document carries no head metadata)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from html_qt_spark.kernel.encoding import decode_html
        from html_qt_spark.kernel.extractor import extract_metadata
        from html_qt_spark.kernel.treebuilder import parse

        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "title", "meta_description",
                                    "canonical_url", "lang")}
            for doc_id, s_kinds, s_texts in zip(
                    pdf["doc_id"], pdf["_kinds"], pdf["_texts"]):
                title = desc = canon = lang = None
                if s_kinds is not None:
                    for kind, html in zip(s_kinds, s_texts):
                        if kind == "media" or not html:
                            continue
                        if None not in (title, desc, canon, lang):
                            break
                        if isinstance(html, (bytes, bytearray)):
                            html = decode_html(bytes(html))
                        try:
                            t, d, c, lg = extract_metadata(parse(
                                html, collect_errors=False))
                        except Exception:  # noqa: BLE001 — poison pill
                            continue
                        title = title if title is not None else t
                        desc = desc if desc is not None else d
                        canon = canon if canon is not None else c
                        lang = lang if lang is not None else lg
                rows["doc_id"].append(doc_id)
                rows["title"].append(title)
                rows["meta_description"].append(desc)
                rows["canonical_url"].append(canon)
                rows["lang"].append(lang)
            yield pd.DataFrame(rows)

    flat = df.select(
        "doc_id",
        F.col("spans.kind").alias("_kinds"),
        F.col("spans.text").alias("_texts"),
    )
    return flat.mapInPandas(process, schema=DOC_META_SCHEMA)
