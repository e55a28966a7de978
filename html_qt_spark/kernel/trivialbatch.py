"""Batch-vectorized trivial-span extraction over Arrow string arrays.

The columnar counterpart of :mod:`trivialspans` (guide §4.2: hand whole
batches to vectorized native libraries instead of looping over rows in
Python).  For spans inside the trivial grammar the extraction result is
computable with RE2/pyarrow.compute alone — the span text never becomes
a Python object:

1. classify: one anchored RE2 match of the trivial grammar
   (trivialspans.py docstring; same grammar minus the possessive-
   quantifier syntax RE2 neither needs nor supports — every choice
   point in the grammar is decided by the next character, since text
   classes exclude ``<``, so backtracking semantics never differ);
2. reduce to blocks: replace each boilerplate container (with its whole
   link-strip content) by one ``\\x01`` separator, then every remaining
   tag by one separator.  Every tag in the grammar is a block
   push/pop, so the separator-delimited pieces are EXACTLY the
   extractor's text blocks in document order (no two text runs can
   merge: some tag event always sits between them);
3. normalize + threshold columnar: whitespace-collapse (only blocks a
   memchr-style count proves non-trivial; the rest just trim), drop
   empty blocks and blocks below ``min_words``.

``\\x01`` cannot occur in classified text (the grammar's text class is
printable-ASCII + tab/newline) nor survive from attribute values (the
RE2 value class excludes control characters, stricter than the Python
grammar — stricter only costs fallback, never divergence).

Equivalence with extract_spans(parse(...)) for every ACCEPTED span is
pinned by tests/test_trivialbatch.py directly against the full spec
pipeline — independent of the Python trivial path, so a Python-re vs
RE2 acceptance difference can only cause a fallback, not a divergence.
"""

from __future__ import annotations

# RE2 flavor of the kernel/trivialspans.py grammar: identical character
# classes and structure, no possessive-quantifier syntax, and a
# control-character-free attribute value class (see module docstring)
_B = r"[\t\n -%'-;=-~]"
_ATTR = r"(?:[\t\n ]+[a-z][a-z0-9-]*(?:=\"[^\"&<>\x00-\x1f]*\")?)*"
_APAIR = rf"<a{_ATTR}[\t\n ]*>{_B}*</a>"
_LINKTEXT = rf"(?:{_B}+|{_APAIR})*"
_PTAGS = ("p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "blockquote")
_BTAGS = ("nav", "header", "footer", "aside")
_PAIR = "(?:" + "|".join(rf"<{t}>{_B}*</{t}>" for t in _PTAGS) + ")"
_BOILER = "(?:" + "|".join(rf"<{t}>{_LINKTEXT}</{t}>" for t in _BTAGS) + ")"
_DIV = rf"<div>(?:{_PAIR}|{_BOILER}|{_B}+)*</div>"
_ITEM = rf"(?:{_PAIR}|{_BOILER}|{_DIV})"
CLASS_RE2 = rf"\A{_ITEM}(?:{_ITEM}|{_B}+)*\z"
_TAG_RE2 = r"</?[a-z][a-z0-9]*>"
_SEP = "\x01"


def vec_trivial(tv, *, min_words: int = 1,
                max_link_density: float = 0.5):
    """Vectorized trivial extraction over a pyarrow string array of
    span texts (nulls allowed, they are simply not accepted).

    Returns ``(accepted, norm_kept, kept_span)`` where ``accepted`` is
    a numpy bool array per input span, ``norm_kept`` a pyarrow string
    array of all emitted block texts, and ``kept_span`` the int64 input
    index of each emitted block (non-decreasing; blocks of one span
    appear in document order).  ``accepted[j]`` True means span j's
    full extraction result is exactly its slice of ``norm_kept``, every
    block of kind 'text' with media_ref None.  Returns None when the
    parameters rule the closed form out (negative link-density
    threshold — the 0 <= threshold shortcut would be wrong).
    """
    if not max_link_density >= 0:
        return None  # negative or NaN: the 0<=threshold shortcut is wrong
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    accepted = pc.fill_null(
        pc.match_substring_regex(tv, CLASS_RE2), False
    ).to_numpy(zero_copy_only=False)
    empty_blocks = pa.array([], pa.string())
    empty_span = np.empty(0, np.int64)
    idx = np.flatnonzero(accepted)
    if len(idx) == 0:
        return accepted, empty_blocks, empty_span

    sel = pc.take(tv, pa.array(idx))
    c = pc.replace_substring_regex(sel, pattern=_BOILER, replacement=_SEP)
    c = pc.replace_substring_regex(c, pattern=_TAG_RE2, replacement=_SEP)
    blocks = pc.split_pattern(c, pattern=_SEP)
    # split_pattern yields at least one piece per (non-null) input, and
    # idx is non-empty here, so flat is never empty
    flat = blocks.values
    boffs = blocks.offsets.to_numpy().astype(np.int64)

    # normalize: collapse runs of {space, tab, newline} (the only
    # whitespace the grammar admits) to one space, then strip.  A
    # substring-count pre-filter keeps the allocating RE2 replace off
    # the (overwhelmingly common) already-single-spaced blocks.
    nontrivial = pc.or_(
        pc.or_(pc.greater(pc.count_substring(flat, "\t"), 0),
               pc.greater(pc.count_substring(flat, "\n"), 0)),
        pc.greater(pc.count_substring(flat, "  "), 0),
    ).to_numpy(zero_copy_only=False)
    norm = pc.utf8_trim(flat, " ")
    nz = np.flatnonzero(nontrivial)
    if len(nz):
        fixed = pc.utf8_trim(pc.replace_substring_regex(
            pc.take(flat, pa.array(nz)),
            pattern=r"[\t\n ]+", replacement=" "), " ")
        remap = np.arange(len(flat), dtype=np.int64)
        remap[nz] = len(flat) + np.arange(len(nz), dtype=np.int64)
        norm = pc.take(pa.concat_arrays(
            [norm.combine_chunks() if isinstance(norm, pa.ChunkedArray)
             else norm, fixed]), pa.array(remap))

    keep = pc.not_equal(norm, "")
    if min_words > 1:
        # normalized text is single-spaced, so words = spaces + 1
        keep = pc.and_(keep, pc.greater_equal(
            pc.add(pc.count_substring(norm, " "), 1), min_words))
    keep_np = keep.to_numpy(zero_copy_only=False)
    kept_pos = np.flatnonzero(keep_np)
    norm_kept = pc.take(norm, pa.array(kept_pos))
    # flat block position -> local accepted-span ordinal -> input index
    local = np.searchsorted(boffs, kept_pos, side="right") - 1
    return accepted, norm_kept, idx[local]


def filter_blocks(norm_kept, kept_span, accepted):
    """Re-filter a ``vec_trivial`` block set after the caller tightened
    the accepted mask (media rows, empty text, oversize spans), and
    compute each surviving block's ordinal within its span.

    ``vec_trivial`` classifies EVERY value in the column — including,
    say, a media span whose text happens to parse as trivial HTML — so
    callers that exclude whole categories must drop those spans' blocks
    too, or they would emit phantom rows (found by review, pinned by
    tests/test_trivialbatch.py::test_media_text_matching_grammar).

    Returns ``(norm_kept, kept_span, within)`` with normalized empty
    shapes.  ``within`` stays valid under any later whole-span
    filtering (ordinals are per span, so removing other spans' blocks
    cannot change them).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if len(kept_span):
        keep = accepted[kept_span]
        if not keep.all():
            kept_span = kept_span[keep]
            norm_kept = pc.filter(norm_kept, pa.array(keep))
    if isinstance(norm_kept, pa.ChunkedArray):
        norm_kept = norm_kept.combine_chunks()
    if not len(kept_span):
        return pa.array([], pa.string()), np.empty(0, np.int64), \
            np.empty(0, np.int64)
    run_starts = np.concatenate(
        ([0], np.flatnonzero(np.diff(kept_span)) + 1))
    within = np.arange(len(kept_span), dtype=np.int64)
    seg_len = np.diff(np.concatenate((run_starts, [len(kept_span)])))
    within -= np.repeat(within[run_starts], seg_len)
    return norm_kept, kept_span, within
