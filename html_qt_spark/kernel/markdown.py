"""DOM → Markdown serialization (the modern extraction surface next to
plain-text spans: what trafilatura/markdownify produce for LLM corpora).

The reference engine serializes trees as indented text dumps
(html-qt/htmltree.cpp::dump, asText); this module is the
training-data-oriented counterpart: structure-preserving Markdown.

Rendering spec (the ORACLE in tests/oracle.py::oracle_markdown
implements the same spec with naive recursion — any divergence is a bug
in one of the two):

- ``SKIP_SUBTREES`` and ``BOILERPLATE_CONTAINERS`` subtrees are dropped
  entirely (script/style/head/... and nav/header/footer/aside).
- h1..h6      -> '#'*level + ' ' + collapsed inline text (skip if empty)
- ul/ol/menu/dir -> one block; each direct <li> child renders one line:
  '- ' (unordered) or '1. ' (ordered, 1-based li index) + collapsed
  inline text of the li subtree.  No nesting (nested lists flatten into
  their li's line).  No <li> children -> no block.
- blockquote  -> '> ' + collapsed inline text of the subtree
- pre/xmp/plaintext -> fenced code block with the RAW concatenated
  #text of the subtree (no whitespace collapse)
- hr          -> '---'
- table       -> one block; every descendant <tr> (document order)
  renders '| c1 | c2 |' over its direct td/th children; if the FIRST
  tr holds any <th>, a '| --- |...' separator row follows it.
- any other BLOCK_TAGS element -> generic container: consecutive inline
  children accumulate into paragraph blocks, block children recurse.
- inline markers: a -> [text](href) (plain text when no href),
  img -> ![alt](src) (dropped without src), other media tags ->
  [tag](ref), strong/b -> **..**, em/i -> *..*, code -> `..`,
  br -> a space (hard breaks do not survive block-level whitespace
  collapse; documented simplification).  Markers emit only when their
  inline content is non-empty.
- blocks join with a blank line ('\\n\\n'); inline text collapses
  whitespace runs to single spaces and strips block edges.

Implementation notes: inline rendering is an explicit-stack DFS and
block rendering recurses only per nested BLOCK element, so total Python
stack depth is bounded by the parser's MAX_DEPTH=512 cap — no
sys.setrecursionlimit games in the production path.
"""

from __future__ import annotations

import re

from .extractor import (
    BLOCK_TAGS,
    BOILERPLATE_CONTAINERS,
    MEDIA_TAGS,
    SKIP_SUBTREES,
)
from .treebuilder import TreeBuilder

_WS_COLLAPSE = re.compile(r"[ \t\n\f\r]+")

_HEADINGS = {f"h{i}": i for i in range(1, 7)}
_LISTS = frozenset(("ul", "ol", "menu", "dir"))
_FENCED = frozenset(("pre", "xmp", "plaintext"))
_WRAP_MARKERS = {"strong": "**", "b": "**", "em": "*", "i": "*",
                 "code": "`"}


def _collapse(s: str) -> str:
    return _WS_COLLAPSE.sub(" ", s).strip()


def _attr(attrs, name: str) -> str | None:
    for k, v in (attrs or []):
        if k == name:
            return v
    return None


def _raw_text(tb: TreeBuilder, root: int) -> str:
    """Concatenated #text of the subtree, document order, no collapse."""
    parts: list[str] = []
    stack = [root]
    while stack:
        nid = stack.pop()
        if tb.tag[nid] == "#text":
            parts.append(tb.text[nid] or "")
            continue
        for ch in reversed(tb.children[nid]):
            stack.append(ch)
    return "".join(parts)


def _inline(tb: TreeBuilder, nodes: list[int]) -> str:
    """Render nodes (and their subtrees) with inline rules — explicit
    stack, one pass; wrap markers are resolved via exit frames."""
    parts: list[str] = []
    # frames: (nid, enter) — exit frames append the close marker
    stack: list[tuple[int, str | None]] = [
        (n, None) for n in reversed(nodes)]
    while stack:
        nid, close = stack.pop()
        if close is not None:
            # exit frame: nid is a _Pos (start index into `parts`);
            # drop the marker pair when nothing was emitted
            open_at = int(nid)
            inner = "".join(parts[open_at:])
            del parts[open_at:]
            if inner and _collapse(inner):
                parts.append(close[0] + inner + close[1])
            else:
                parts.append(inner)
            continue
        t = tb.tag[nid]
        if t == "#text":
            parts.append(tb.text[nid] or "")
            continue
        if t in SKIP_SUBTREES or t in BOILERPLATE_CONTAINERS:
            continue
        if t == "br":
            parts.append(" ")
            continue
        if t == "img":
            src = _attr(tb.attrs[nid], "src")
            if src:
                alt = _attr(tb.attrs[nid], "alt") or ""
                parts.append(f"![{_collapse(alt)}]({src})")
            continue
        if t in MEDIA_TAGS:  # video/audio/embed/source/track/object
            ref = _attr(tb.attrs[nid], MEDIA_TAGS[t])
            if ref:
                parts.append(f"[{t}]({ref})")
            # fall through: children may hold fallback text
            for ch in reversed(tb.children[nid]):
                stack.append((ch, None))
            continue
        if t == "a":
            href = _attr(tb.attrs[nid], "href")
            open_m, close_m = ("[", f"]({href})") if href else ("", "")
        elif t in _WRAP_MARKERS:
            m = _WRAP_MARKERS[t]
            open_m, close_m = m, m
        else:
            open_m = close_m = ""
        if open_m or close_m:
            # exit frame (pops after all children): memoizes where this
            # span's content starts in `parts`
            stack.append((_Pos(len(parts)), (open_m, close_m)))
        for ch in reversed(tb.children[nid]):
            stack.append((ch, None))
    return "".join(parts)


class _Pos(int):
    """Marker frame payload: start index of a wrap span in `parts`."""

    __slots__ = ()


def render_markdown(tb: TreeBuilder) -> str:
    """DOM arrays → one Markdown string per the module-docstring spec."""
    blocks = _render_blocks(tb, 0)
    return "\n\n".join(blocks)


def _render_blocks(tb: TreeBuilder, root: int) -> list[str]:
    t = tb.tag[root]
    if t in SKIP_SUBTREES or t in BOILERPLATE_CONTAINERS:
        return []
    if t in _HEADINGS:
        txt = _collapse(_inline(tb, tb.children[root]))
        return [f"{'#' * _HEADINGS[t]} {txt}"] if txt else []
    if t in _LISTS:
        prefix_num = t == "ol"
        lines = []
        i = 0
        for ch in tb.children[root]:
            if tb.tag[ch] != "li":
                continue
            i += 1
            txt = _collapse(_inline(tb, tb.children[ch]))
            if txt:
                lines.append((f"{i}. " if prefix_num else "- ") + txt)
        return ["\n".join(lines)] if lines else []
    if t == "blockquote":
        txt = _collapse(_inline(tb, tb.children[root]))
        return [f"> {txt}"] if txt else []
    if t in _FENCED:
        raw = _raw_text(tb, root)
        return [f"```\n{raw}\n```"] if raw.strip() else []
    if t == "hr":
        return ["---"]
    if t == "table":
        return _render_table(tb, root)
    # generic container: paragraph-buffer mixed content
    blocks: list[str] = []
    buf: list[int] = []

    def flush() -> None:
        if buf:
            txt = _collapse(_inline(tb, buf))
            if txt:
                blocks.append(txt)
            buf.clear()

    for ch in tb.children[root]:
        ct = tb.tag[ch]
        if ct in SKIP_SUBTREES or ct in BOILERPLATE_CONTAINERS:
            continue
        if ct in BLOCK_TAGS or ct == "hr":
            flush()
            blocks.extend(_render_blocks(tb, ch))
        else:
            buf.append(ch)
    flush()
    return blocks


def _render_table(tb: TreeBuilder, root: int) -> list[str]:
    # every descendant tr in document order
    trs: list[int] = []
    stack = [root]
    while stack:
        nid = stack.pop()
        if tb.tag[nid] == "tr":
            trs.append(nid)
            continue
        for ch in reversed(tb.children[nid]):
            stack.append(ch)
    lines: list[str] = []
    for idx, tr in enumerate(trs):
        cells = [ch for ch in tb.children[tr]
                 if tb.tag[ch] in ("td", "th")]
        if not cells:
            continue
        texts = [_collapse(_inline(tb, tb.children[c])) for c in cells]
        lines.append("| " + " | ".join(texts) + " |")
        if idx == 0 and any(tb.tag[c] == "th" for c in cells):
            lines.append("|" + " --- |" * len(cells))
    return ["\n".join(lines)] if lines else []
