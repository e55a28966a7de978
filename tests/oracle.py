"""Slow, obviously-correct reference extractor (SURVEY.md §5.2 item 3).

Independent of the production extractor's iterative event-stream design
(html_qt_spark/kernel/extractor.py): this one walks the DOM with plain
recursion, materializes every block as an explicit object, and filters in
a separate pass.  Shares only the *tree* (whose correctness is pinned by
the html5lib .dat fixtures) and the constant tables — any divergence
between the two extraction algorithms is a bug in one of them.
"""

from __future__ import annotations

import re

from html_qt_spark.kernel.extractor import (
    BLOCK_TAGS,
    BOILERPLATE_CONTAINERS,
    MEDIA_TAGS,
    SKIP_SUBTREES,
)
from html_qt_spark.kernel.treebuilder import TreeBuilder

_WS = re.compile(r"[ \t\n\f\r]+")


class _Block:
    def __init__(self) -> None:
        self.pieces: list[str] = []     # raw text pieces
        self.words = 0
        self.link_words = 0


def oracle_extract(tb: TreeBuilder, *, max_link_density: float = 0.5,
                   min_words: int = 1) -> list[tuple]:
    """(kind, text, media_ref) spans via naive recursion."""
    out: list[tuple] = []        # ("block", _Block) | ("media", text, ref)
    open_block: list[_Block | None] = [None]

    def close_block() -> None:
        open_block[0] = None

    def visit(nid: int, in_link: bool, in_boiler: bool) -> None:
        t = tb.tag[nid]
        if t in SKIP_SUBTREES:
            return
        if t == "#text":
            if in_boiler:
                return
            blk = open_block[0]
            if blk is None:
                blk = _Block()
                open_block[0] = blk
                out.append(("block", blk))
            data = tb.text[nid] or ""
            blk.pieces.append(data)
            w = len(data.split())
            blk.words += w
            if in_link:
                blk.link_words += w
            return
        if t in MEDIA_TAGS:
            ref = None
            alt = None
            for k, v in (tb.attrs[nid] or []):
                if k == MEDIA_TAGS[t]:
                    ref = v
                elif k == "alt":
                    alt = v
            if ref and not in_boiler:
                close_block()
                out.append(("media",
                            _WS.sub(" ", alt).strip() if alt else None,
                            ref))
        if t in BOILERPLATE_CONTAINERS:
            in_boiler = True
        if t == "a":
            in_link = True
        if t in BLOCK_TAGS:
            close_block()
        for ch in tb.children[nid]:
            visit(ch, in_link, in_boiler)
        if t in BLOCK_TAGS:
            close_block()

    visit(0, False, False)

    spans: list[tuple] = []
    for item in out:
        if item[0] == "media":
            spans.append(("media", item[1], item[2]))
            continue
        blk = item[1]
        text = _WS.sub(" ", "".join(blk.pieces)).strip()
        if not text:
            continue
        words = blk.words or 1
        if blk.words >= min_words and blk.link_words / words <= max_link_density:
            spans.append(("text", text, None))
    return spans


def oracle_metadata(tb: TreeBuilder) -> tuple:
    """(title, meta_description, canonical_url, lang) via naive recursion —
    independent counterpart of kernel.extractor.extract_metadata."""
    found = {"title": None, "description": None, "canonical": None,
             "lang": None}

    def visit(nid: int) -> None:
        t = tb.tag[nid]
        a = dict(tb.attrs[nid] or [])
        if t == "html" and found["lang"] is None and "lang" in a:
            found["lang"] = a["lang"]
        if t == "title" and found["title"] is None:
            txt = "".join(tb.text[c] or "" for c in tb.children[nid]
                          if tb.tag[c] == "#text")
            txt = _WS.sub(" ", txt).strip()
            found["title"] = txt or None
        if (t == "meta" and found["description"] is None
                and a.get("name", "").lower() == "description"):
            found["description"] = a.get("content")
        if (t == "link" and found["canonical"] is None
                and a.get("rel", "").lower() == "canonical"):
            found["canonical"] = a.get("href")
        for ch in tb.children[nid]:
            visit(ch)

    visit(0)
    return (found["title"], found["description"], found["canonical"],
            found["lang"])
