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


def oracle_markdown(tb: TreeBuilder) -> str:
    """Markdown rendering via naive recursion — independent counterpart
    of kernel/markdown.py::render_markdown (same spec, different
    algorithm: direct recursive descent returning strings, no explicit
    stacks, no paragraph buffering; shares only the tree + tag sets)."""
    from html_qt_spark.kernel.extractor import (
        BLOCK_TAGS,
        BOILERPLATE_CONTAINERS,
        MEDIA_TAGS,
        SKIP_SUBTREES,
    )

    headings = {f"h{i}": i for i in range(1, 7)}
    lists = {"ul", "ol", "menu", "dir"}
    fenced = {"pre", "xmp", "plaintext"}
    wrap = {"strong": "**", "b": "**", "em": "*", "i": "*", "code": "`"}

    def collapse(s: str) -> str:
        return _WS.sub(" ", s).strip()

    def raw(nid: int) -> str:
        if tb.tag[nid] == "#text":
            return tb.text[nid] or ""
        return "".join(raw(c) for c in tb.children[nid])

    def inline(nid: int) -> str:
        t = tb.tag[nid]
        if t == "#text":
            return tb.text[nid] or ""
        if t in SKIP_SUBTREES or t in BOILERPLATE_CONTAINERS:
            return ""
        if t == "br":
            return " "
        a = dict(tb.attrs[nid] or [])
        if t == "img":
            return f"![{collapse(a.get('alt') or '')}]({a['src']})" \
                if a.get("src") else ""
        if t in MEDIA_TAGS:
            ref = a.get(MEDIA_TAGS[t])
            head = f"[{t}]({ref})" if ref else ""
            return head + "".join(inline(c) for c in tb.children[nid])
        inner = "".join(inline(c) for c in tb.children[nid])
        if not (inner and collapse(inner)):
            return inner
        if t == "a" and a.get("href"):
            return f"[{inner}]({a['href']})"
        if t in wrap:
            return wrap[t] + inner + wrap[t]
        return inner

    def blocks(nid: int) -> list[str]:
        t = tb.tag[nid]
        if t in SKIP_SUBTREES or t in BOILERPLATE_CONTAINERS:
            return []
        if t in headings:
            txt = collapse("".join(inline(c) for c in tb.children[nid]))
            return [f"{'#' * headings[t]} {txt}"] if txt else []
        if t in lists:
            lines, i = [], 0
            for ch in tb.children[nid]:
                if tb.tag[ch] != "li":
                    continue
                i += 1
                txt = collapse("".join(inline(c)
                                       for c in tb.children[ch]))
                if txt:
                    pre = f"{i}. " if t == "ol" else "- "
                    lines.append(pre + txt)
            return ["\n".join(lines)] if lines else []
        if t == "blockquote":
            txt = collapse("".join(inline(c) for c in tb.children[nid]))
            return [f"> {txt}"] if txt else []
        if t in fenced:
            r = raw(nid)
            return [f"```\n{r}\n```"] if r.strip() else []
        if t == "hr":
            return ["---"]
        if t == "table":
            trs: list[int] = []

            def find_trs(m: int) -> None:
                if tb.tag[m] == "tr":
                    trs.append(m)
                    return
                for c in tb.children[m]:
                    find_trs(c)

            find_trs(nid)
            lines = []
            for idx, tr in enumerate(trs):
                cells = [c for c in tb.children[tr]
                         if tb.tag[c] in ("td", "th")]
                if not cells:
                    continue
                texts = [collapse("".join(inline(x)
                                          for x in tb.children[c]))
                         for c in cells]
                lines.append("| " + " | ".join(texts) + " |")
                if idx == 0 and any(tb.tag[c] == "th" for c in cells):
                    lines.append("|" + " --- |" * len(cells))
            return ["\n".join(lines)] if lines else []
        out: list[str] = []
        buf: list[int] = []

        def flush() -> None:
            if buf:
                txt = collapse("".join(inline(b) for b in buf))
                if txt:
                    out.append(txt)
                buf.clear()

        for ch in tb.children[nid]:
            ct = tb.tag[ch]
            if ct in SKIP_SUBTREES or ct in BOILERPLATE_CONTAINERS:
                continue
            if ct in BLOCK_TAGS or ct == "hr":
                flush()
                out.extend(blocks(ch))
            else:
                buf.append(ch)
        flush()
        return out

    return "\n\n".join(blocks(0))
