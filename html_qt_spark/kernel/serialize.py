"""Golden-tree serializer (html5lib ``.dat`` tree-construction format).

Replaces the reference's debug dump (html-qt/htmltree.cpp:92-98 — which
crashes on the document node's unset token) with the standard conformance
serialization: 2-space indent per depth, ``<name>`` elements, quoted text,
``name="value"`` attribute lines sorted by name.
"""

from __future__ import annotations

from .treebuilder import TreeBuilder


def serialize_tree(tb: TreeBuilder, root: int = 0) -> str:
    """Serialize the subtree under ``root`` (default: the document).
    For fragments pass ``tb.fragment_root`` — the html5lib fragment
    convention lists the context's children at top level."""
    lines: list[str] = []

    def walk(nid: int, depth: int) -> None:
        t = tb.tag[nid]
        pad = "| " + "  " * depth
        if t == "#content":
            # html5lib .dat convention: template contents fragment
            lines.append(f"{pad}content")
        elif t == "#text":
            lines.append(f'{pad}"{tb.text[nid]}"')
        elif t == "#comment":
            lines.append(f"{pad}<!-- {tb.text[nid]} -->")
        elif t == "#doctype":
            name = tb.text[nid] or ""
            lines.append(f"{pad}<!DOCTYPE {name}>".replace(" >", ">"))
        else:
            ns = tb.ns[nid] if nid < len(tb.ns) else "html"
            prefix = "" if ns == "html" else f"{ns} "
            lines.append(f"{pad}<{prefix}{t}>")
            for k, v in sorted(tb.attrs[nid] or []):
                lines.append(f'{pad}  {k}="{v}"')
        for ch in tb.children[nid]:
            walk(ch, depth + 1)

    for ch in tb.children[root]:
        walk(ch, 0)
    return "\n".join(lines)
