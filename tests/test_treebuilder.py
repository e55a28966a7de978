"""html5lib .dat tree-construction conformance tests (SURVEY.md §5.2 item 2).

Covers the insertion modes the reference stubs out (21 of 23,
html-qt/htmlparser.cpp:19-41), implicit html/head/body synthesis
(htmlbeforehtmlphase.cpp:12-17), <html> attr merge
(htmlabstractphase.cpp:32-51), adoption agency and foster parenting
(hooks only in the reference: htmltree.cpp:126-132, htmltree.h:88).
"""

from __future__ import annotations

from pathlib import Path

import pytest

from html_qt_spark.kernel.serialize import serialize_tree
from html_qt_spark.kernel.treebuilder import parse

FIXTURE_DIR = Path(__file__).parent / "fixtures" / "tree-construction"


def _load_cases():
    cases = []
    for f in sorted(FIXTURE_DIR.glob("*.dat")):
        blocks = f.read_text().split("\n\n#data\n")
        for i, block in enumerate(blocks):
            if block.startswith("#data\n"):
                block = block[len("#data\n"):]
            data, _, rest = block.partition("\n#errors\n")
            _errors, _, doc = rest.partition("#document\n")
            cases.append(pytest.param(
                data, doc.rstrip("\n"), id=f"{f.stem}::{i}"))
    return cases


@pytest.mark.parametrize("data,expected", _load_cases())
def test_tree_construction(data, expected):
    got = serialize_tree(parse(data))
    assert got == expected, f"input={data!r}\n--- got ---\n{got}\n--- want ---\n{expected}"


def test_parent_pointers_consistent():
    tb = parse("<div><p>a<b>c</b></p><ul><li>x</ul></div>")
    for nid in range(1, len(tb.tag)):
        p = tb.parent[nid]
        if p != -1:
            assert nid in tb.children[p]
    for nid, kids in enumerate(tb.children):
        for ch in kids:
            assert tb.parent[ch] == nid


def test_malformed_never_raises():
    # engine equivalent of the reference's infinite-loop guard
    # (htmltokenizer.cpp:66-80) — must terminate cleanly, not poison the job
    bad = ["</" * 50, "<table><table><table>", "<b>" * 200 + "</b>" * 300,
           "<p" + "\x00" * 10, "<!doctype", "<a href=&amp", "</p></p></p>",
           "<td>loose cell", "<tr>loose row", "<caption>loose"]
    for doc in bad:
        tb = parse(doc)
        assert tb.tag[0] == "#document"
