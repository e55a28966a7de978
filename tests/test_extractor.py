"""Golden span-extraction tests (FIXTURES.md §5; SURVEY.md §5.2 item 3).

The per-row invariant from BASELINE.json input_hint: span-sequence equality
on (kind, text, media_ref, order) per document.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from html_qt_spark.kernel.extractor import extract_html

FIXTURES = json.loads(
    (Path(__file__).parent / "fixtures" / "extract" / "pages.json").read_text()
)["docs"]


@pytest.mark.parametrize("doc", FIXTURES, ids=[d["doc_id"] for d in FIXTURES])
def test_extract_spans_golden(doc):
    got = [
        {"kind": k, "text": t, "media_ref": m}
        for k, t, m in extract_html(doc["html"])
    ]
    assert got == doc["expected_spans"], (
        f"doc={doc['doc_id']}\n got={got}\nwant={doc['expected_spans']}"
    )


def test_offsets_strictly_ordered_property():
    # invariant from SURVEY.md §5.2 item 6: spans come out in document
    # order and only with kind text|media
    html = "<p>a</p><img src='1'><p>b</p><img src='2'><div>c</div>"
    spans = extract_html(html)
    assert [s[0] for s in spans] == ["text", "media", "text", "media", "text"]


def test_empty_and_trivial_docs():
    assert extract_html("") == []
    assert extract_html("<!-- only a comment -->") == []
    assert extract_html("<script>x()</script>") == []
    assert extract_html("bare text") == [("text", "bare text", None)]
