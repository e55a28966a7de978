"""Differential check against CPython's stdlib html.parser.

html.parser is NOT a WHATWG tree builder (no implied tags, no error
recovery), so full-tree comparison is impossible — but on WELL-FORMED
input restricted to ordinary flow elements (balanced tags, no implied
-end-tag elements, no voids, no scripting) the two parsers must observe
the IDENTICAL event stream: same start tags with the same decoded
attributes, same entity-decoded text runs, same end tags, same nesting.
That pins the engine's tokenizer + entity decoder against an
independent, battle-tested third implementation (beyond the in-repo
recursive oracle, which shares the tree builder).
"""

from __future__ import annotations

import random
import sys
from html.parser import HTMLParser
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

from html_qt_spark.kernel.treebuilder import parse  # noqa: E402

# flow-content tags with no implied-end/special parsing rules
SAFE_TAGS = ["div", "span", "b", "i", "em", "strong", "section",
             "article", "u", "small", "code", "blockquote"]
TEXT = ["alpha", "beta", "&amp;", "&lt;x", "gamma é", "42",
        "&#65;B", "\U0001F600", "a  b"]


def _gen(rng: random.Random, depth: int = 0) -> str:
    parts = []
    for _ in range(rng.randint(1, 5)):
        r = rng.random()
        if r < 0.4 or depth > 4:
            parts.append(rng.choice(TEXT))
        else:
            t = rng.choice(SAFE_TAGS)
            attrs = ""
            if rng.random() < 0.5:
                attrs = f' data-x="{rng.randint(0, 9)} &amp; &lt;y"'
            if rng.random() < 0.2:
                attrs += " hidden"
            parts.append(f"<{t}{attrs}>{_gen(rng, depth + 1)}</{t}>")
    return "".join(parts)


def _merge_text(events: list) -> list:
    out: list = []
    for ev in events:
        if ev[0] == "text" and out and out[-1][0] == "text":
            out[-1] = ("text", out[-1][1] + ev[1])
        else:
            out.append(list(ev) if ev[0] == "text" else ev)
    return [tuple(e) if isinstance(e, list) else e for e in out
            if not (e[0] == "text" and e[1] == "")]


def _stdlib_events(html: str) -> list:
    events: list = []

    class C(HTMLParser):
        def handle_starttag(self, tag, attrs):
            events.append(("start", tag,
                           tuple((k, v or "") for k, v in attrs)))

        def handle_endtag(self, tag):
            events.append(("end", tag))

        def handle_data(self, data):
            events.append(("text", data))

    C(convert_charrefs=True).feed(html)
    return _merge_text(events)


def _kernel_events(html: str) -> list:
    tb = parse(html)
    # locate <body>: #document -> html -> [head, body]
    html_id = next(c for c in tb.children[0] if tb.tag[c] == "html")
    body = next(c for c in tb.children[html_id] if tb.tag[c] == "body")
    events: list = []

    def walk(nid: int) -> None:
        for ch in tb.children[nid]:
            t = tb.tag[ch]
            if t == "#text":
                events.append(("text", tb.text[ch] or ""))
                continue
            events.append(("start", t,
                           tuple((k, v) for k, v in (tb.attrs[ch] or []))))
            walk(ch)
            events.append(("end", t))

    walk(body)
    return _merge_text(events)


@pytest.mark.parametrize("seed", range(300, 350))
def test_wellformed_events_match_stdlib_parser(seed):
    rng = random.Random(31337 * 1000 + seed)
    html = _gen(rng)
    assert _kernel_events(html) == _stdlib_events(html), html


def test_attribute_and_entity_edges_match_stdlib():
    cases = [
        '<div data-a="x&amp;y" data-b=\'q\' hidden>t</div>',
        "<span>&amp;&lt;&#65;&#x42;</span>",
        "<b>bold</b>plain<i>it</i>",
        "<div>a<span>b</span>c<span>d</span>e</div>",
        '<code data-x="a  b   c">  spaced  </code>',
    ]
    for html in cases:
        assert _kernel_events(html) == _stdlib_events(html), html
