"""Parser-side reference_compat: dual golden trees (SURVEY.md §5.3).

The reference implements only 2 of 23 insertion modes; the other 21 are
accept-and-ignore HTMLAbstractPhase instances (html-qt/htmlparser.cpp:19-41,
htmlabstractphase.cpp:59-92).  ``reference_compat=True`` reproduces that
runtime shape bug-for-bug (see TreeBuilder._process_compat for the full
behavioral derivation with file:line anchors); default mode is the spec
tree.  Each case pins BOTH trees for the same input so the divergence
itself is regression-locked.
"""

from __future__ import annotations

import pytest

from html_qt_spark.kernel.extractor import extract_html
from html_qt_spark.kernel.serialize import serialize_tree
from html_qt_spark.kernel.treebuilder import parse

DUAL_CASES = [
    # (input, spec tree, compat tree)
    (
        '<!DOCTYPE html><p>Hello <b>world</b></p>',
        '| <!DOCTYPE html>\n'
        '| <html>\n'
        '|   <head>\n'
        '|   <body>\n'
        '|     <p>\n'
        '|       "Hello "\n'
        '|       <b>\n'
        '|         "world"',
        # compat: <p>/<b> ignored (abstract processStartTag), chars append
        # to the <html> node's own text buffer
        '| <!DOCTYPE html>\n'
        '| <html>\n'
        '|   "Hello world"',
    ),
    (
        # no doctype: the reference never leaves Initial — start tags are
        # logged-and-ignored (htmlinitialphase.cpp:22-31) and a character
        # hits openElements().last() on an empty vector (UB/crash in the
        # reference; the engine drops with a parse error instead)
        '<p>No doctype</p>',
        '| <html>\n'
        '|   <head>\n'
        '|   <body>\n'
        '|     <p>\n'
        '|       "No doctype"',
        '',
    ),
    (
        # <html> attrs are DROPPED in compat: insertHtmlElement builds a
        # fresh bare token (htmlbeforehtmlphase.cpp:12-17)
        '<!DOCTYPE html><html lang="en"><body class="c">x</body></html>',
        '| <!DOCTYPE html>\n'
        '| <html>\n'
        '|   lang="en"\n'
        '|   <head>\n'
        '|   <body>\n'
        '|     class="c"\n'
        '|     "x"',
        '| <!DOCTYPE html>\n'
        '| <html>\n'
        '|   "x"',
    ),
    (
        # character-triggered <html>: the triggering char itself is
        # consumed without insertion (htmlbeforehtmlphase.cpp:25-29)
        '<!DOCTYPE html>abc',
        '| <!DOCTYPE html>\n'
        '| <html>\n'
        '|   <head>\n'
        '|   <body>\n'
        '|     "abc"',
        '| <!DOCTYPE html>\n'
        '| <html>\n'
        '|   "bc"',
    ),
    (
        # EOF in BeforeHTML synthesizes <html> (htmlbeforehtmlphase.cpp:19-23)
        '<!DOCTYPE html>',
        '| <!DOCTYPE html>\n'
        '| <html>\n'
        '|   <head>\n'
        '|   <body>',
        '| <!DOCTYPE html>\n'
        '| <html>',
    ),
    (
        # comments are dropped everywhere in compat: HTMLTree::insertComment
        # has an empty body (htmltree.cpp:62-65)
        '<!DOCTYPE html><!--c--><p>t</p><!--d-->',
        '| <!DOCTYPE html>\n'
        '| <!-- c -->\n'
        '| <html>\n'
        '|   <head>\n'
        '|   <body>\n'
        '|     <p>\n'
        '|       "t"\n'
        '|     <!-- d -->',
        '| <!DOCTYPE html>\n'
        '| <html>\n'
        '|   "t"',
    ),
]


@pytest.mark.parametrize("html,spec,compat", DUAL_CASES,
                         ids=[c[0][:40] for c in DUAL_CASES])
def test_dual_golden_trees(html, spec, compat):
    assert serialize_tree(parse(html)) == spec
    assert serialize_tree(parse(html, reference_compat=True)) == compat


def test_compat_tokenizer_quirks_still_apply():
    # named entities unresolved (htmltokenizer.cpp:1473-1475): the literal
    # "&amp;" text survives into the compat tree
    tb = parse('<!DOCTYPE html>a&amp;b', reference_compat=True)
    texts = [tb.text[i] for i in range(len(tb.tag)) if tb.tag[i] == "#text"]
    assert texts == ["&amp;b"]  # leading 'a' consumed by the html trigger
    tb2 = parse('<!DOCTYPE html>a&amp;b')
    texts2 = [tb2.text[i] for i in range(len(tb2.tag))
              if tb2.tag[i] == "#text"]
    assert texts2 == ["a&b"]


def test_compat_extraction_spans():
    spans = extract_html('<!DOCTYPE html><p>body text</p>'
                         '<img src="m://1">', reference_compat=True)
    # img start tag is ignored by the abstract phase: no media span
    assert spans == [("text", "body text", None)]
    spans_spec = extract_html('<!DOCTYPE html><p>body text</p>'
                              '<img src="m://1">')
    assert spans_spec == [("text", "body text", None),
                          ("media", None, "m://1")]


def test_compat_never_crashes_where_reference_would():
    # characters before any doctype: UB in the reference; engine must
    # terminate cleanly with an error recorded
    tb = parse("plain text, no doctype", reference_compat=True)
    assert tb.tag == ["#document"]
    assert "compat-character-before-doctype" in tb.errors
