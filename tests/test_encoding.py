"""Encoding sniffing (WHATWG 13.2.3) + raw-bytes pipeline input."""

from __future__ import annotations

from html_qt_spark.kernel.encoding import decode_html, sniff_encoding
from html_qt_spark.kernel.extractor import extract_html


def test_bom_sniffing():
    assert sniff_encoding("\ufeffabc".encode("utf-8")) == ("utf-8-sig", "bom")
    assert sniff_encoding("\ufeffabc".encode("utf-16-le"))[1] == "bom"
    assert sniff_encoding("\ufeffabc".encode("utf-16-be"))[1] == "bom"
    assert decode_html("\ufeff<p>x</p>".encode("utf-16-le")) == "<p>x</p>"


def test_meta_charset_prescan():
    doc = b'<html><head><meta charset="windows-1251"></head><body>' \
          + "привет".encode("windows-1251") + b"</body>"
    codec, src = sniff_encoding(doc)
    assert (codec, src) == ("windows-1251", "meta")
    assert "привет" in decode_html(doc)

    doc2 = (b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=Shift_JIS">'
            + "日本語".encode("shift_jis"))
    assert sniff_encoding(doc2) == ("shift_jis", "meta")
    assert "日本語" in decode_html(doc2)


def test_utf8_default_and_1252_fallback():
    assert sniff_encoding("é utf-8 ç".encode("utf-8"))[0] == "utf-8"
    # bytes invalid as utf-8, no meta: windows-1252 fallback
    raw = b"caf\xe9 legacy"
    assert sniff_encoding(raw) == ("windows-1252", "fallback")
    assert decode_html(raw) == "café legacy"


def test_meta_utf16_treated_as_utf8():
    doc = b'<meta charset="utf-16">ascii body'
    assert sniff_encoding(doc)[0] == "utf-8"


def test_decode_total_function():
    assert decode_html(None) == ""
    assert decode_html("already str") == "already str"
    assert isinstance(decode_html(b"\xff\xfe\xfd garbage"), str)


def test_extract_from_bytes_end_to_end():
    doc = ('<html><head><meta charset="windows-1252"></head><body>'
           '<p>caf\xe9 r\xe9sum\xe9</p><img src="m://1"></body>'
           ).encode("windows-1252")
    spans = extract_html(doc)
    assert spans == [("text", "café résumé", None), ("media", None, "m://1")]
