"""Encoding sniffing for raw HTML bytes (WHATWG 13.2.3.1-13.2.3.3).

The reference never faces this problem (QString input is already UTF-16,
html-qt/htmltokenizer.cpp:48-54; the CLI decodes via QTextStream defaults,
cmd/main.cpp:40), but the north_star pipeline ingests *raw HTML bytes* from
a crawl, where encoding is part of the document.  Implemented per the
public spec, trimmed to the parts that matter at crawl scale:

1. BOM sniff (UTF-8 / UTF-16 LE/BE) — authoritative.
2. Prescan of the first 1024 bytes for ``<meta charset=...>`` /
   ``<meta http-equiv="content-type" ...>``.
3. Fallback: try strict UTF-8 (dominant on the modern web), then
   windows-1252 (the spec's default for en locales; never fails since all
   256 byte values map).

``decode_html`` never raises: undecodable bytes degrade via
``errors='replace'`` so one mojibake doc cannot poison a 10^12-doc job.
"""

from __future__ import annotations

import codecs
import re

# matches both <meta charset=X> and
# <meta http-equiv=... content="text/html; charset=X">
_META_RX = re.compile(
    rb"<meta[^>]{0,512}?charset\s*=\s*[\"']?\s*([a-zA-Z0-9_\-]+)",
    re.IGNORECASE,
)

# the WHATWG prescan skips comments ("<!--" ... "-->"); a commented-out
# legacy <meta charset=...> must not override the real declaration.  An
# unterminated "<!--" comments out the rest of the window.
_COMMENT_RX = re.compile(rb"<!--.*?(?:-->|$)", re.DOTALL)

# label -> python codec for the common crawl encodings (WHATWG encoding
# labels are a superset; unknown labels fall through to the default chain)
_LABELS = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "iso-8859-1": "windows-1252", "latin1": "windows-1252",
    "latin-1": "windows-1252", "windows-1252": "windows-1252",
    "ascii": "windows-1252", "us-ascii": "windows-1252",
    "iso-8859-15": "iso-8859-15", "windows-1251": "windows-1251",
    "koi8-r": "koi8-r", "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis", "euc-jp": "euc-jp", "euc-kr": "euc-kr",
    "gbk": "gbk", "gb2312": "gbk", "gb18030": "gb18030",
    "big5": "big5", "iso-8859-2": "iso-8859-2",
    "windows-1250": "windows-1250", "windows-1256": "windows-1256",
    "utf-16": "utf-16", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
}


def sniff_encoding(data: bytes) -> tuple[str, str]:
    """Return (python_codec, source) where source explains the decision:
    'bom' | 'meta' | 'utf-8' | 'fallback'."""
    if data.startswith(codecs.BOM_UTF8):
        return "utf-8-sig", "bom"
    if data.startswith(codecs.BOM_UTF16_LE):
        return "utf-16-le", "bom"
    if data.startswith(codecs.BOM_UTF16_BE):
        return "utf-16-be", "bom"
    m = _META_RX.search(_COMMENT_RX.sub(b" ", data[:1024]))
    if m:
        label = m.group(1).decode("ascii", "ignore").lower()
        codec = _LABELS.get(label)
        if codec:
            # spec: a meta-declared utf-16 is treated as utf-8 (bytes that
            # reach the prescan as ASCII-compatible can't be utf-16)
            if codec.startswith("utf-16"):
                codec = "utf-8"
            return codec, "meta"
    try:
        data.decode("utf-8")
        return "utf-8", "utf-8"
    except UnicodeDecodeError:
        return "windows-1252", "fallback"


def decode_html(data: bytes | str | None) -> str:
    """bytes -> str, total function (never raises)."""
    if data is None:
        return ""
    if isinstance(data, str):
        return data
    codec, _src = sniff_encoding(data)
    try:
        text = data.decode(codec, errors="replace")
    except LookupError:  # pragma: no cover — codec table above is known
        text = data.decode("utf-8", errors="replace")
    # meta said utf-16 on byte content / stray BOM remnants: strip BOM char
    if text[:1] == "﻿":
        text = text[1:]
    return text
