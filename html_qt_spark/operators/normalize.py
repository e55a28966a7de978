"""Unicode normalization for pre-training corpora.

Every real pipeline normalizes text BEFORE dedup/fingerprinting/
tokenization: visually-identical documents whose codepoints differ only
in composition form (e.g. ``é`` = U+00E9 vs ``e``+U+0301) otherwise
evade exact_dedup, minhash, simhash and winnowing entirely — the hashes
see different bytes.

Spark has no built-in normalizer, so this is an Arrow-batched
``pandas_udf`` over ``unicodedata.normalize`` (C-implemented in
CPython; the batch path is the sanctioned slow-lane of SURVEY.md §2.5 —
never a row-at-a-time Python UDF).  The op is a narrow map: no shuffle,
scales linearly with executors at 10^12 docs.

Forms: NFC (canonical compose — the web/DuckDB-portable default), NFD,
NFKC (compatibility fold: ligatures ``ﬁ``→``fi``, fullwidth ``Ａ``→``A``
— the usual pre-tokenization choice), NFKD.  The DuckDB oracle covers
the NFC slice (``nfc_normalize``); NFKC has no DuckDB builtin and is
pinned by pytest fixtures instead.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def normalize_text(docs: DataFrame, *, form: str = "NFC",
                   text_col: str = "text",
                   out_col: str | None = None) -> DataFrame:
    """Add ``out_col`` (default: replace ``text_col``) with the
    Unicode-normalized text.  Narrow transformation, Arrow-batched."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")
    out_col = out_col or text_col

    @F.pandas_udf(T.StringType())
    def _norm(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize(form, x)
            if x is not None else None)

    return docs.withColumn(out_col, _norm(F.col(text_col)))
