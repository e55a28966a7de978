"""Reusable column expressions over the spans schema (JVM-side only).

These are the building blocks the SQL-expressible pipeline stages share;
keeping them as Column factories means every call site stays inside
whole-stage codegen and Catalyst can prune/push as usual.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def is_media(kind: str | Column = "kind") -> Column:
    return F.col(kind) == "media" if isinstance(kind, str) else kind == "media"


def span_chars(text: str | Column = "text") -> Column:
    """Character count of a span, 0 for media/null spans."""
    c = F.col(text) if isinstance(text, str) else text
    return F.coalesce(F.length(c), F.lit(0))


def media_scheme(media_ref: str | Column = "media_ref") -> Column:
    """Leading scheme of a media ref (img/vid/aud...)."""
    c = F.col(media_ref) if isinstance(media_ref, str) else media_ref
    return F.substring(c, 1, 3)


def doc_span_stats() -> list[Column]:
    """Aggregations for per-doc span metrics (groupBy doc_id)."""
    return [
        F.count("*").alias("n_spans"),
        F.sum(F.when(F.col("kind") == "text", 1).otherwise(0))
        .cast("long").alias("n_text"),
        F.sum(F.when(is_media(), 1).otherwise(0))
        .cast("long").alias("n_media"),
        F.sum(span_chars()).cast("long").alias("sum_chars"),
    ]
