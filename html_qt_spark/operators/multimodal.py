"""Multimodal column handling: opaque binary payloads + typed metadata.

Media documents travel as opaque references / binary blobs with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched functions over ``mapInPandas``.  The image/audio codecs are
NOT in this container, so the decode step is a clearly-marked deterministic
stub (``_fake_decode``) — the Spark-side plumbing (schema, partitioning,
UDF signature, batch shape) is real and tested, and swapping the stub for
PIL/ffmpeg is a one-function change on the executor image.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType()),
    T.StructField("modality", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def _fake_decode(ref: str) -> tuple[str, int, int, int, list[float]]:
    """Deterministic stand-in for the codec stack.

    STUB: the container has no image/audio libraries.  Real deployment
    replaces this body with PIL/av decode + model feature extraction; the
    signature and the surrounding Arrow plumbing stay identical.
    Derives stable pseudo-metadata from the ref string so tests are
    reproducible.
    """
    h = 0
    for ch in ref:
        h = (h * 131 + ord(ch)) & 0x7FFFFFFF
    modality = ("image" if ref.startswith("img://")
                else "video" if ref.startswith("vid://")
                else "audio" if ref.startswith("aud://")
                else "unknown")
    width = 160 + h % 1920
    height = 90 + (h >> 8) % 1080
    duration = 0 if modality == "image" else 1000 + (h >> 16) % 600000
    feature = [((h >> (i % 24)) % 256) / 255.0 for i in range(8)]
    return modality, width, height, duration, feature


def decode_media(media_refs: DataFrame, *, ref_col: str = "media_ref"
                 ) -> DataFrame:
    """(.., media_ref) → MEDIA_META_SCHEMA rows, Arrow-batched.

    Narrow map over whatever partitioning the input has — at scale,
    repartition upstream by a hash of the ref so hot CDNs/hosts don't
    skew decode tasks.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_ref": [], "modality": [], "width": [],
                    "height": [], "duration_ms": [], "feature": []}
            for ref in pdf[ref_col]:
                if ref is None:
                    continue
                modality, w, hgt, dur, feat = _fake_decode(ref)
                rows["media_ref"].append(ref)
                rows["modality"].append(modality)
                rows["width"].append(w)
                rows["height"].append(hgt)
                rows["duration_ms"].append(dur)
                rows["feature"].append(feat)
            yield pd.DataFrame(rows)

    return media_refs.select(ref_col).mapInPandas(
        process, schema=MEDIA_META_SCHEMA)


def frame_sample_plan(decoded: DataFrame, *, every_ms: int = 5000
                      ) -> DataFrame:
    """Videos → one row per sampled frame timestamp (plumbing for a frame
    extractor; JVM-side sequence, no Python).  Returns
    (media_ref, frame_ts_ms)."""
    from pyspark.sql import functions as F
    vids = decoded.where(F.col("modality") == "video")
    return vids.select(
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def resize_plan(decoded: DataFrame, *, target: int = 224) -> DataFrame:
    """Aspect-preserving resize targets for decoded visual media: the
    standard vision-preprocessing step (fit the short... here: fit the
    LONG side to ``target``, floor the other) computed entirely JVM-side
    with integer cross-multiplication — no floats, so the plan is
    bit-identical on any engine and the actual resampling kernel (a
    Pandas-UDF over the binary column in production) receives exact
    output dims.  Returns (media_ref, width, height, out_w, out_h).
    """
    from pyspark.sql import functions as F

    vis = decoded.where(F.col("modality").isin("image", "video"))
    portrait = F.col("height") >= F.col("width")
    return vis.select(
        "media_ref", "width", "height",
        F.when(portrait,
               F.floor(F.col("width") * target / F.col("height")))
        .otherwise(F.lit(target)).cast("int").alias("out_w"),
        F.when(portrait, F.lit(target))
        .otherwise(F.floor(F.col("height") * target / F.col("width")))
        .cast("int").alias("out_h"),
    )


def media_captions(spans: DataFrame) -> DataFrame:
    """Attach the nearest text context to every media span: the last
    text span BEFORE it and the first text span AFTER it in document
    order — the caption-pairing step an interleaved image-text training
    pipeline runs right after extraction (nearest-neighbor caption
    heuristic; alt text already rides on the media span itself).

    Input: exploded spans (doc_id, offset, kind, text, media_ref).
    Plan: both window frames share ONE (doc_id, offset) sort — a single
    doc-keyed exchange, no join; last/first with ignorenulls skip over
    intervening media spans.  Returns (doc_id, offset, media_ref,
    caption_before, caption_after) for media rows only.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("doc_id").orderBy("offset")
    txt = F.when(F.col("kind") == "text", F.col("text"))
    before = F.last(txt, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    after = F.first(txt, ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing))
    return (spans
            .select("doc_id", "offset", "kind", "media_ref",
                    before.alias("caption_before"),
                    after.alias("caption_after"))
            .where(F.col("kind") == "media")
            .drop("kind"))
