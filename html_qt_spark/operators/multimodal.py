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

    def process(batches):
        # Vectorized batch path (optimization guide §4.2: hand whole
        # batches to native libraries inside the UDF).  The rolling hash
        # h = fold(h*131 + ord(ch)) mod 2^31 is a polynomial, so it
        # vectorizes exactly over the Arrow string buffer: per-char
        # contribution ord(ch) * 131^(len-1-pos) mod 2^31, summed per
        # ref with np.add.reduceat.  Bit-identical to _fake_decode for
        # ASCII refs (pinned by tests); non-ASCII or empty refs fall
        # back to the scalar path, whose results are the contract.
        # mapInArrow end to end: the input column arrives as the exact
        # Arrow string array the hash reads, and outputs leave as Arrow
        # arrays built straight from the numpy results — no pandas.
        import numpy as np
        import pyarrow as pa

        str_t, int_t = pa.string(), pa.int32()
        feat_t = pa.list_(pa.float32())
        names = ["media_ref", "modality", "width", "height",
                 "duration_ms", "feature"]
        pw_cache: dict[int, np.ndarray] = {}

        def powers(maxlen: int) -> np.ndarray:
            pw = pw_cache.get(maxlen)
            if pw is None:
                pw = np.empty(maxlen, dtype=np.int64)
                acc = 1
                for k in range(maxlen):
                    pw[k] = acc
                    acc = (acc * 131) & 0x7FFFFFFF
                pw_cache[maxlen] = pw
            return pw

        def scalar(refs) -> "pa.RecordBatch":
            rows = {"media_ref": [], "modality": [], "width": [],
                    "height": [], "duration_ms": [], "feature": []}
            for ref in refs:
                if ref is None:
                    continue
                modality, w, hgt, dur, feat = _fake_decode(ref)
                rows["media_ref"].append(ref)
                rows["modality"].append(modality)
                rows["width"].append(w)
                rows["height"].append(hgt)
                rows["duration_ms"].append(dur)
                rows["feature"].append(feat)
            return pa.RecordBatch.from_arrays(
                [pa.array(rows["media_ref"], str_t),
                 pa.array(rows["modality"], str_t),
                 pa.array(rows["width"], int_t),
                 pa.array(rows["height"], int_t),
                 pa.array(rows["duration_ms"], int_t),
                 pa.array(rows["feature"], feat_t)], names=names)

        for rb in batches:
            arr = rb.column(0)
            if arr.null_count:
                arr = arr.drop_null()
            n = len(arr)
            if n == 0:
                yield scalar([])
                continue
            offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)
            offs = offs[arr.offset:arr.offset + n + 1].astype(np.int64)
            data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
            starts, ends = offs[:-1], offs[1:]
            lens = ends - starts
            seg = data[starts[0]:ends[-1]]
            if lens.min() == 0 or seg.max(initial=0) > 127:
                # empty or non-ASCII ref: the scalar path is the contract
                yield scalar(arr.to_pylist())
                continue
            # per-char exponents: ends[i]-1-pos for pos in [starts[i],ends[i])
            abs_pos = np.arange(starts[0], ends[-1], dtype=np.int64)
            expo = np.repeat(ends, lens) - 1 - abs_pos
            contrib = seg.astype(np.int64) * powers(int(lens.max()))[expo]
            hs = np.add.reduceat(contrib, starts - starts[0]) % 0x80000000
            # modality: full 6-byte prefix match, vectorized
            p = starts

            def prefix_is(txt: str) -> np.ndarray:
                m = lens >= len(txt)
                for k, ch in enumerate(txt):
                    m &= data[np.minimum(p + k, len(data) - 1)] == ord(ch)
                return m
            is_img = prefix_is("img://")
            is_vid = prefix_is("vid://")
            is_aud = prefix_is("aud://")
            modality = np.where(
                is_img, "image", np.where(
                    is_vid, "video", np.where(
                        is_aud, "audio", "unknown")))
            width = 160 + hs % 1920
            height = 90 + (hs >> 8) % 1080
            duration = np.where(is_img, 0, 1000 + (hs >> 16) % 600000)
            # (n, 8) float32 features as one flat buffer -> list array
            flat = ((hs[:, None] >> np.arange(8)) % 256 / 255.0) \
                .astype(np.float32).ravel()
            feature = pa.FixedSizeListArray.from_arrays(
                pa.array(flat, pa.float32()), 8).cast(feat_t)
            yield pa.RecordBatch.from_arrays(
                [arr,
                 pa.array(modality.tolist(), str_t),
                 pa.array(width, int_t),
                 pa.array(height, int_t),
                 pa.array(duration, int_t),
                 feature], names=names)

    return media_refs.select(ref_col).mapInArrow(
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
