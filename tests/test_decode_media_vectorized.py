"""The vectorized decode_media batch path must be bit-identical to the
scalar _fake_decode contract — including the fallback cases (None refs
dropped, empty refs, non-ASCII refs)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))


@pytest.fixture(scope="module")
def spark():
    from html_qt_spark.plans.session import get_spark

    s = get_spark(cpus=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_vectorized_matches_scalar_contract(spark):
    from html_qt_spark.operators.multimodal import _fake_decode, decode_media

    refs = [
        "img://cdn-a/123", "vid://987654", "aud://host/x.y",
        "other://scheme", "short", "img://" + "z" * 120,
        "",                       # empty ref -> scalar fallback batch
        "vid://föö/1",  # non-ASCII -> scalar fallback batch
        None,                     # dropped
        "img://cdn-b/456",
    ]
    df = spark.createDataFrame([(r,) for r in refs], "media_ref string")
    got = {r["media_ref"]: r for r in decode_media(df).collect()}
    expected_refs = [r for r in refs if r is not None]
    assert set(got) == set(expected_refs)
    for ref in expected_refs:
        modality, w, h, dur, feat = _fake_decode(ref)
        row = got[ref]
        assert row.modality == modality, ref
        assert row.width == w and row.height == h, ref
        assert row.duration_ms == dur, ref
        import numpy as np
        # the declared schema is array<float>: both paths cast their
        # (identical) float64 values to float32 at the Arrow boundary
        assert row.feature == [float(np.float32(x)) for x in feat], ref
