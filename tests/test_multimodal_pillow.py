"""Import-gated real image codec (VERDICT r14 item 7).

Without Pillow (this container's normal state) the suite documents the
closed gate: ``decoder='image'`` still raises the seam's
NotImplementedError and the module gate is None.  With Pillow present
the same call decodes real PNG headers through the identical
mapInPandas plumbing and schema as the fake decoder.
"""

from __future__ import annotations

import pytest

from spark_dns_spark.operators import multimodal as mm

_HAVE_PIL = mm._pil_image is not None


def test_gate_state_matches_import():
    try:
        import PIL  # noqa: F401

        assert _HAVE_PIL
    except ImportError:
        assert not _HAVE_PIL


@pytest.mark.skipif(_HAVE_PIL, reason="Pillow present: gate is open")
def test_real_decoder_raises_without_pillow(spark):
    df = spark.createDataFrame(
        [(1, "image", b"\x00")], "doc_id long, kind string, payload binary"
    )
    with pytest.raises(NotImplementedError, match="image"):
        mm.decode_features(df, decoder="image")


@pytest.mark.skipif(not _HAVE_PIL, reason="Pillow not installed")
def test_pillow_decode_real_png(spark):
    import io

    sizes = [(3, 5), (7, 2)]
    rows = []
    for i, (w, h) in enumerate(sizes):
        im = mm._pil_image.new("RGB", (w, h))
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        rows.append((i, "image", bytearray(buf.getvalue())))
    df = spark.createDataFrame(
        rows, "doc_id long, kind string, payload binary"
    )
    out = {
        r["doc_id"]: r
        for r in mm.decode_features(df, decoder="image").collect()
    }
    for i, (w, h) in enumerate(sizes):
        assert (out[i]["width"], out[i]["height"]) == (w, h)
        assert out[i]["n_pixels"] == w * h
        assert out[i]["n_bytes"] > 0
