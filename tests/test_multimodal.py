"""Multimodal plumbing: binary columns through Arrow stages (decode is a
deterministic fake — no image libs in this container)."""

from __future__ import annotations

import hashlib

from military_entity_extraction_based_on_large_models_spark.operators import multimodal


def _media(spark):
    rows = [
        ("m1", "image", b"\x89PNG-fake-bytes-1", 0, 0, 0),
        ("m2", "image", b"\x89PNG-fake-bytes-2", 0, 0, 0),
        ("m3", "audio", None, 0, 0, 0),  # null payload → error row
    ]
    return spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)


def test_feature_extraction_deterministic(spark):
    media = _media(spark)
    feats = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
    assert len(feats) == 3
    assert feats["m1"]["payload_sha"] == hashlib.sha256(b"\x89PNG-fake-bytes-1").hexdigest()
    assert feats["m1"]["n_bytes"] == 17
    assert feats["m1"]["error"] is None
    # error containment, not task failure
    assert feats["m3"]["error"] is not None and feats["m3"]["payload_sha"] is None
    # determinism
    again = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
    assert feats["m2"]["feat_0"] == again["m2"]["feat_0"]


def test_resize_stub_schema(spark):
    media = _media(spark)
    out = multimodal.resize_stub(media, 224, 224)
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in media.schema.fields
    ]
    assert all(r["width"] == 224 for r in out.collect())


# ---- REAL BMP codec (r4: dependency-free 24-bit decode) --------------------

def _golden_2x2_bmp():
    """Hand-assembled from the BMP spec (not via encode_bmp): 2x2 RGB image
      top row:    (255,0,0) (0,255,0)
      bottom row: (0,0,255) (10,20,30)
    24bpp, bottom-up → bottom row stored first, BGR, rows padded 6→8 bytes."""
    header = (
        b"BM" + (70).to_bytes(4, "little") + b"\x00\x00\x00\x00" + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + (2).to_bytes(4, "little", signed=True) + (2).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + (16).to_bytes(4, "little")
        + (2835).to_bytes(4, "little", signed=True) + (2835).to_bytes(4, "little", signed=True)
        + (0).to_bytes(4, "little") + (0).to_bytes(4, "little")
    )
    row_bottom = bytes([255, 0, 0, 30, 20, 10]) + b"\x00\x00"   # BGR: blue px, (10,20,30)
    row_top = bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"       # BGR: red px, green px
    return header + row_bottom + row_top


def test_decode_bmp_golden_bytes():
    px = multimodal.decode_bmp(_golden_2x2_bmp())
    assert px.shape == (2, 2, 3)
    assert px[0, 0].tolist() == [255, 0, 0]
    assert px[0, 1].tolist() == [0, 255, 0]
    assert px[1, 0].tolist() == [0, 0, 255]
    assert px[1, 1].tolist() == [10, 20, 30]
    # the encoder writes the byte-identical file back
    assert multimodal.encode_bmp(px) == _golden_2x2_bmp()


def test_bmp_roundtrip_widths():
    import numpy as np

    rng = np.random.default_rng(7)
    for w, h in [(1, 1), (3, 2), (4, 4), (5, 7), (16, 3)]:  # padded + unpadded strides
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = multimodal.decode_bmp(multimodal.encode_bmp(px))
        assert (out == px).all(), (w, h)


def test_decode_bmp_top_down_and_errors():
    import numpy as np
    import pytest

    px = multimodal.synthetic_bmp_pixels(5, 4, 2)
    data = bytearray(multimodal.encode_bmp(px))
    # flip height sign → top-down storage; rows must NOT be re-flipped
    data[22:26] = (-2).to_bytes(4, "little", signed=True)
    top_down = multimodal.decode_bmp(bytes(data))
    assert (top_down == px[::-1]).all()

    with pytest.raises(ValueError, match="not a BMP"):
        multimodal.decode_bmp(b"\x89PNG not a bmp")
    with pytest.raises(ValueError, match="truncated"):
        multimodal.decode_bmp(multimodal.encode_bmp(px)[:-3])
    bad_bpp = bytearray(multimodal.encode_bmp(px))
    bad_bpp[28] = 8
    with pytest.raises(ValueError, match="unsupported"):
        multimodal.decode_bmp(bytes(bad_bpp))


def test_extract_image_features_real_decode(spark):
    import pandas as pd

    px = multimodal.synthetic_bmp_pixels(42, 6, 5)
    rows = [
        ("g1", multimodal.encode_bmp(px)),
        ("bad", b"JFIF-no-codec-for-this"),
    ]
    media = spark.createDataFrame(rows, ["media_id", "payload"])
    feats = {r["media_id"]: r for r in multimodal.extract_image_features(media).collect()}
    g = feats["g1"]
    assert (g["width"], g["height"]) == (6, 5)
    assert g["n_bytes"] == 54 + 5 * 20  # stride(6)=20
    assert g["px00_r"] == int(px[0, 0, 0]) and g["px00_b"] == int(px[0, 0, 2])
    assert g["mean_all"] == f"{int(px.sum(dtype='int64')) / (6 * 5 * 3):.6f}"
    assert g["error"] is None
    # row-level containment for the genuinely-undecodable payload
    assert feats["bad"]["error"] is not None and feats["bad"]["width"] is None


# ---------------------------------------------------------------------------
# r6: real PNG codec
# ---------------------------------------------------------------------------


def test_png_roundtrip_all_channels_and_filters():
    import numpy as np

    from military_entity_extraction_based_on_large_models_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(3)
    # heights > 5 exercise every filter type (encoder cycles y % 5);
    # widths straddle the bpp boundary and the int16-cumsum hazard width
    for ch in (1, 2, 3, 4):
        for h, w in [(1, 1), (6, 3), (9, 257)]:
            px = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
            rt = decode_png(encode_png(px))
            assert rt.shape == (h, w, ch)
            assert (rt == px).all(), (ch, h, w)


def test_png_golden_bytes():
    """Pin the container format itself: a hand-checked 2x2 RGB image with
    filter types 0 (row 0) and 1 (row 1)."""
    import numpy as np

    from military_entity_extraction_based_on_large_models_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    px = np.array(
        [[[10, 20, 30], [40, 50, 60]], [[70, 80, 90], [100, 110, 120]]],
        dtype=np.uint8,
    )
    data = encode_png(px)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert data[12:16] == b"IHDR"
    # IHDR: w=2, h=2, depth=8, color type 2 (RGB), no interlace
    assert data[16:29] == bytes(
        [0, 0, 0, 2, 0, 0, 0, 2, 8, 2, 0, 0, 0]
    )
    assert (decode_png(data) == px).all()


def test_png_error_modes():
    import numpy as np
    import pytest

    from military_entity_extraction_based_on_large_models_spark.operators.multimodal import (
        decode_image,
        decode_png,
        encode_png,
    )

    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    good = encode_png(px)
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"nope" * 4)
    corrupt = bytearray(good)
    corrupt[60] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|chunk"):
        decode_png(bytes(corrupt))
    with pytest.raises(ValueError, match="truncated|missing"):
        decode_png(good[:40])
    with pytest.raises(ValueError):  # JPEG magic but truncated garbage
        decode_image(b"\xff\xd8\xff\xe0JFIF")
    with pytest.raises(ValueError, match="unknown image format"):
        decode_image(b"GIF89a...")


def test_extract_image_features_png_matches_bmp(spark):
    """The SAME synthetic pixels through both real containers must yield
    identical stats — cross-codec agreement is the in-Spark counterpart of
    the media_features_png DuckDB oracle."""
    from military_entity_extraction_based_on_large_models_spark.operators.multimodal import (
        extract_image_features,
        synthetic_bmp_media,
        synthetic_png_media,
    )

    from pyspark.sql import functions as F

    docs = spark.range(12).select(F.col("id").alias("doc_id"))
    cols = ["media_id", "width", "height", "px00_r", "px00_g", "px00_b", "mean_all"]
    bmp = {
        tuple(r)
        for r in extract_image_features(synthetic_bmp_media(docs))
        .select(*cols).collect()
    }
    png = {
        tuple(r)
        for r in extract_image_features(synthetic_png_media(docs))
        .select(*cols).collect()
    }
    assert bmp == png and len(bmp) == 12
