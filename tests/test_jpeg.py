"""Baseline JPEG codec: exact DC-only round-trips (the oracle contract),
near-lossless q=1 round-trips over noise (AC Huffman + zigzag + IDCT),
4:2:0 and restart-marker paths, error modes, and — when the reference
corpus is present — conformance against a real libjpeg-produced file."""

from __future__ import annotations

import os

import numpy as np
import pytest

from military_entity_extraction_based_on_large_models_spark.operators.jpeg import (
    DEFAULT_QUANT,
    EXACT_QUANT,
    decode_jpeg,
    encode_jpeg,
)

ONES = np.ones(64, dtype=np.int64)


def test_flat_gray_exact():
    img = np.full((16, 24), 117, dtype=np.uint8)
    got = decode_jpeg(encode_jpeg(img, quant_luma=EXACT_QUANT))
    assert got.shape == (16, 24, 1)
    assert (got[:, :, 0] == img).all()


def test_tiled_gray_exact_dpcm_chain():
    # distinct DC per block exercises the DPCM prediction chain and the
    # category/amplitude coding for positive AND negative diffs
    tiles = (
        (np.arange(5)[:, None] * 13 + np.arange(7)[None, :] * 7 + 50) % 256
    ).astype(np.uint8)
    img = np.kron(tiles, np.ones((8, 8), dtype=np.uint8))
    got = decode_jpeg(encode_jpeg(img, quant_luma=EXACT_QUANT))
    assert (got[:, :, 0] == img).all()


def test_noisy_q1_near_lossless():
    rng = np.random.RandomState(5)
    noisy = rng.randint(0, 256, (17, 19, 3)).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(noisy, quant_luma=ONES, quant_chroma=ONES))
    assert got.shape == (17, 19, 3)
    # only YCbCr<->RGB rounding remains
    assert np.abs(got.astype(int) - noisy.astype(int)).max() <= 3
    gray = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    gg = decode_jpeg(encode_jpeg(gray, quant_luma=ONES))
    # no color transform: float DCT rounding only
    assert np.abs(gg[:, :, 0].astype(int) - gray.astype(int)).max() <= 1


def test_gradient_444_and_420_bounded():
    yy, xx = np.mgrid[0:24, 0:33]
    img = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, (xx + yy) % 256], axis=-1
    ).astype(np.uint8)
    g444 = decode_jpeg(encode_jpeg(img))
    assert g444.shape == (24, 33, 3)
    assert np.abs(g444.astype(int) - img.astype(int)).max() <= 14
    g420 = decode_jpeg(encode_jpeg(img, subsampling="420"))
    assert g420.shape == (24, 33, 3)
    # chroma is 2x2-averaged and replicated back: looser but bounded
    assert np.abs(g420.astype(int) - img.astype(int)).max() <= 48


def test_restart_markers_do_not_change_pixels():
    yy, xx = np.mgrid[0:24, 0:33]
    img = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, (xx + yy) % 256], axis=-1
    ).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(img))
    rst = decode_jpeg(encode_jpeg(img, restart_interval=2))
    assert (plain == rst).all()


def test_odd_dimensions_pad_and_crop():
    rng = np.random.RandomState(9)
    for h, w in [(1, 1), (7, 10), (9, 17)]:
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        got = decode_jpeg(encode_jpeg(img, quant_luma=ONES, quant_chroma=ONES))
        assert got.shape == (h, w, 3)
        assert np.abs(got.astype(int) - img.astype(int)).max() <= 3


def test_error_modes():
    img = np.full((8, 8), 100, dtype=np.uint8)
    good = encode_jpeg(img)
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_jpeg(good[:40])  # truncated in the tables
    with pytest.raises(ValueError):
        decode_jpeg(good[:-20])  # truncated entropy data
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(img, subsampling="422")
    with pytest.raises(ValueError, match="empty"):
        encode_jpeg(np.zeros((0, 4), dtype=np.uint8))


def test_decode_image_dispatches_jpeg():
    from military_entity_extraction_based_on_large_models_spark.operators.multimodal import (
        decode_image,
    )

    img = np.full((8, 16), 77, dtype=np.uint8)
    got = decode_image(encode_jpeg(img, quant_luma=EXACT_QUANT))
    assert (got[:, :, 0] == img).all()


_REF_JPG = "/root/reference/数据集/sample_image/52.jpg"


@pytest.mark.skipif(
    not os.path.exists(_REF_JPG),
    reason="reference image corpus not mounted",
)
def test_real_world_libjpeg_file_conformance():
    """A real libjpeg-produced baseline file (standard Annex K Huffman
    tables, JFIF APP0, real subsampling) must decode: proves the decoder
    is not merely the inverse of our own encoder."""
    px = decode_jpeg(open(_REF_JPG, "rb").read())
    assert px.ndim == 3 and px.shape[2] in (1, 3)
    assert px.shape[0] > 50 and px.shape[1] > 50
    # a photograph: non-degenerate dynamic range
    assert int(px.max()) - int(px.min()) > 50


def test_png_jpeg_property_roundtrips():
    """Hypothesis sweep: arbitrary small images round-trip losslessly
    through PNG and within the q=1 bound through JPEG."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from military_entity_extraction_based_on_large_models_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        ch=st.sampled_from([1, 3]),
        seed=st.integers(0, 2**31 - 1),
    )
    def run(h, w, ch, seed):
        rng = np.random.RandomState(seed)
        px = rng.randint(0, 256, (h, w, ch)).astype(np.uint8)
        assert (decode_png(encode_png(px)) == px).all()
        got = decode_jpeg(encode_jpeg(px, quant_luma=ONES, quant_chroma=ONES))
        assert got.shape == (h, w, ch if ch == 3 else 1)
        tol = 3 if ch == 3 else 1  # color-transform rounding vs none
        assert np.abs(got.astype(int) - px.astype(int)).max() <= tol

    run()


# ------------------------------------------------------------ progressive


def test_progressive_flat_gray_exact():
    img = np.full((16, 24), 117, dtype=np.uint8)
    p = encode_jpeg(img, quant_luma=EXACT_QUANT, progressive=True)
    assert b"\xff\xc2" in p and b"\xff\xc0" not in p  # SOF2, no SOF0
    got = decode_jpeg(p)
    assert (got[:, :, 0] == img).all()


def test_progressive_tiled_gray_exact():
    # distinct DC per block: DC first scan at Al=1 + DC refinement must
    # reassemble every DPCM value exactly (arithmetic-shift consistency)
    tiles = (
        (np.arange(5)[:, None] * 13 + np.arange(7)[None, :] * 7 + 50) % 256
    ).astype(np.uint8)
    img = np.kron(tiles, np.ones((8, 8), dtype=np.uint8))
    got = decode_jpeg(encode_jpeg(img, quant_luma=EXACT_QUANT, progressive=True))
    assert (got[:, :, 0] == img).all()


def test_progressive_equals_baseline_exactly():
    """Progressive is a different LOSSLESS arrangement of the same
    quantized coefficients, so its decode must equal the baseline decode
    bit-for-bit — this gates every scan kind (DC first/refine, AC first
    with EOB runs, AC refinement with correction bits) against the
    independent sequential path."""
    rng = np.random.RandomState(11)
    cases = [
        ((24, 32, 3), "444", 0),
        ((17, 23, 3), "420", 0),
        ((9, 13), "444", 0),
        ((40, 40, 3), "444", 3),   # restart markers inside every scan
        ((33, 31, 3), "420", 2),
    ]
    for shape, sub, rst in cases:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, subsampling=sub))
        prog = decode_jpeg(
            encode_jpeg(
                img, subsampling=sub, progressive=True, restart_interval=rst
            )
        )
        assert (base == prog).all(), (shape, sub, rst)


def test_progressive_q1_near_lossless():
    rng = np.random.RandomState(13)
    noisy = rng.randint(0, 256, (19, 21, 3)).astype(np.uint8)
    got = decode_jpeg(
        encode_jpeg(noisy, quant_luma=ONES, quant_chroma=ONES, progressive=True)
    )
    assert np.abs(got.astype(int) - noisy.astype(int)).max() <= 3


def test_progressive_property_equals_baseline():
    """Hypothesis sweep: baseline/progressive decode equality on arbitrary
    small images across channel counts and subsampling."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        ch=st.sampled_from([1, 3]),
        sub=st.sampled_from(["444", "420"]),
        seed=st.integers(0, 2**31 - 1),
    )
    def run(h, w, ch, sub, seed):
        rng = np.random.RandomState(seed)
        px = rng.randint(0, 256, (h, w, ch)).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(px, subsampling=sub))
        prog = decode_jpeg(encode_jpeg(px, subsampling=sub, progressive=True))
        assert (base == prog).all()

    run()


def test_progressive_error_modes():
    img = np.full((24, 24), 99, dtype=np.uint8)
    good = encode_jpeg(img, progressive=True)
    with pytest.raises(ValueError):
        decode_jpeg(good[:-4])  # EOI (and tail entropy) cut off
    # truncation INSIDE a later scan's entropy data
    with pytest.raises(ValueError):
        decode_jpeg(good[: int(len(good) * 0.7)])
    # non-baseline, non-progressive SOFs still refuse honestly
    bad = bytearray(good)
    i = bad.find(b"\xff\xc2")
    bad[i + 1] = 0xC3
    with pytest.raises(ValueError, match="SOF0/1.*SOF2|progressive"):
        decode_jpeg(bytes(bad))
