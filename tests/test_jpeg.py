"""Library-free baseline JPEG codec (operators/jpeg.py): round-trips,
edge shapes, restart markers, graceful failure on unsupported profiles,
and integration with the multimodal decode dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from data_pipeline_framework_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
)


def _img(h, w, seed=7):
    rng = np.random.default_rng(seed)
    base = np.add.outer(np.linspace(0, 200, h), np.linspace(0, 55, w))
    return np.clip(base + rng.normal(0, 4, (h, w)), 0, 255).astype(np.uint8)


def test_gray_roundtrip_near_lossless():
    g = _img(37, 53)
    out = decode_jpeg(encode_jpeg(g, quality=100))
    assert out.shape == g.shape and out.dtype == np.uint8
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 4


def test_rgb_roundtrip_near_lossless():
    g = _img(40, 64)
    rgb = np.stack([g, 255 - g, np.roll(g, 3, 0)], -1)
    out = decode_jpeg(encode_jpeg(rgb, quality=100))
    assert out.shape == rgb.shape
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 4


def test_lossy_quality_actually_compresses():
    g = _img(64, 64)
    rgb = np.stack([g, g, g], -1)
    hi = encode_jpeg(rgb, quality=100)
    lo = encode_jpeg(rgb, quality=80)
    assert len(lo) < len(hi) * 0.6
    out = decode_jpeg(lo)
    # lossy but recognizable
    assert np.abs(out.astype(int) - rgb.astype(int)).mean() < 12


@pytest.mark.parametrize("h,w", [(8, 8), (1, 1), (9, 17), (16, 7)])
def test_non_multiple_of_8_shapes(h, w):
    g = _img(h, w)
    out = decode_jpeg(encode_jpeg(g, quality=100))
    assert out.shape == (h, w)
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 4


@pytest.mark.parametrize("ri", [1, 3, 7])
def test_restart_markers_roundtrip(ri):
    g = _img(41, 66)
    rgb = np.stack([g, 255 - g, np.roll(g, 3, 0)], -1)
    out = decode_jpeg(encode_jpeg(rgb, quality=100, restart_interval=ri))
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 4


def test_rejects_non_jpeg_and_progressive():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG....")
    g = _img(16, 16)
    blob = bytearray(encode_jpeg(g, quality=100))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(bytes(blob))


def test_multimodal_dispatch_uses_codec():
    from data_pipeline_framework_spark.operators.multimodal import _decode

    g = _img(24, 24)
    out = _decode(encode_jpeg(g, quality=100), "jpeg")
    # Pillow path (if installed) and our codec must agree near-losslessly
    assert out.shape == (24, 24)
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 4


def test_cross_decoder_agreement_if_pillow_present():
    PIL = pytest.importorskip("PIL.Image")
    import io

    g = _img(33, 47)
    rgb = np.stack([g, 255 - g, np.roll(g, 3, 0)], -1)
    blob = encode_jpeg(rgb, quality=100)
    ours = decode_jpeg(blob)
    theirs = np.asarray(PIL.open(io.BytesIO(blob)).convert("RGB"))
    assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 2
