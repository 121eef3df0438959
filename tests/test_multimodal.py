"""Multimodal plumbing: binaryFile source, decode kernels, batch shapes."""

from __future__ import annotations

import numpy as np
import pytest

from data_pipeline_framework_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    rng = np.random.default_rng(42)
    # "images": 2D/3D arrays in npy containers
    for i in range(4):
        arr = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
        (d / f"img_{i}.npy").write_bytes(MM.encode_npy(arr))
    # a "video": (frames, h, w) array
    video = rng.integers(0, 256, size=(10, 8, 8), dtype=np.uint8)
    (d / "clip_0.vnpy").write_bytes(MM.encode_npy(video))
    return str(d)


def test_read_binary_files_glob(spark, media_dir):
    df = MM.read_binary_files(spark, media_dir, glob="img_*.npy")
    assert df.count() == 4
    assert {"path", "content", "length"} <= set(df.columns)
    meta = MM.with_media_metadata(df, "image", "npy")
    row = meta.first()
    assert row["modality"] == "image" and row["format"] == "npy"
    assert row["content_bytes"] == row["length"]


def test_byte_stats_no_decode(spark, media_dir):
    df = MM.with_media_metadata(
        MM.read_binary_files(spark, media_dir, glob="img_0.npy"), "image", "npy"
    )
    row = MM.byte_stats(df).first()
    assert row["byte_size"] == row["length"]
    assert 0 < row["byte_mean"] < 255
    assert 0 < row["byte_entropy"] <= 8.0


def test_image_stats_decode(spark, media_dir):
    df = MM.with_media_metadata(
        MM.read_binary_files(spark, media_dir, glob="img_*.npy"), "image", "npy"
    )
    rows = MM.image_stats(df).collect()
    assert len(rows) == 4
    for r in rows:
        assert (r["height"], r["width"], r["channels"]) == (32, 48, 3)
        assert 100 < r["mean_intensity"] < 155  # uniform bytes ~127.5


def test_resize_average_pool(spark, media_dir):
    df = MM.with_media_metadata(
        MM.read_binary_files(spark, media_dir, glob="img_0.npy"), "image", "npy"
    )
    out = MM.resize_images(df, 16, 24).first()
    resized = MM.decode_npy(bytes(out["resized"]))
    assert resized.shape == (16, 24, 3)
    # average pooling preserves the global mean exactly (integer factors)
    orig = MM.decode_npy(bytes(out["content"])).astype(np.float64)
    assert resized.mean() == pytest.approx(orig.mean(), rel=1e-6)


def test_video_frame_sampling(spark, media_dir):
    df = MM.with_media_metadata(
        MM.read_binary_files(spark, media_dir, glob="clip_*.vnpy"),
        "video", "npy",
    )
    frames = MM.sample_frames(df, every_n=3).collect()
    assert [f["frame_idx"] for f in frames] == [0, 3, 6, 9]
    assert all(f["n_frames"] == 10 for f in frames)
    f0 = MM.decode_npy(bytes(frames[0]["frame"]))
    assert f0.shape == (8, 8)


def test_audio_features(spark):
    # 1 kHz sine at 16 kHz for 0.5 s: rms = 1/sqrt(2), zc = 2*freq*dur - 1ish
    t = np.arange(8000) / 16000.0
    wave = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    blob = MM.encode_npy(wave)
    df = spark.createDataFrame([("a.npy", bytearray(blob), "npy")],
                               ["path", "content", "format"])
    row = MM.audio_features(df).first()
    assert row["n_samples"] == 8000
    assert row["duration_sec"] == pytest.approx(0.5)
    assert row["rms"] == pytest.approx(1 / np.sqrt(2), rel=1e-3)
    assert abs(row["zero_crossings"] - 1000) <= 1
    assert row["zcr"] == pytest.approx(1000 / 7999, rel=1e-2)


def test_unsupported_format_raises(spark, media_dir):
    # npy bytes mislabeled as jpeg: the baseline JPEG decoder rejects
    # them (no SOI marker) instead of decoding garbage
    df = MM.with_media_metadata(
        MM.read_binary_files(spark, media_dir, glob="img_0.npy"),
        "image", "jpeg",  # wrong format on purpose
    )
    with pytest.raises(Exception) as exc_info:
        MM.image_stats(df).collect()
    msg = str(exc_info.value)
    assert "SOI" in msg or "NotImplementedError" in msg or isinstance(
        exc_info.value, (NotImplementedError, ValueError)
    )
    # a genuinely unknown format still raises the dispatch error
    df2 = MM.with_media_metadata(
        MM.read_binary_files(spark, media_dir, glob="img_0.npy"),
        "image", "tiff",
    )
    with pytest.raises(Exception) as exc2:
        MM.image_stats(df2).collect()
    assert "unknown media format" in str(exc2.value)


def test_wav_decode_stdlib_end_to_end(spark):
    """Real WAV bytes (stdlib wave writer) through the distributed
    audio_features kernel — the codec is no longer environment-gated."""
    import io
    import math
    import struct
    import wave as wavemod

    import numpy as np

    from data_pipeline_framework_spark.operators.multimodal import (
        audio_features,
        decode_wav,
    )

    def make_wav(freq, n=1600, sr=16000, stereo=False):
        buf = io.BytesIO()
        with wavemod.open(buf, "wb") as w:
            w.setnchannels(2 if stereo else 1)
            w.setsampwidth(2)
            w.setframerate(sr)
            for i in range(n):
                v = int(32000 * math.sin(2 * math.pi * freq * i / sr))
                frame = struct.pack("<h", v)
                w.writeframes(frame * (2 if stereo else 1))
        return buf.getvalue()

    mono = make_wav(440)
    arr = decode_wav(mono)
    assert arr.shape == (1600,) and abs(arr).max() <= 1.0
    stereo = decode_wav(make_wav(220, stereo=True))
    assert stereo.shape == (1600, 2)

    df = spark.createDataFrame(
        [(1, bytearray(mono), "wav"), (2, bytearray(make_wav(880)), "wav")],
        "media_id int, content binary, format string",
    )
    out = {r["media_id"]: r for r in audio_features(df).collect()}
    assert out[1]["n_samples"] == 1600
    assert abs(out[1]["duration_sec"] - 0.1) < 1e-9
    # a 440 Hz tone over 0.1 s crosses zero ~2*44 times; 880 Hz twice that
    assert 80 <= out[1]["zero_crossings"] <= 96
    assert 160 <= out[2]["zero_crossings"] <= 184
    assert 0.6 < out[1]["rms"] < 0.8  # sine RMS = amp/sqrt(2) ~ 0.69


# --- library-free image codecs (PNG / BMP / PPM) ---------------------------


def _spec_png(img, filters):
    """Independent spec-reference PNG builder: applies the named row
    filters per the public PNG spec with scalar per-pixel arithmetic, so
    decode_png's vectorized reconstruction is checked against a second
    implementation, not against its own encoder."""
    import zlib

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    h, w, ch = img.shape
    raw = bytearray()
    for y in range(h):
        f = filters[y % len(filters)]
        raw.append(f)
        for x in range(w):
            for k in range(ch):
                o = int(img[y, x, k])
                left = int(img[y, x - 1, k]) if x > 0 else 0
                up = int(img[y - 1, x, k]) if y > 0 else 0
                ul = int(img[y - 1, x - 1, k]) if (x > 0 and y > 0) else 0
                pred = {0: 0, 1: left, 2: up, 3: (left + up) // 2,
                        4: paeth(left, up, ul)}[f]
                raw.append((o - pred) & 255)
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = np.array([w, h], dtype=">u4").tobytes() + bytes([8, color, 0, 0, 0])

    def chunk(t, d):
        crc = zlib.crc32(t + d) & 0xFFFFFFFF
        return (np.array([len(d)], dtype=">u4").tobytes() + t + d
                + np.array([crc], dtype=">u4").tobytes())

    return (MM._PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_image_codec_roundtrips():
    rng = np.random.default_rng(7)
    g = rng.integers(0, 256, (13, 9), dtype=np.uint8)
    rgb = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    rgba = rng.integers(0, 256, (6, 6, 4), dtype=np.uint8)
    assert (MM.decode_png(MM.encode_png(g)) == g).all()
    assert (MM.decode_png(MM.encode_png(rgb)) == rgb).all()
    assert (MM.decode_png(MM.encode_png(rgba)) == rgba).all()
    assert (MM.decode_bmp(MM.encode_bmp(rgb)) == rgb).all()
    assert (MM.decode_bmp(MM.encode_bmp(g)) == np.repeat(g[:, :, None], 3, 2)).all()
    assert (MM.decode_ppm(MM.encode_ppm(g)) == g).all()
    assert (MM.decode_ppm(MM.encode_ppm(rgb)) == rgb).all()
    # netpbm comments in the header
    blob = b"P5\n# comment line\n9 13\n255\n" + g.tobytes()
    assert (MM.decode_ppm(blob) == g).all()


def test_png_all_filters_reconstruct():
    rng = np.random.default_rng(11)
    for ch in (1, 3, 4):
        img = rng.integers(0, 256, (11, 7, ch), dtype=np.uint8)
        for filters in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
            got = MM.decode_png(_spec_png(img, filters))
            if got.ndim == 2:
                got = got[:, :, None]
            assert (got == img).all(), (ch, filters)


def test_image_stats_mixed_formats(spark):
    """One DataFrame carrying PNG + BMP + PGM blobs of the same image:
    the per-row format dispatch decodes each and all stats agree."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 12), dtype=np.uint8)
    rows = [
        (1, bytearray(MM.encode_png(img)), "png"),
        (2, bytearray(MM.encode_bmp(img)), "bmp"),
        (3, bytearray(MM.encode_ppm(img)), "pgm"),
    ]
    df = spark.createDataFrame(rows, "media_id int, content binary, format string")
    out = {r["media_id"]: r for r in MM.image_stats(df).collect()}
    want_mean = float(img.mean())
    for mid, r in out.items():
        assert (r["height"], r["width"]) == (16, 12), mid
        assert r["mean_intensity"] == pytest.approx(want_mean, abs=1e-9), mid
    # bmp replicates gray to 3 channels; png/pgm stay single-channel
    assert out[1]["channels"] == 1 and out[3]["channels"] == 1
    assert out[2]["channels"] == 3


def test_resize_on_png(spark):
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (32, 24, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(MM.encode_png(img)), "png")],
        "media_id int, content binary, format string",
    )
    out = MM.resize_images(df, 16, 12).first()
    resized = MM.decode_npy(bytes(out["resized"]))
    assert resized.shape == (16, 12, 3)
    assert resized.mean() == pytest.approx(img.astype(np.float64).mean(), rel=1e-6)


def test_bmp_topdown_and_32bit():
    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    # hand-build a TOP-DOWN (negative height) 24-bit BMP
    h, w, _ = rgb.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = rgb[:, :, ::-1].reshape(h, w * 3)  # top-down BGR
    dib = (np.array([40], dtype="<u4").tobytes()
           + np.array([w, -h], dtype="<i4").tobytes()
           + np.array([1, 24], dtype="<u2").tobytes()
           + np.array([0, h * stride, 2835, 2835, 0, 0], dtype="<u4").tobytes())
    blob = (b"BM" + np.array([14 + 40 + h * stride], dtype="<u4").tobytes()
            + b"\x00\x00\x00\x00" + np.array([54], dtype="<u4").tobytes()
            + dib + body.tobytes())
    assert (MM.decode_bmp(blob) == rgb).all()

    # 32-bit BGRA, bottom-up
    rgba = rng.integers(0, 256, (4, 3, 4), dtype=np.uint8)
    h, w, _ = rgba.shape
    body32 = rgba[::-1][:, :, [2, 1, 0, 3]].reshape(h, w * 4)
    dib32 = (np.array([40], dtype="<u4").tobytes()
             + np.array([w, h], dtype="<i4").tobytes()
             + np.array([1, 32], dtype="<u2").tobytes()
             + np.array([0, h * w * 4, 2835, 2835, 0, 0], dtype="<u4").tobytes())
    blob32 = (b"BM" + np.array([14 + 40 + h * w * 4], dtype="<u4").tobytes()
              + b"\x00\x00\x00\x00" + np.array([54], dtype="<u4").tobytes()
              + dib32 + body32.tobytes())
    assert (MM.decode_bmp(blob32) == rgba).all()


def test_ppm_16bit_and_unsupported():
    import pytest as _pytest

    rng = np.random.default_rng(10)
    g16 = rng.integers(0, 65536, (3, 4), dtype=np.uint16)
    blob = b"P5\n4 3\n65535\n" + g16.astype(">u2").tobytes()
    got = MM.decode_ppm(blob)
    assert got.dtype == np.dtype(">u2") and (got == g16).all()
    with _pytest.raises(NotImplementedError):
        MM.decode_ppm(b"P3\n1 1\n255\n0 0 0")  # ascii netpbm unsupported
    with _pytest.raises(NotImplementedError):
        MM.decode_bmp(b"BM" + bytes(12) + np.array([40], dtype="<u4").tobytes()
                      + np.array([1, 1], dtype="<i4").tobytes()
                      + np.array([1, 24], dtype="<u2").tobytes()
                      + np.array([1], dtype="<u4").tobytes() + bytes(20))


def _dhash_reference(img: np.ndarray, rows: int = 7, cols: int = 8) -> int:
    """Independent dHash reference: continuous box resize of the
    grayscale image to a (rows, cols+1) grid using exact Fraction
    areas, then row-major adjacent-cell comparisons."""
    from fractions import Fraction

    if img.ndim == 3:
        gray = [
            [Fraction(int(img[r, c].sum())) for c in range(img.shape[1])]
            for r in range(img.shape[0])
        ]
    else:
        gray = [
            [Fraction(int(img[r, c])) for c in range(img.shape[1])]
            for r in range(img.shape[0])
        ]
    h_in, w_in = len(gray), len(gray[0])

    def cell(r: int, c: int, n_rows: int, n_cols: int) -> Fraction:
        r0, r1 = Fraction(r * h_in, n_rows), Fraction((r + 1) * h_in, n_rows)
        c0, c1 = Fraction(c * w_in, n_cols), Fraction((c + 1) * w_in, n_cols)
        total = Fraction(0)
        for i in range(h_in):
            ov_r = min(r1, i + 1) - max(r0, i)
            if ov_r <= 0:
                continue
            for j in range(w_in):
                ov_c = min(c1, j + 1) - max(c0, j)
                if ov_c > 0:
                    total += ov_r * ov_c * gray[i][j]
        return total

    grid = [
        [cell(r, c, rows, cols + 1) for c in range(cols + 1)]
        for r in range(rows)
    ]
    h = 0
    for r in range(rows):
        for c in range(cols):
            if grid[r][c] > grid[r][c + 1]:
                h |= 1 << (r * cols + c)
    return h


def test_dhash_images_and_hamming_pairs(spark):
    from data_pipeline_framework_spark.functions.dedup import (
        hamming_hash_pairs,
    )

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    # near-dup: +-1 noise almost never flips an adjacent-pixel gradient
    noisy = np.clip(
        base.astype(np.int16) + rng.integers(-1, 2, size=(8, 8)), 0, 255
    ).astype(np.uint8)
    other = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    rows = [
        (0, MM.encode_png(base), "png"),
        (1, MM.encode_png(noisy), "png"),
        (2, MM.encode_png(other), "png"),
        (3, MM.encode_png(base), "png"),  # exact re-encode of 0
    ]
    df = spark.createDataFrame(rows, "id long, content binary, format string")
    sig = MM.dhash_images(df).select("id", "dhash")
    got = {r["id"]: r["dhash"] for r in sig.collect()}
    # exact duplicate -> identical hash; independent image -> far away
    assert got[0] == got[3]
    assert bin(got[0] ^ got[2]).count("1") > 3
    # reference hash from an independent continuous-area box resize to
    # the fixed 7x9 grid (Fraction arithmetic, no shared code path)
    assert got[0] == _dhash_reference(base)

    pairs = hamming_hash_pairs(
        sig, "id", "dhash", bits=56, max_hamming=3, n_blocks=4
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 3) in found
    assert all({a, b} != {0, 2} and {a, b} != {2, 3} for a, b in found)
    ham03 = [r["hamming"] for r in pairs if (r["id_a"], r["id_b"]) == (0, 3)]
    assert ham03 == [0]


def test_audio_fingerprints_and_dedup(spark):
    from data_pipeline_framework_spark.functions.dedup import (
        hamming_hash_pairs,
    )

    rng = np.random.default_rng(11)
    base = rng.normal(0, 1, 64).astype(np.float32)
    noisy = (base + rng.normal(0, 1e-4, 64).astype(np.float32)).astype(
        np.float32
    )
    other = rng.normal(0, 1, 64).astype(np.float32)
    rows = [
        (0, MM.encode_npy(base), "npy"),
        (1, MM.encode_npy(noisy), "npy"),
        (2, MM.encode_npy(other), "npy"),
    ]
    df = spark.createDataFrame(rows, "id long, content binary, format string")
    sig = MM.audio_fingerprints(df, n_frames=32).select("id", "afp")
    got = {r["id"]: r["afp"] for r in sig.collect()}
    # reference hash straight from the samples
    en = (base.astype(np.float64)[:64].reshape(32, 2) ** 2).sum(axis=1)
    expect = sum(1 << i for i in range(31) if en[i + 1] > en[i])
    assert got[0] == expect
    # tiny noise cannot flip many energy deltas; independent clip is far
    assert bin(got[0] ^ got[1]).count("1") <= 2
    assert bin(got[0] ^ got[2]).count("1") > 2
    pairs = hamming_hash_pairs(
        sig, "id", "afp", bits=31, max_hamming=2, n_blocks=3
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in found and all(2 not in p for p in found)


def test_audio_fingerprints_short_clip_zero(spark):
    # fewer samples than frames -> hash 0, no crash
    clip = np.arange(5, dtype=np.float32)
    df = spark.createDataFrame(
        [(0, MM.encode_npy(clip), "npy")],
        "id long, content binary, format string",
    )
    row = MM.audio_fingerprints(df, n_frames=32).first()
    assert row["afp"] == 0


def test_dhash_images_general_shapes(spark):
    rng = np.random.default_rng(3)
    # 16x16 grayscale and RGB 8x8 (hashed on the channel sum) both
    # box-resize to the same fixed 7x9 grid before differencing
    big = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    rows = [
        (0, MM.encode_png(big), "png"),
        (1, MM.encode_ppm(rgb), "ppm"),
    ]
    df = spark.createDataFrame(rows, "id long, content binary, format string")
    got = {r["id"]: r["dhash"] for r in MM.dhash_images(df).collect()}
    assert got[0] == _dhash_reference(big)
    assert got[1] == _dhash_reference(rgb)
    assert 0 <= got[0] < (1 << 56) and 0 <= got[1] < (1 << 56)


def test_dhash_rescaled_copy_collides(spark):
    """The perceptual property the fixed-grid downsample buys: a
    nearest-neighbor 2x upscale of the same image hashes IDENTICALLY
    (box averages over the piecewise-constant upscale are proportional
    to the original's), while the legacy no-resize mode sees only the
    top-left strip and never collides across resolutions."""
    rng = np.random.default_rng(21)
    base = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    up2 = np.kron(base, np.ones((2, 2), dtype=np.uint8))
    rows = [
        (0, MM.encode_png(base), "png"),
        (1, MM.encode_png(up2), "png"),
    ]
    df = spark.createDataFrame(rows, "id long, content binary, format string")
    got = {r["id"]: r["dhash"] for r in MM.dhash_images(df).collect()}
    assert got[0] == got[1]

    # legacy mode: native-resolution adjacent-pixel bits, capped
    legacy = {
        r["id"]: r["dhash"]
        for r in MM.dhash_images(df, resize=False).collect()
    }
    bits = (base.astype(np.float64)[:, :-1] > base.astype(np.float64)[:, 1:])
    flat = bits.ravel()[:56]
    assert legacy[0] == sum(1 << k for k, b in enumerate(flat) if b)
    assert legacy[0] != legacy[1]
