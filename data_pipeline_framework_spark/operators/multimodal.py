"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference has no multimodal support; this is a scale-path addition for
training-data pipelines (BASELINE.json north star): media travels as a
`binary` content column with typed metadata, and every transform is an
Arrow-batched mapInPandas / pandas UDF so a 100 TB corpus processes
partition-parallel with no driver involvement.

Design:
  * `read_binary_files` — Spark's native binaryFile source (path, length,
    modificationTime, content), glob + pathGlobFilter pushdown.
  * decode: REAL, library-free, for npy (numpy container), PNG (stdlib
    zlib + spec filter reconstruction), BMP (uncompressed 8/24/32-bit),
    PPM/PGM (binary netpbm), PCM WAV (stdlib wave), and baseline JPEG
    (operators/jpeg.py: pure-numpy Huffman + IDCT decoder and a 4:4:4
    encoder; Pillow is preferred when installed and covers progressive
    JPEGs, which the native decoder rejects with NotImplementedError).
  * image ops: byte_stats (content-level), image_stats / resize
    (average-pool) on decoded arrays, video frame sampling, audio
    rms / zero-crossing features.

Batch shape: every mapInPandas kernel iterates `Iterator[pd.DataFrame]`
and yields per-batch frames — constant memory per task regardless of
corpus size; binary cells bound batch bytes via
spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import io
import math
from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# source


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Binary corpus scan via Spark's binaryFile source. Emits
    (path, modificationTime, length, content); `glob` becomes
    pathGlobFilter (pushed to the file index, never a driver loop)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def with_media_metadata(
    df: DataFrame,
    modality: str,
    fmt: str,
    content_col: str = "content",
) -> DataFrame:
    """Attach the typed metadata columns of the media data model."""
    return (
        df.withColumn("modality", F.lit(modality))
        .withColumn("format", F.lit(fmt))
        .withColumn("content_bytes", F.length(F.col(content_col)).cast("long"))
    )


# ---------------------------------------------------------------------------
# payload codecs


def encode_npy(arr: np.ndarray) -> bytes:
    """Serialize an ndarray to the `.npy` container (deterministic)."""
    buf = io.BytesIO()
    np.save(buf, arr, allow_pickle=False)
    return buf.getvalue()


def decode_npy(blob: bytes) -> np.ndarray:
    return np.load(io.BytesIO(blob), allow_pickle=False)


def _decode(blob: bytes, fmt: str) -> np.ndarray:
    if fmt == "npy":
        return decode_npy(blob)
    if fmt == "png":
        return decode_png(blob)
    if fmt == "bmp":
        return decode_bmp(blob)
    if fmt in ("ppm", "pgm"):
        return decode_ppm(blob)
    if fmt in ("jpeg", "jpg"):
        try:  # Pillow decodes every JPEG flavor when present
            from PIL import Image

            return np.asarray(Image.open(io.BytesIO(blob)))
        except ImportError:
            # library-free baseline-sequential decoder (operators/jpeg.py);
            # progressive/arithmetic JPEGs raise NotImplementedError there
            from .jpeg import decode_jpeg

            return decode_jpeg(blob)
    if fmt == "wav":
        return decode_wav(blob)
    raise ValueError(f"unknown media format: {fmt!r}")


def decode_wav(blob: bytes) -> np.ndarray:
    """PCM WAV decode with the stdlib `wave` module — no audio library
    needed. Integer samples are scaled to [-1, 1] (soundfile.read's
    float64 convention), stereo arrives as (frames, channels)."""
    import wave

    with wave.open(io.BytesIO(blob), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 1:  # unsigned 8-bit
        data = (
            np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    elif sw == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"unsupported WAV sample width: {sw}")
    return data.reshape(-1, nch) if nch > 1 else data


# --- PNG (pure stdlib-zlib + numpy; RFC 2083 critical chunks) --------------


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# IHDR color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(blob: bytes) -> np.ndarray:
    """Pure-numpy PNG decode (stdlib zlib inflate + filter reconstruction,
    per the public PNG spec). Supports bit depth 8, color types gray /
    RGB / gray+alpha / RGBA, non-interlaced — i.e. everything
    `encode_png` emits and the common training-corpus cases. Palette or
    16-bit inputs raise (re-encode upstream). Row filters 0-2 reconstruct
    fully vectorized; 3/4 (Average/Paeth) carry a left-pixel recurrence,
    so they scan width-wise per filtered row only."""
    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG byte stream")
    pos, width = 8, None
    idat = []
    while pos < len(blob):
        (length,) = np.frombuffer(blob, dtype=">u4", count=1, offset=pos)
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + int(length)]
        pos += 12 + int(length)  # length + type + data + crc
        if ctype == b"IHDR":
            width, height = np.frombuffer(data, dtype=">u4", count=2)
            depth, color, _comp, _filt, interlace = data[8:13]
            if depth != 8 or color not in _PNG_CHANNELS or interlace:
                raise NotImplementedError(
                    f"PNG depth={depth} color={color} interlace={interlace} "
                    "unsupported (8-bit gray/RGB/LA/RGBA, non-interlaced only)"
                )
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    import zlib

    raw = zlib.decompress(b"".join(idat))
    ch = _PNG_CHANNELS[color]
    w, h = int(width), int(height)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.empty((h, w, ch), dtype=np.uint8)
    prev = np.zeros((w, ch), dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).reshape(w, ch)
        if ftype == 0:
            rec = row.copy()
        elif ftype == 1:  # Sub: recon[x] = filt[x] + recon[x-1] -> prefix sum
            rec = (np.cumsum(row.astype(np.uint32), axis=0) % 256).astype(np.uint8)
        elif ftype == 2:  # Up: uint8 addition wraps mod 256 natively
            rec = row + prev
        elif ftype in (3, 4):  # Average / Paeth: left-recurrence scan
            r32 = row.astype(np.int32)
            p32 = prev.astype(np.int32)
            rec32 = np.empty((w, ch), dtype=np.int32)
            left = np.zeros(ch, dtype=np.int32)
            upleft = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                up = p32[x]
                if ftype == 3:
                    pred = (left + up) >> 1
                else:
                    p = left + up - upleft
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
                    )
                rec32[x] = (r32[x] + pred) & 255
                left, upleft = rec32[x], up
            rec = rec32.astype(np.uint8)
        else:
            raise ValueError(f"PNG filter type {ftype}")
        out[y] = rec
        prev = rec
    return out[:, :, 0] if ch == 1 else out


def encode_png(img: np.ndarray) -> bytes:
    """Deterministic PNG writer (filter 0 rows, one zlib stream).
    Accepts uint8 (h, w) gray or (h, w, {1,2,3,4}) arrays."""
    import zlib

    arr = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = (
        np.array([w, h], dtype=">u4").tobytes()
        + bytes([8, color, 0, 0, 0])
    )
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return (
            np.array([len(data)], dtype=">u4").tobytes()
            + ctype + data
            + np.array([crc], dtype=">u4").tobytes()
        )

    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# --- BMP (uncompressed BITMAPINFOHEADER) -----------------------------------


def decode_bmp(blob: bytes) -> np.ndarray:
    """Windows BMP decode: uncompressed 8-bit palette / 24-bit BGR /
    32-bit BGRX, bottom-up or top-down, 4-byte row padding. Returns
    uint8 (h, w) for paletted grayscale, else (h, w, 3|4) in RGB order."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP byte stream")
    (data_off,) = np.frombuffer(blob, dtype="<u4", count=1, offset=10)
    (dib_size,) = np.frombuffer(blob, dtype="<u4", count=1, offset=14)
    width, height = np.frombuffer(blob, dtype="<i4", count=2, offset=18)
    (bpp,) = np.frombuffer(blob, dtype="<u2", count=1, offset=28)
    (compression,) = np.frombuffer(blob, dtype="<u4", count=1, offset=30)
    if compression != 0:
        raise NotImplementedError(f"compressed BMP (method {compression})")
    w = int(width)
    h, top_down = (int(-height), True) if height < 0 else (int(height), False)
    bypp = int(bpp) // 8
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"BMP bit depth {bpp}")
    stride = (w * bypp + 3) & ~3
    rows = np.frombuffer(
        blob, dtype=np.uint8, count=h * stride, offset=int(data_off)
    ).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        pal = np.frombuffer(
            blob, dtype=np.uint8, count=256 * 4, offset=14 + int(dib_size)
        ).reshape(256, 4)[:, :3][:, ::-1]  # BGRX -> RGB
        idx = rows[:, :w]
        rgb = pal[idx]
        if (rgb[..., 0] == rgb[..., 1]).all() and (rgb[..., 1] == rgb[..., 2]).all():
            return np.ascontiguousarray(rgb[..., 0])  # grayscale palette
        return np.ascontiguousarray(rgb)
    px = rows[:, : w * bypp].reshape(h, w, bypp)
    return np.ascontiguousarray(px[:, :, 2::-1] if bypp == 3 else px[:, :, [2, 1, 0, 3]])


def encode_bmp(img: np.ndarray) -> bytes:
    """Deterministic 24-bit bottom-up BMP writer. Accepts uint8 (h, w)
    gray (replicated to RGB) or (h, w, 3)."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    dib = (
        np.array([40], dtype="<u4").tobytes()
        + np.array([w, h], dtype="<i4").tobytes()
        + np.array([1, 24], dtype="<u2").tobytes()
        + np.array([0, h * stride, 2835, 2835, 0, 0], dtype="<u4").tobytes()
    )
    header = (
        b"BM"
        + np.array([14 + 40 + h * stride], dtype="<u4").tobytes()
        + b"\x00\x00\x00\x00"
        + np.array([14 + 40], dtype="<u4").tobytes()
    )
    return header + dib + body.tobytes()


# --- PPM / PGM (netpbm binary) ---------------------------------------------


def decode_ppm(blob: bytes) -> np.ndarray:
    """Binary netpbm decode: P5 (grayscale PGM) -> (h, w), P6 (RGB PPM)
    -> (h, w, 3); maxval <= 255 -> uint8, else big-endian uint16."""
    magic = blob[:2]
    if magic not in (b"P5", b"P6"):
        raise NotImplementedError(f"netpbm magic {magic!r} (binary P5/P6 only)")
    # header: magic, width, height, maxval as whitespace-separated tokens,
    # '#' comments running to end-of-line
    tokens, pos = [], 2
    while len(tokens) < 3:
        c = blob[pos : pos + 1]
        if c == b"#":
            pos = blob.index(b"\n", pos) + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while not blob[end : end + 1].isspace():
                end += 1
            tokens.append(int(blob[pos:end]))
            pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    ch = 3 if magic == b"P6" else 1
    dt = np.uint8 if maxval < 256 else np.dtype(">u2")
    data = np.frombuffer(blob, dtype=dt, count=h * w * ch, offset=pos)
    return data.reshape((h, w, 3) if ch == 3 else (h, w))


def encode_ppm(img: np.ndarray) -> bytes:
    """Deterministic binary netpbm writer: (h, w) -> P5, (h, w, 3) -> P6."""
    arr = np.asarray(img, dtype=np.uint8)
    magic = b"P6" if arr.ndim == 3 else b"P5"
    h, w = arr.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


# ---------------------------------------------------------------------------
# mapInPandas kernels


def _map_batches(
    df: DataFrame,
    schema: T.StructType,
    per_row: Callable[[pd.DataFrame], pd.DataFrame],
) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield per_row(pdf)

    return df.mapInPandas(gen, schema)


def byte_stats(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Content-level stats straight off the raw bytes (no decode): size,
    mean byte value, byte entropy. Pure numpy per batch."""
    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("byte_size", T.LongType()),
            T.StructField("byte_mean", T.DoubleType()),
            T.StructField("byte_entropy", T.DoubleType()),
        ]
    )

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        sizes, means, ents = [], [], []
        for blob in pdf[content_col]:
            b = np.frombuffer(blob, dtype=np.uint8)
            sizes.append(len(b))
            means.append(float(b.mean()) if len(b) else 0.0)
            if len(b):
                counts = np.bincount(b, minlength=256)
                p = counts[counts > 0] / len(b)
                ents.append(float(-(p * np.log2(p)).sum()))
            else:
                ents.append(0.0)
        pdf = pdf.copy()
        pdf["byte_size"] = sizes
        pdf["byte_mean"] = means
        pdf["byte_entropy"] = ents
        return pdf

    return _map_batches(df, schema, stats)


def image_stats(
    df: DataFrame,
    content_col: str = "content",
    fmt_col: str = "format",
) -> DataFrame:
    """Decode + per-image stats: height, width, channels, mean/std
    intensity."""
    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("mean_intensity", T.DoubleType()),
            T.StructField("std_intensity", T.DoubleType()),
        ]
    )

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        h, w, c, mean, std = [], [], [], [], []
        for blob, fmt in zip(pdf[content_col], pdf[fmt_col]):
            img = _decode(bytes(blob), fmt)
            h.append(int(img.shape[0]))
            w.append(int(img.shape[1]) if img.ndim >= 2 else 1)
            c.append(int(img.shape[2]) if img.ndim >= 3 else 1)
            mean.append(float(img.mean()))
            std.append(float(img.std()))
        pdf = pdf.copy()
        pdf["height"], pdf["width"], pdf["channels"] = h, w, c
        pdf["mean_intensity"], pdf["std_intensity"] = mean, std
        return pdf

    return _map_batches(df, schema, stats)


def resize_images(
    df: DataFrame,
    target_h: int,
    target_w: int,
    content_col: str = "content",
    fmt_col: str = "format",
    out_col: str = "resized",
) -> DataFrame:
    """Average-pool resize (exact for integer downscale factors; nearest
    sampling otherwise) re-encoded as npy. Real kernel, no image libs."""
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.BinaryType())]
    )

    def resize(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for blob, fmt in zip(pdf[content_col], pdf[fmt_col]):
            img = _decode(bytes(blob), fmt).astype(np.float64)
            if img.ndim == 2:
                img = img[:, :, None]
            hh, ww, cc = img.shape
            if hh % target_h == 0 and ww % target_w == 0:
                pooled = img.reshape(
                    target_h, hh // target_h, target_w, ww // target_w, cc
                ).mean(axis=(1, 3))
            else:
                ys = (np.arange(target_h) * hh // target_h)
                xs = (np.arange(target_w) * ww // target_w)
                pooled = img[np.ix_(ys, xs)]
            out.append(encode_npy(pooled.astype(np.float32)))
        pdf = pdf.copy()
        pdf[out_col] = out
        return pdf

    return _map_batches(df, schema, resize)


def sample_frames(
    df: DataFrame,
    every_n: int = 2,
    content_col: str = "content",
    fmt_col: str = "format",
    id_cols: tuple[str, ...] = ("path",),
) -> DataFrame:
    """Video frame sampling: a video is a (frames, h, w[, c]) array; emit
    one row per kept frame (frame_idx, frame as npy). Explodes inside the
    executor — a 10k-frame video never materializes as one row downstream."""
    fields = [f for f in df.schema.fields if f.name in id_cols]
    schema = T.StructType(
        fields
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def frames(pdf: pd.DataFrame) -> pd.DataFrame:
        # zip over plain column lists instead of pdf.iterrows(): iterrows
        # builds a Series per row (dtype boxing per field), measurable at
        # million-image batch sizes; the per-blob decode is inherently
        # Python either way
        rows = []
        id_values = [pdf[c].tolist() for c in id_cols]
        for blob, fmt, *ids in zip(
            pdf[content_col], pdf[fmt_col], *id_values
        ):
            video = _decode(bytes(blob), fmt)
            n = video.shape[0]
            base = dict(zip(id_cols, ids))
            for i in range(0, n, every_n):
                rows.append(
                    {**base, "frame_idx": i, "n_frames": n,
                     "frame": encode_npy(video[i])}
                )
        return pd.DataFrame(
            rows, columns=[*id_cols, "frame_idx", "n_frames", "frame"]
        )

    return _map_batches(df, schema, frames)


def audio_features(
    df: DataFrame,
    content_col: str = "content",
    fmt_col: str = "format",
    sample_rate: int = 16_000,
) -> DataFrame:
    """Waveform features: duration, RMS, zero-crossing count/rate."""
    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("n_samples", T.LongType()),
            T.StructField("duration_sec", T.DoubleType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zero_crossings", T.LongType()),
            T.StructField("zcr", T.DoubleType()),
        ]
    )

    def feats(pdf: pd.DataFrame) -> pd.DataFrame:
        ns, dur, rms, zc, zcr = [], [], [], [], []
        for blob, fmt in zip(pdf[content_col], pdf[fmt_col]):
            wave = _decode(bytes(blob), fmt).astype(np.float64).ravel()
            n = len(wave)
            ns.append(n)
            dur.append(n / sample_rate)
            rms.append(float(np.sqrt((wave ** 2).mean())) if n else 0.0)
            crossings = int(((wave[:-1] * wave[1:]) < 0).sum()) if n > 1 else 0
            zc.append(crossings)
            zcr.append(crossings / (n - 1) if n > 1 else 0.0)
        pdf = pdf.copy()
        pdf["n_samples"], pdf["duration_sec"] = ns, dur
        pdf["rms"], pdf["zero_crossings"], pdf["zcr"] = rms, zc, zcr
        return pdf

    return _map_batches(df, schema, feats)


def dhash_grid_dims(max_bits: int) -> tuple[int, int]:
    """(rows, cols) of the dHash comparison grid: rows * cols ==
    max_bits with rows the largest divisor <= sqrt(max_bits) — 56 ->
    (7, 8), 63 -> (7, 9). dhash_images caps max_bits at 63 (signed
    int64 packing)."""
    r = math.isqrt(max_bits)
    while max_bits % r:
        r -= 1
    return r, max_bits // r


def box_resize_weights(n_in: int, n_out: int) -> np.ndarray:
    """INTEGER area-overlap weights for a 1-D box resize (the PIL
    BOX-filter kernel scaled to integers): output cell i covers
    [i*n_in, (i+1)*n_in) and input pixel j covers [j*n_out, (j+1)*n_out)
    on a common grid of n_in*n_out units, so weight[i, j] is their
    (integer) overlap. Integer weights keep every grid value exact in
    float64, which is what lets the DuckDB oracle replay the hash
    bit-for-bit — no float-resize rounding can flip a comparison."""
    i = np.arange(n_out)
    j = np.arange(n_in)
    lo = np.maximum.outer(i * n_in, j * n_out)
    hi = np.minimum.outer((i + 1) * n_in, (j + 1) * n_out)
    return np.maximum(hi - lo, 0).astype(np.float64)


def dhash_images(
    df: DataFrame,
    content_col: str = "content",
    fmt_col: str = "format",
    max_bits: int = 56,
    resize: bool = True,
) -> DataFrame:
    """Difference-hash (dHash) perceptual fingerprint per image.

    The decoded grayscale image (channel SUM for RGB — comparisons are
    scale-invariant, and integer sums stay float64-exact) is first
    block-averaged down to a fixed (rows, cols+1) grid with
    rows * cols == max_bits (dhash_grid_dims; 56 -> a 7x9 grid), then
    bit k = 1 iff grid[r, c] > grid[r, c+1], row-major (k = r*cols + c).
    The fixed-grid downsample is what makes the hash PERCEPTUAL: a
    rescaled or re-encoded copy of the same image lands on (near-)
    identical grid averages, so copies collide regardless of native
    resolution. ``resize=False`` keeps the legacy native-resolution
    mode (adjacent-pixel gradients capped at max_bits — only sensible
    for fixed-size thumbnail corpora).

    Hashes pack into one BIGINT, so image-level near-dup detection
    reduces to the same banded-bucket equi-join used for text SimHash
    (functions/dedup.py:hamming_hash_pairs) — never all-pairs, so a
    billion-image corpus shuffles only (id, block-key) rows. Parity
    note: the reference's media handling stops at content metadata
    (src/data_pipeline/utils/*); perceptual dedup is the
    multimodal-corpus extension BASELINE.json calls for.

    Arrow-batched mapInPandas: byte-level codec work is inherently
    per-blob Python, everything after the hash column is JVM-side.

    ``max_bits`` is capped at 63: the hash packs into a SIGNED int64
    column, and the fixed-grid resize emits exactly max_bits bits, so
    a 64-bit grid would deterministically set bit 63 and overflow the
    Arrow LongType conversion. 63 = a 7x9 comparison grid, the classic
    dHash density.
    """
    if not (1 <= max_bits <= 63):
        raise ValueError(
            f"max_bits must be in [1, 63] (signed int64 packing), got {max_bits}"
        )
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("dhash", T.LongType())]
    )
    rows_n, cols_n = dhash_grid_dims(max_bits)

    def hashes(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for blob, fmt in zip(pdf[content_col], pdf[fmt_col]):
            img = _decode(bytes(blob), fmt).astype(np.float64)
            if img.ndim == 3:
                img = img.sum(axis=2)
            if img.ndim == 1:
                img = img.reshape(1, -1)
            if resize:
                wr = box_resize_weights(img.shape[0], rows_n)
                wc = box_resize_weights(img.shape[1], cols_n + 1)
                grid = wr @ img @ wc.T
                bits = (grid[:, :-1] > grid[:, 1:]).ravel()
            else:
                bits = (img[:, :-1] > img[:, 1:]).ravel()[:max_bits]
            h = 0
            for k, b in enumerate(bits):
                if b:
                    h |= 1 << k
            out.append(h)
        pdf = pdf.copy()
        pdf["dhash"] = pd.Series(out, index=pdf.index, dtype="int64")
        return pdf

    return _map_batches(df, schema, hashes)


def audio_fingerprints(
    df: DataFrame,
    content_col: str = "content",
    fmt_col: str = "format",
    n_frames: int = 32,
) -> DataFrame:
    """Energy-delta audio fingerprint (the Haitsma-Kalker robust-hash
    shape, simplified to one band): split the mono waveform into
    ``n_frames`` equal frames, bit i = 1 iff frame i+1 has more energy
    than frame i. Re-encodes, resampling and low-amplitude noise
    preserve the energy envelope, so audio near-dup detection reduces to
    the same banded Hamming bucket join as text SimHash / image dHash
    (functions/dedup.py:hamming_hash_pairs) — never all-pairs. Grow
    n_frames with corpus size exactly like IVF cell count: more bits =
    fewer spurious bucket collisions.

    Arrow-batched mapInPandas (byte decode is inherently per-blob
    Python); the (n_frames-1)-bit hash packs into one BIGINT and
    everything downstream is JVM-side.
    """
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("afp", T.LongType())]
    )

    def fps(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for blob, fmt in zip(pdf[content_col], pdf[fmt_col]):
            wave = _decode(bytes(blob), fmt).astype(np.float64).ravel()
            flen = len(wave) // n_frames
            if flen == 0:
                out.append(0)
                continue
            frames = wave[: flen * n_frames].reshape(n_frames, flen)
            en = (frames ** 2).sum(axis=1)
            h = 0
            for i in range(n_frames - 1):
                if en[i + 1] > en[i]:
                    h |= 1 << i
            out.append(h)
        pdf = pdf.copy()
        pdf["afp"] = pd.Series(out, index=pdf.index, dtype="int64")
        return pdf

    return _map_batches(df, schema, fps)
