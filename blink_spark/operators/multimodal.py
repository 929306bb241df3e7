"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extraction runs as ``mapInPandas`` over
Arrow batches.

Codec status, stated honestly per modality:

* **audio (WAV/PCM)** — REAL decode: :func:`decode_wav` parses RIFF/WAVE
  headers and PCM frames with stdlib ``wave`` + numpy (no external codec
  needed), and :func:`audio_features` extracts duration / RMS /
  zero-crossing-rate / band energies from the actual samples.
* **image (BMP / PPM / PGM / PNG)** — REAL decode: :func:`decode_image`
  parses uncompressed BMP (24/32-bit BI_RGB), binary netpbm (P6/P5), and
  PNG (8-bit, non-interlaced — the DEFLATE stream is stdlib ``zlib``, all
  five scanline filters implemented in :func:`_png_unfilter_row`) with
  numpy — no external codec library — and :func:`image_features` extracts
  per-channel mean/std + a grayscale histogram from the actual pixels.
* **image (JPEG) / video (H.264)** — DCT/entropy codecs are NOT available
  in this environment, so those stay stubbed behind ``decoder=``: the
  default deterministic fake keeps the Spark-side plumbing (schema,
  batching, partitioning, UDF signatures) fully real and testable, and a
  real decoder (PIL/ffmpeg) drops in without touching the plan.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def fake_decode(payload: bytes, kind: str, dim: int = 64) -> np.ndarray:
    """Deterministic stand-in for a real decoder: hash-seeded feature vector.

    A real implementation decodes pixels/samples and pools them; codecs are
    not installed here, so this derives a stable unit vector from the bytes.
    """
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    digest = hashlib.blake2b(payload, digest_size=8, person=kind.encode()[:16]).digest()
    rng = np.random.RandomState(int.from_bytes(digest[:4], "little"))
    v = rng.standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def real_decode(payload: bytes, kind: str, dim: int = 64) -> np.ndarray:
    """Real decoder entry point. Audio (WAV) decodes for real via
    :func:`decode_wav`; images (BMP/PPM/PGM/PNG) via :func:`decode_image`.
    JPEG and video codecs are absent in this environment."""
    if kind == "audio":
        samples, _sr = decode_wav(payload)
        # pool to a fixed-dim feature: dim equal-width mean-abs segments
        if len(samples) == 0:
            return np.zeros(dim, dtype=np.float32)
        seg = np.array_split(np.abs(samples), dim)
        v = np.array([s.mean() if len(s) else 0.0 for s in seg], dtype=np.float32)
        n = float(np.linalg.norm(v))
        return v / n if n > 0 else v
    if kind == "image":
        px = decode_image(payload)
        # pool to a fixed-dim feature: dim equal-area mean-luma tiles over
        # the row-major pixel stream
        if px.size == 0:
            return np.zeros(dim, dtype=np.float32)
        luma = px.astype(np.float32).mean(axis=2).ravel() / 255.0
        seg = np.array_split(luma, dim)
        v = np.array([s.mean() if len(s) else 0.0 for s in seg], dtype=np.float32)
        n = float(np.linalg.norm(v))
        return v / n if n > 0 else v
    raise NotImplementedError(
        "JPEG and video codecs are not installed in this environment; pass "
        "decoder=fake_decode (default) or provide your own"
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL audio decode: RIFF/WAVE container → float samples in [-1, 1].

    stdlib ``wave`` parses the container; numpy converts the PCM frames
    (8-bit unsigned or 16/32-bit signed little-endian). Multi-channel audio
    is averaged to mono. Returns ``(samples, sample_rate)``.
    """
    if not payload:
        return np.zeros(0, dtype=np.float32), 0
    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        sr = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 1:  # unsigned 8-bit
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width: {width}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, sr


def decode_image(payload: bytes) -> np.ndarray:
    """REAL image decode: BMP, binary netpbm, or PNG → (H, W, 3) uint8.

    Stdlib + numpy container parsing — the image analog of :func:`decode_wav`:

    * **BMP** (``BM`` magic): BITMAPINFOHEADER, 24- or 32-bit, BI_RGB
      (uncompressed) only. Rows are 4-byte padded, stored bottom-up in BGR
      order (top-down when height is negative) — both normalized here.
    * **PPM (P6) / PGM (P5)**: binary netpbm with maxval ≤ 255; grayscale
      is replicated to 3 channels.
    * **PNG**: 8-bit non-interlaced via :func:`decode_png` — the DEFLATE
      stream is stdlib ``zlib``, so PNG needs no external codec either.

    Raises ``ValueError`` on other containers (JPEG needs a DCT codec).
    """
    if not payload:
        return np.zeros((0, 0, 3), dtype=np.uint8)
    buf = bytes(payload)
    if buf[:2] == b"BM":
        return _decode_bmp(buf)
    if buf[:2] in (b"P6", b"P5"):
        return _decode_pnm(buf)
    if buf[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(buf)
    raise ValueError(
        f"unsupported image container (magic {buf[:2]!r}): BMP, binary "
        "PPM/PGM, and PNG decode without a codec library; JPEG does not"
    )


def _decode_bmp(buf: bytes) -> np.ndarray:
    if len(buf) < 54:
        raise ValueError("truncated BMP header")
    data_offset = int.from_bytes(buf[10:14], "little")
    hdr_size = int.from_bytes(buf[14:18], "little")
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width = int.from_bytes(buf[18:22], "little", signed=True)
    height = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    compression = int.from_bytes(buf[30:34], "little")
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) needs a codec")
    if bpp not in (24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    bottom_up = height > 0
    height = abs(height)
    n_ch = bpp // 8
    row_bytes = (width * n_ch + 3) & ~3  # rows pad to 4-byte boundaries
    px = np.frombuffer(buf, dtype=np.uint8, count=row_bytes * height, offset=data_offset)
    px = px.reshape(height, row_bytes)[:, : width * n_ch].reshape(height, width, n_ch)
    if bottom_up:
        px = px[::-1]
    return np.ascontiguousarray(px[:, :, 2::-1])  # BGR(A) → RGB, drop alpha


def _decode_pnm(buf: bytes) -> np.ndarray:
    # header = magic, width, height, maxval as whitespace-separated ASCII
    # tokens (with '#' comments), then ONE whitespace byte, then raster
    magic = buf[:2]
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError(f"16-bit netpbm (maxval {maxval}) not supported")
    n_ch = 3 if magic == b"P6" else 1
    px = np.frombuffer(buf, dtype=np.uint8, count=width * height * n_ch, offset=pos)
    px = px.reshape(height, width, n_ch)
    return np.ascontiguousarray(np.repeat(px, 3, axis=2) if n_ch == 1 else px)


def bmp_bytes(px: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a REAL 24-bit BI_RGB BMP."""
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    raster = np.zeros((h, row_bytes), dtype=np.uint8)
    raster[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = raster.tobytes()
    file_size = 54 + len(data)
    header = (
        b"BM"
        + file_size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2  # 72 DPI
        + (0).to_bytes(4, "little") * 2
    )
    return header + data


def ppm_bytes(px: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a binary PPM (P6)."""
    h, w, _ = px.shape
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def pgm_bytes(px: np.ndarray) -> bytes:
    """Encode an (H, W) uint8 grayscale array as a binary PGM (P5)."""
    h, w = px.shape
    return f"P5\n{w} {h}\n255\n".encode() + px.tobytes()


def png_bytes(px: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode (H, W, 3|4) RGB(A) or (H, W) gray uint8 → PNG (8-bit,
    non-interlaced, single IDAT).

    ``filter_type`` applies one scanline filter to every row (0=None,
    1=Sub, 2=Up, 3=Average, 4=Paeth) — the non-zero types exist so tests
    can exercise every unfilter path in :func:`decode_png`.
    """
    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape[:2]
    ch = 1 if px.ndim == 2 else px.shape[2]
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    raw = px.reshape(h, w * ch)
    stream = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        stream.append(filter_type)
        stream += _png_filter_row(filter_type, raw[y], prev, ch).tobytes()
        prev = raw[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(stream), 6))
        + chunk(b"IEND", b"")
    )


def _png_filter_row(ft: int, row: np.ndarray, prev: np.ndarray, ch: int) -> np.ndarray:
    """Apply scanline filter ``ft`` (encoder side; whole-row numpy)."""
    if ft == 0:
        return row.copy()
    r, p = row.astype(np.int16), prev.astype(np.int16)
    left = np.zeros_like(r)
    left[ch:] = r[:-ch]
    upleft = np.zeros_like(p)
    upleft[ch:] = p[:-ch]
    pred = {
        1: left,
        2: p,
        3: (left + p) // 2,
        4: _paeth_predict(left, p, upleft),
    }[ft]
    return ((r - pred) % 256).astype(np.uint8)


def _paeth_predict(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §9.4), vectorized over a row."""
    pa, pb, pc = np.abs(b - c), np.abs(a - c), np.abs(a + b - 2 * c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(buf: bytes) -> np.ndarray:
    """REAL PNG decode: 8-bit non-interlaced → (H, W, 3) uint8.

    PNG is chunked DEFLATE — and DEFLATE is stdlib ``zlib`` — so no
    external codec is needed; only JPEG's DCT/entropy coding is. Supports
    color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA)
    at bit depth 8 and all five scanline filters; rejects 16-bit and
    interlaced (Adam7) images with ``ValueError``. Alpha is dropped and
    gray replicated, matching the other containers' (H, W, 3) contract.
    """
    if buf[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, width, plte, idat = 8, None, None, bytearray()
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        body = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _c, _f, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (8 only)")
    if interlace:
        raise ValueError("interlaced (Adam7) PNG not supported")
    n_ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if n_ch is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    stride = width * n_ch
    if len(raw) != height * (stride + 1):
        raise ValueError("corrupt PNG raster length")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        out[y] = _png_unfilter_row(int(arr[y, 0]), arr[y, 1:], prev, n_ch)
        prev = out[y]
    px = out.reshape(height, width, n_ch)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return np.ascontiguousarray(plte[px[:, :, 0]])
    if n_ch == 1:
        return np.repeat(px, 3, axis=2)
    if n_ch == 2:  # gray + alpha → replicate gray, drop alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])  # RGB / RGBA → RGB


def _png_unfilter_row(ft: int, row: np.ndarray, prev: np.ndarray, ch: int) -> np.ndarray:
    """Invert scanline filter ``ft``. None/Up/Sub are whole-row numpy
    (Sub's left-prefix dependency is a per-channel-lane cumsum); Average
    and Paeth are inherently sequential along x (each pixel's predictor
    reads the just-decoded left neighbor), looped per byte — decode cost
    is per-image-row Python only inside an Arrow-batched UDF, the same
    budget as the WAV path."""
    if ft == 0:
        return row.astype(np.uint8)
    if ft == 2:
        return (row.astype(np.int16) + prev).astype(np.uint8)
    n = len(row)
    if ft == 1:  # Sub: recon(x) = raw(x) + recon(x-ch) → cumsum per lane
        out = np.zeros(n, dtype=np.uint8)
        for c in range(ch):
            out[c::ch] = (np.cumsum(row[c::ch].astype(np.int64)) % 256).astype(np.uint8)
        return out
    out = np.zeros(n, dtype=np.int16)
    pr = prev.astype(np.int16)
    if ft == 3:  # Average
        for i in range(n):
            a = int(out[i - ch]) if i >= ch else 0
            out[i] = (int(row[i]) + (a + int(pr[i])) // 2) % 256
        return out.astype(np.uint8)
    if ft == 4:  # Paeth
        for i in range(n):
            a = int(out[i - ch]) if i >= ch else 0
            b = int(pr[i])
            c = int(pr[i - ch]) if i >= ch else 0
            pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (int(row[i]) + pred) % 256
        return out.astype(np.uint8)
    raise ValueError(f"bad PNG filter byte {ft}")


_IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_rgb", T.ArrayType(T.DoubleType())),
        T.StructField("std_rgb", T.ArrayType(T.DoubleType())),
        T.StructField("luma_hist", T.ArrayType(T.DoubleType())),
    ]
)


def image_features(media: DataFrame, n_bins: int = 8) -> DataFrame:
    """Real image feature extraction over BMP/PPM/PGM payloads
    (``kind='image'``).

    Per image: dimensions, per-channel mean/std in [0, 1], and an
    ``n_bins`` grayscale-luma histogram (L1-normalized) — all from the
    DECODED pixels, batched per Arrow batch. The image sibling of
    :func:`audio_features`; the reference's enrich pipeline has no media
    path (out of scope per SURVEY), this is LLM-training-pipeline surface.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height", "mean_rgb", "std_rgb", "luma_hist")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image(payload)
                h, w = px.shape[:2]
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                if px.size == 0:
                    out["mean_rgb"].append([0.0, 0.0, 0.0])
                    out["std_rgb"].append([0.0, 0.0, 0.0])
                    out["luma_hist"].append([0.0] * n_bins)
                    continue
                x = px.astype(np.float64) / 255.0
                out["mean_rgb"].append(x.mean(axis=(0, 1)).tolist())
                out["std_rgb"].append(x.std(axis=(0, 1)).tolist())
                luma = x.mean(axis=2).ravel()
                hist, _ = np.histogram(luma, bins=n_bins, range=(0.0, 1.0))
                out["luma_hist"].append((hist / hist.sum()).tolist())
            yield pd.DataFrame(out)

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(gen, schema=_IMAGE_FEATURE_SCHEMA)
    )


_AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossing_rate", T.DoubleType()),
        T.StructField("band_energy", T.ArrayType(T.FloatType())),
    ]
)


def audio_features(media: DataFrame, n_bands: int = 8) -> DataFrame:
    """Real audio feature extraction over WAV payloads (``kind='audio'``).

    Per clip: sample rate, duration, RMS amplitude, zero-crossing rate, and
    ``n_bands`` FFT band energies (L1-normalized) — all computed from the
    DECODED samples, batched per Arrow batch. This is the genuine
    decode-then-featurize path the stubbed modalities emulate.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "sample_rate", "duration_ms", "rms", "zero_crossing_rate", "band_energy")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                x, sr = decode_wav(payload)
                out["media_id"].append(mid)
                out["sample_rate"].append(sr)
                out["duration_ms"].append(len(x) / sr * 1000.0 if sr else 0.0)
                out["rms"].append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
                out["zero_crossing_rate"].append(
                    float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0
                )
                if len(x):
                    spec = np.abs(np.fft.rfft(x))
                    bands = np.array([s.sum() for s in np.array_split(spec, n_bands)], dtype=np.float64)
                    tot = bands.sum()
                    out["band_energy"].append((bands / tot if tot > 0 else bands).astype(np.float32).tolist())
                else:
                    out["band_energy"].append([0.0] * n_bands)
            yield pd.DataFrame(out)

    return (
        media.where(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(gen, schema=_AUDIO_FEATURE_SCHEMA)
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] = fake_decode,
    dim: int = 64,
) -> DataFrame:
    """Binary payloads → pooled feature vectors, one Arrow batch at a time.

    The per-batch loop is over *payloads* (unavoidable for codec calls);
    everything around it — batching, schema, shuffle-free map — is the
    production plan shape.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p, k, dim).tolist() for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(gen, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts) to decode.

    Pure column math over the metadata (no payload touched): the fan-out
    that a distributed frame extractor consumes. Decode itself is the
    stubbed kernel above.
    """
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def wav_bytes(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode float samples in [-1, 1] as a REAL mono PCM16 WAV container."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes((np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2").tobytes())
    return buf.getvalue()


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (binary payloads + metadata).

    Audio rows carry VALID WAV payloads (sine tones at deterministic
    frequencies — the real :func:`decode_wav` path consumes them); image
    rows carry VALID BMP / PPM / PGM / PNG containers (deterministic
    gradient + noise patterns, PNG rows sweeping all five scanline filters
    — the real :func:`decode_image` path consumes them); video rows carry
    opaque bytes for the stubbed codec.
    """
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    sr = 8000
    for i in range(n):
        kind = kinds[i % 3]
        width = height = dur_ms = None
        if kind == "audio":
            dur_ms = int(rng.randint(500, 3000))
            freq = 110.0 * (1 + i % 8)
            t = np.arange(int(sr * dur_ms / 1000)) / sr
            payload = wav_bytes(0.5 * np.sin(2 * np.pi * freq * t), sr)
            mime = "audio/wav"
        elif kind == "image":
            width = int(rng.randint(8, 64))
            height = int(rng.randint(8, 64))
            # horizontal gradient + per-channel offset + seeded noise
            col = np.arange(width, dtype=np.float64) / max(width - 1, 1)
            base = np.tile(col, (height, 1))[:, :, None] * 200.0
            chan = np.array([0.0, 20.0, 40.0])[None, None, :]
            noise = rng.randint(0, 16, size=(height, width, 3)).astype(np.float64)
            px = np.clip(base + chan + noise, 0, 255).astype(np.uint8)
            container = (i // 3) % 4  # rotate BMP → PPM → PGM → PNG across image rows
            if container == 0:
                payload, mime = bmp_bytes(px), "image/bmp"
            elif container == 1:
                payload, mime = ppm_bytes(px), "image/x-portable-pixmap"
            elif container == 2:
                payload, mime = pgm_bytes(px.mean(axis=2).astype(np.uint8)), "image/x-portable-graymap"
            else:
                # PNG rows sweep the filter space so every unfilter path runs
                payload, mime = png_bytes(px, filter_type=(i // 12) % 5), "image/png"
        else:
            dur_ms = int(rng.randint(500, 10_000))
            payload = rng.bytes(int(rng.randint(64, 2048)))
            mime = "video/mp4"
        rows.append((i, kind, bytearray(payload), (mime, width, height, dur_ms)))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
