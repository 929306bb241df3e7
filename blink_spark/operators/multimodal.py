"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extraction runs as ``mapInPandas`` over
Arrow batches.

Codec status, stated honestly per modality:

* **audio (WAV/PCM)** — REAL decode: :func:`decode_wav` parses RIFF/WAVE
  headers and PCM frames with stdlib ``wave`` + numpy (no external codec
  needed), and :func:`audio_features` extracts duration / RMS /
  zero-crossing-rate / band energies from the actual samples.
* **image (BMP / PPM / PGM / PNG / JPEG)** — REAL decode:
  :func:`decode_image` parses uncompressed BMP (24/32-bit BI_RGB), binary
  netpbm (P6/P5), PNG (8-bit, non-interlaced — the DEFLATE stream is
  stdlib ``zlib``, all five scanline filters implemented in
  :func:`_png_unfilter_row`), and baseline-sequential JPEG
  (:func:`decode_jpeg` — Huffman entropy decode + dequant + vectorized
  IDCT + chroma upsample, pure numpy) — no external codec library — and
  :func:`image_features` extracts per-channel mean/std + a grayscale
  histogram from the actual pixels.
* **video** — MJPEG-in-AVI is REAL: :func:`decode_video_frames` parses the
  RIFF/AVI container (stdlib ``struct``) and decodes each ``00dc`` frame
  chunk through :func:`decode_jpeg`; :func:`video_frame_features` extracts
  per-frame features from the actual pixels at a sampling cadence.
  Inter-frame codecs (H.264 etc.) are genuinely out of stdlib+numpy reach
  and stay stubbed behind ``decoder=`` — the ``NotImplementedError`` is
  scoped to exactly those payloads; a real decoder (ffmpeg) drops in
  without touching the plan.
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
    :func:`decode_wav`; images (BMP/PPM/PGM/PNG/JPEG) via
    :func:`decode_image`; video (MJPEG-in-AVI) via
    :func:`decode_video_frames` (inter-frame codecs raise)."""
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
        return _luma_tile_feature(decode_image(payload), dim)
    # video: MJPEG-in-AVI decodes for real; temporal pooling = mean of the
    # per-frame tile features, re-normalized
    frames, _fps = decode_video_frames(payload)
    feats = np.stack([_luma_tile_feature(f, dim) for f in frames])
    v = feats.mean(axis=0)
    n = float(np.linalg.norm(v))
    return (v / n if n > 0 else v).astype(np.float32)


def _luma_tile_feature(px: np.ndarray, dim: int) -> np.ndarray:
    """(H, W, 3) pixels → ``dim`` equal-area mean-luma tiles over the
    row-major pixel stream, L2-normalized."""
    if px.size == 0:
        return np.zeros(dim, dtype=np.float32)
    luma = px.astype(np.float32).mean(axis=2).ravel() / 255.0
    seg = np.array_split(luma, dim)
    v = np.array([s.mean() if len(s) else 0.0 for s in seg], dtype=np.float32)
    n = float(np.linalg.norm(v))
    return v / n if n > 0 else v


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
    * **JPEG**: baseline sequential DCT via :func:`decode_jpeg` — pure
      numpy Huffman + IDCT, no codec library.

    Raises ``ValueError`` on other containers.
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
    if buf[:2] == b"\xff\xd8":
        return decode_jpeg(buf)
    raise ValueError(
        f"unsupported image container (magic {buf[:2]!r}): BMP, binary "
        "PPM/PGM, PNG, and baseline JPEG decode without a codec library"
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


# ---------------------------------------------------------------------------
# JPEG — baseline sequential DCT, pure numpy + stdlib (no codec library).
# The same discipline as the PNG path: the container and entropy coding are
# bit-exact spec implementations; the only "library" used is numpy for the
# block DCT math. Scope: baseline (SOF0), 8-bit, Huffman, 1- or 3-component,
# sampling factors up to 2 (4:4:4 / 4:2:2 / 4:2:0), restart intervals.
# Rejected with ValueError: progressive (SOF2), arithmetic coding, 12-bit.
# ---------------------------------------------------------------------------

_ZIGZAG: list[tuple[int, int]] = []
for _d in range(15):
    for _r in range(_d, -1, -1) if _d % 2 == 0 else range(0, _d + 1):
        _c = _d - _r
        if _r < 8 and _c < 8:
            _ZIGZAG.append((_r, _c))
_ZZ_ROWS = np.array([p[0] for p in _ZIGZAG])
_ZZ_COLS = np.array([p[1] for p in _ZIGZAG])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis: FDCT is C @ f @ C.T, IDCT is
    C.T @ F @ C (JPEG spec A.3.3 normalization)."""
    x = np.arange(8)
    C = 0.5 * np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    C[0, :] = 0.5 / np.sqrt(2.0)
    return C


_DCT_C = _dct_matrix()


def _build_huffman_decode(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman table (DHT BITS/HUFFVAL) → {(len, code): symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_huffman_encode(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Same canonical assignment, symbol → (code, length) for the encoder."""
    return {sym: (code, length) for (length, code), sym in _build_huffman_decode(bits, vals).items()}


# Encoder-side tables: ALL symbols at one code length (12 DC symbols at 4
# bits, 162 AC symbols at 8 bits) — a valid canonical prefix code that needs
# no frequency pass; the decoder reads whatever tables the DHT segment
# declares, so interop does not depend on this choice (it costs compression
# ratio, which synthetic test payloads don't care about).
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_ENC_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (spec F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s to byte boundary


def _encode_block(
    bw: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_tab: dict[int, tuple[int, int]],
    ac_tab: dict[int, tuple[int, int]],
) -> int:
    """Huffman-encode one zigzagged quantized block; returns its DC value."""
    diff = int(zz[0]) - pred
    size = int(abs(diff)).bit_length()
    code, length = dc_tab[size]
    bw.write(code, length)
    if size:
        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = max(np.nonzero(zz[1:])[0], default=-1)
    for k in range(1, 2 + last_nz):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_tab[0xF0]  # ZRL
            bw.write(c, l)
            run -= 16
        size = abs(v).bit_length()
        c, l = ac_tab[(run << 4) | size]
        bw.write(c, l)
        bw.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 62:
        c, l = ac_tab[0x00]  # EOB
        bw.write(c, l)
    return int(zz[0])


def _plane_to_zigzag(plane: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    """(H, W) float plane (level-shifted) → (bh, bw, 64) quantized zigzag."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ux,ijxy,vy->ijuv", _DCT_C, blocks, _DCT_C)
    q = np.round(coef / qtable[None, None]).astype(np.int32)
    return q[:, :, _ZZ_ROWS, _ZZ_COLS]


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, (-h) % mh), (0, (-w) % mw)), mode="edge")


def jpeg_bytes(
    px: np.ndarray,
    quant: int | np.ndarray = 2,
    subsample: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a REAL baseline JPEG.

    ``quant`` is a scalar (uniform quantization table — quant=1 keeps pixels
    within DCT rounding error, handy for known-pixel tests) or a full 8×8
    table, used for both luma and chroma. ``subsample=(2, 2)`` emits 4:2:0
    (box-averaged chroma, 2×2-Y MCUs); ``restart_interval`` > 0 emits DRI +
    RSTn markers so the decoder's restart path is testable."""
    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape[:2]
    sh, sv = subsample
    assert (sh, sv) in ((1, 1), (2, 1), (2, 2)), "supported: 4:4:4, 4:2:2, 4:2:0"
    qtable = (np.full((8, 8), int(quant)) if np.isscalar(quant) else np.asarray(quant)).astype(
        np.uint16
    )

    r, g, b = [px[:, :, i].astype(np.float64) for i in range(3)]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    y = _pad_edge(y, 8 * sv, 8 * sh)
    if (sh, sv) != (1, 1):
        cbp = _pad_edge(cb, 8 * sv, 8 * sh)
        crp = _pad_edge(cr, 8 * sv, 8 * sh)
        # box-average chroma down by the sampling factors
        cb = cbp.reshape(cbp.shape[0] // sv, sv, cbp.shape[1] // sh, sh).mean(axis=(1, 3))
        cr = crp.reshape(crp.shape[0] // sv, sv, crp.shape[1] // sh, sh).mean(axis=(1, 3))
    else:
        cb, cr = _pad_edge(cb, 8, 8), _pad_edge(cr, 8, 8)

    zz = [
        _plane_to_zigzag(y - 128.0, qtable),
        _plane_to_zigzag(cb - 128.0, qtable),
        _plane_to_zigzag(cr - 128.0, qtable),
    ]
    dc_tab = _build_huffman_encode(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_tab = _build_huffman_encode(_ENC_AC_BITS, _ENC_AC_VALS)

    mcus_x = y.shape[1] // (8 * sh)
    mcus_y = y.shape[0] // (8 * sv)
    comp_blocks = [(sh, sv), (1, 1), (1, 1)]
    out = bytearray()
    bw = _BitWriter()
    preds = [0, 0, 0]
    n_mcu, rst = 0, 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.flush()
                out += bw.out + bytes([0xFF, 0xD0 + rst % 8])
                bw, preds, rst = _BitWriter(), [0, 0, 0], rst + 1
            for ci, (ch_, cv) in enumerate(comp_blocks):
                for by in range(cv):
                    for bx in range(ch_):
                        blk = zz[ci][my * cv + by, mx * ch_ + bx]
                        preds[ci] = _encode_block(bw, blk, preds[ci], dc_tab, ac_tab)
            n_mcu += 1
    bw.flush()
    out += bw.out

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    zz_q = qtable[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    for ci, (ch_, cv) in enumerate(comp_blocks):
        sof += bytes([ci + 1, (ch_ << 4) | cv, 0])  # all components share qtable 0
    dht = bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
    dht += bytes([0x10]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS)
    sos = bytes([3])
    for ci in range(3):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    jpg = bytes([0xFF, 0xD8]) + seg(0xDB, bytes([0x00]) + zz_q) + seg(0xC0, sof) + seg(0xC4, dht)
    if restart_interval:
        jpg += seg(0xDD, restart_interval.to_bytes(2, "big"))
    jpg += seg(0xDA, sos) + bytes(out) + bytes([0xFF, 0xD9])
    return jpg


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            return 0  # spec: pad past end with zero bits (F.2.2.5 leaves
            # trailing-bit handling to the decoder; EOB logic never overreads
            # a valid stream, so this only triggers on the final pad bits)
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _receive_extend(br: _BitReader, size: int) -> int:
    if size == 0:
        return 0
    v = br.read_bits(size)
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(buf: bytes) -> np.ndarray:
    """REAL JPEG decode: baseline sequential DCT → (H, W, 3) uint8.

    Pure numpy + stdlib, same discipline as :func:`decode_png`: segment
    parse → per-MCU Huffman decode (the sequential part, per spec F.2) →
    vectorized dequant + IDCT over all blocks at once (einsum with the
    orthonormal DCT basis) → chroma upsample → YCbCr→RGB. Supports 8-bit
    baseline (SOF0), 1- or 3-component scans, sampling factors up to 2,
    and restart intervals; rejects progressive/arithmetic/12-bit with
    ``ValueError``."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    comps: list[dict] = []
    h = w = None
    restart_interval = 0
    scan_comps: list[dict] = []
    scan_start = None
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"bad JPEG segment marker at {pos}")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        length = int.from_bytes(buf[pos + 2 : pos + 4], "big")
        body = buf[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quantization tables not supported")
                tq = np.zeros((8, 8), dtype=np.uint16)
                tq[_ZZ_ROWS, _ZZ_COLS] = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                qtables[tid] = tq
                i += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline JPEG (SOF{marker - 0xC0}) not supported")
        elif marker == 0xC0:  # SOF0
            if body[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            for ci in range(body[5]):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htables[(tc, th)] = _build_huffman_decode(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for si in range(ns):
                cid, tabs = body[1 + 2 * si], body[2 + 2 * si]
                comp = next(c for c in comps if c["id"] == cid)
                scan_comps.append({**comp, "dc": tabs >> 4, "ac": tabs & 0xF})
            scan_start = pos
            break
        # APPn / COM / others: skipped via the length field
    if h is None or scan_start is None:
        raise ValueError("JPEG missing SOF0/SOS")

    # entropy-coded data: unstuff 0xFF00, split at restart markers
    segments: list[bytes] = []
    cur = bytearray()
    p = scan_start
    while p < len(buf):
        byte = buf[p]
        if byte == 0xFF and p + 1 < len(buf):
            m = buf[p + 1]
            if m == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= m <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            break  # EOI or next marker
        cur.append(byte)
        p += 1
    segments.append(bytes(cur))

    hmax = max(c["h"] for c in scan_comps)
    vmax = max(c["v"] for c in scan_comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}  # component id -> (bh, bw, 8, 8) quantized-coefficient grid
    for c in scan_comps:
        planes[c["id"]] = np.zeros((mcus_y * c["v"], mcus_x * c["h"], 8, 8), dtype=np.int32)

    n_mcu = 0
    seg_iter = iter(segments)
    br = _BitReader(next(seg_iter))
    preds = {c["id"]: 0 for c in scan_comps}
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                br = _BitReader(next(seg_iter))
                preds = {c["id"]: 0 for c in scan_comps}
            for c in scan_comps:
                dc_t, ac_t = htables[(0, c["dc"])], htables[(1, c["ac"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        size = br.decode_symbol(dc_t)
                        preds[c["id"]] += _receive_extend(br, size)
                        zz[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = br.decode_symbol(ac_t)
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC coefficient index overrun")
                            zz[k] = _receive_extend(br, size)
                            k += 1
                        blk = planes[c["id"]][my * c["v"] + by, mx * c["h"] + bx]
                        blk[_ZZ_ROWS, _ZZ_COLS] = zz
            n_mcu += 1

    # vectorized dequant + IDCT per component, then upsample to full res
    out_planes = []
    for c in scan_comps:
        coef = planes[c["id"]].astype(np.float64) * qtables[c["tq"]][None, None]
        # blockwise IDCT: f = C.T @ F @ C → f[x,y] = Σ_u Σ_v C[u,x] F[u,v] C[v,y]
        pix = np.einsum("ux,ijuv,vy->ijxy", _DCT_C, coef, _DCT_C)
        bh, bw_ = pix.shape[:2]
        plane = pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8) + 128.0
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        gray = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(gray[:, :, None], 3, axis=2)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


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
    """Real image feature extraction over BMP/PPM/PGM/PNG/JPEG payloads
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
    that a distributed frame extractor (:func:`video_frame_features`)
    consumes.
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


# ---------------------------------------------------------------------------
# REAL video: MJPEG-in-AVI. The RIFF/AVI container is a plain chunk tree
# (stdlib struct); each '00dc' chunk in the 'movi' list is one baseline
# JPEG frame that decode_jpeg consumes. Inter-frame codecs (H.264 etc.)
# stay honestly stubbed — they are out of stdlib+numpy reach.
# ---------------------------------------------------------------------------


def avi_mjpeg_bytes(frames: list, fps: int = 10, quant: int | np.ndarray = 2) -> bytes:
    """Encode RGB frames as a REAL AVI/MJPEG container (one ``00dc`` JPEG
    chunk per frame; ``avih``/``strh`` carry the true fps and dimensions)."""
    assert frames, "at least one frame"
    jpegs = [jpeg_bytes(np.asarray(f, dtype=np.uint8), quant=quant) for f in frames]
    h, w = np.asarray(frames[0]).shape[:2]

    def chunk(fcc: bytes, data: bytes) -> bytes:
        return fcc + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) % 2 else b"")

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    usec = int(round(1_000_000 / fps))
    max_bytes = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I",
        usec, max_bytes * fps, 0, 0,          # usec/frame, bytes/sec, pad, flags
        len(jpegs), 0, 1, max_bytes,           # total frames, initial, streams, sugg buf
        w, h, 0, 0, 0, 0,                      # dims + reserved
    )
    strh = b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII4H",
        0, 0, 0, 0,                            # flags, priority, language, initial
        1, fps, 0, len(jpegs),                 # scale, rate, start, length
        max_bytes, 0xFFFFFFFF, 0,              # sugg buf, quality, sample size
        0, 0, w, h,                            # rcFrame
    )
    strf = struct.pack("<I2i2H", 40, w, h, 1, 24) + b"MJPG" + struct.pack(
        "<I2i2I", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def decode_video_frames(payload: bytes) -> tuple[list, float]:
    """REAL video decode for MJPEG-in-AVI: walk the RIFF chunk tree, decode
    every ``00dc``/``00db`` movi chunk with :func:`decode_jpeg`. Returns
    ``(frames, fps)``. Raises ``NotImplementedError`` for non-AVI payloads
    (inter-frame codecs — H.264/VP9/AV1 — are out of stdlib+numpy reach)
    and ``ValueError`` for a structurally broken AVI."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise NotImplementedError(
            "only MJPEG-in-AVI video decodes in this environment; inter-frame "
            "codecs (H.264 etc.) need an external decoder — pass decoder= "
            "or pre-extract frames"
        )
    usec_per_frame = None
    scale_rate: tuple[int, int] | None = None
    jpegs: list[bytes] = []

    def walk(buf: bytes, start: int, end: int, in_movi: bool) -> None:
        nonlocal usec_per_frame, scale_rate
        pos = start
        while pos + 8 <= end:
            fcc = buf[pos : pos + 4]
            size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
            body_start, body_end = pos + 8, pos + 8 + size
            if body_end > end:
                raise ValueError("truncated AVI chunk")
            if fcc == b"LIST":
                kind = buf[body_start : body_start + 4]
                walk(buf, body_start + 4, body_end, in_movi or kind == b"movi")
            elif fcc == b"avih":
                usec_per_frame = struct.unpack("<I", buf[body_start : body_start + 4])[0]
            elif fcc == b"strh":
                if buf[body_start : body_start + 4] == b"vids":
                    scale, rate = struct.unpack("<II", buf[body_start + 20 : body_start + 28])
                    scale_rate = (scale, rate)
            elif in_movi and fcc[2:4] in (b"dc", b"db"):
                jpegs.append(buf[body_start:body_end])
            pos = body_end + (size % 2)  # chunks are word-aligned

    walk(payload, 12, len(payload), False)
    if not jpegs:
        raise ValueError("AVI has no video frame chunks")
    if scale_rate and scale_rate[0]:
        fps = scale_rate[1] / scale_rate[0]
    elif usec_per_frame:
        fps = 1_000_000 / usec_per_frame
    else:
        fps = 25.0
    return [decode_jpeg(j) for j in jpegs], fps


FRAME_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("std_luma", T.DoubleType()),
        T.StructField("motion", T.DoubleType()),  # mean |Δluma| vs prev sampled frame
    ]
)


def video_frame_features(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """REAL distributed frame extraction: decode each video payload
    (MJPEG-in-AVI), sample the frame nearest each ``every_ms`` tick, and
    emit per-frame features from the ACTUAL pixels (mean/std luma + a
    motion proxy = mean abs luma delta vs the previous sampled frame).

    One ``mapInPandas`` pass — embarrassingly parallel over media rows,
    no shuffle; the video analog of :func:`image_features`. The reference
    has no media path (SURVEY §2.9 n/a rows); this is LLM-training-
    pipeline surface.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in FRAME_FEATURE_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, fps = decode_video_frames(bytes(payload))
                lumas = [f.astype(np.float64).mean(axis=2) for f in frames]
                dur_ms = len(frames) * 1000.0 / fps
                prev = None
                for ts in range(0, max(int(dur_ms), 1), every_ms):
                    idx = min(int(round(ts * fps / 1000.0)), len(frames) - 1)
                    lu = lumas[idx]
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(idx)
                    out["frame_ts_ms"].append(ts)
                    out["height"].append(lu.shape[0])
                    out["width"].append(lu.shape[1])
                    out["mean_luma"].append(float(lu.mean()) / 255.0)
                    out["std_luma"].append(float(lu.std()) / 255.0)
                    out["motion"].append(
                        float(np.abs(lu - prev).mean()) / 255.0 if prev is not None else 0.0
                    )
                    prev = lu
            yield pd.DataFrame(out)

    return (
        media.where(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(gen, schema=FRAME_FEATURE_SCHEMA)
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
    rows carry VALID BMP / PPM / PGM / PNG / JPEG containers (deterministic
    gradient + noise patterns; PNG rows sweep scanline filters and JPEG
    rows sweep 4:4:4 / 4:2:0 sampling and a restart interval — the real
    :func:`decode_image` path consumes them all; every PNG filter and JPEG
    mode additionally has a direct known-pixel unit test); two of every
    three video rows carry VALID MJPEG-in-AVI containers (gradient frames
    with a moving bar — the real :func:`decode_video_frames` /
    :func:`video_frame_features` path consumes them), the third carries
    opaque bytes standing in for inter-frame codecs (the scoped
    ``NotImplementedError`` path).
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
            container = (i // 3) % 5  # rotate BMP → PPM → PGM → PNG → JPEG
            if container == 0:
                payload, mime = bmp_bytes(px), "image/bmp"
            elif container == 1:
                payload, mime = ppm_bytes(px), "image/x-portable-pixmap"
            elif container == 2:
                payload, mime = pgm_bytes(px.mean(axis=2).astype(np.uint8)), "image/x-portable-graymap"
            elif container == 3:
                # PNG rows sweep the filter space so every unfilter path runs
                payload, mime = png_bytes(px, filter_type=(i // 15) % 5), "image/png"
            else:
                # JPEG rows sweep sampling + restart so every decode path runs
                payload = jpeg_bytes(
                    px,
                    quant=2,
                    subsample=(2, 2) if (i // 15) % 2 else (1, 1),
                    restart_interval=3 if (i // 15) % 3 == 2 else 0,
                )
                mime = "image/jpeg"
        elif (i // 3) % 3 == 2:
            # every third video row: opaque inter-frame payload — keeps the
            # scoped NotImplementedError path (H.264 etc.) driver-visible
            dur_ms = int(rng.randint(500, 10_000))
            payload = rng.bytes(int(rng.randint(64, 2048)))
            mime = "video/mp4"
        else:
            # REAL MJPEG-in-AVI: 3-6 small gradient frames with a moving
            # bright bar (so the motion feature is non-trivial)
            fps = int(rng.randint(2, 6))
            n_frames = int(rng.randint(3, 7))
            width, height = int(rng.randint(16, 33)), int(rng.randint(16, 33))
            col = np.arange(width, dtype=np.float64) / max(width - 1, 1)
            frames = []
            for fi in range(n_frames):
                base = np.tile(col, (height, 1))[:, :, None] * 150.0 + np.array(
                    [0.0, 30.0, 60.0]
                )[None, None, :]
                bar = (fi * max(width // n_frames, 1)) % width
                base[:, bar : bar + 2, :] = 250.0
                frames.append(np.clip(base, 0, 255).astype(np.uint8))
            payload = avi_mjpeg_bytes(frames, fps=fps, quant=2)
            dur_ms = int(n_frames * 1000 / fps)
            mime = "video/x-msvideo"
        rows.append((i, kind, bytearray(payload), (mime, width, height, dur_ms)))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
