"""JPEG conformance fixtures INDEPENDENT of the repo's own encoder.

``decode_jpeg``'s other tests round-trip through ``jpeg_bytes`` — a
symmetric encoder/decoder bug (e.g. a transposed zigzag, a flipped
dequant) would pass them. This file closes that hole with a clean-room
encoder written straight from ITU T.81:

* literal zigzag table (spec Figure A.6), NOT derived from the repo's
  diagonal-walk loop;
* the Annex K.1 luminance + chrominance quantization tables (two DQT
  tables — the repo encoder always shares one, so this exercises the
  decoder's per-component ``tq`` routing for the first time);
* the Annex K.3 "typical" Huffman tables (four DHT tables: DC/AC ×
  lum/chrom — completely different canonical codes from the repo's
  flat-length tables, and the first fixture where chroma components use
  table id 1);
* an APP0/JFIF segment and a COM segment (decoder must skip both);
* FDCT via the explicit spec A.3.3 cosine double sum, not a matrix
  product.

Expected pixels are computed by an in-test reference inverse path
(dequant → float IDCT → YCbCr→RGB), so encoder and expectation are BOTH
independent of ``multimodal.py``.
"""

from __future__ import annotations

import numpy as np
import pytest

from blink_spark.operators import multimodal

# ---- spec literals (ITU T.81) ----------------------------------------------

# Figure A.6 zigzag: index k -> position (row*8+col) in natural order.
ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1 quantization tables (natural / row-major order).
QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
QT_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL).
DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _huff_codes(bits, vals):
    """Canonical code assignment per spec C.2 (generate_size/code tables)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _fdct_spec(block):
    """Spec A.3.3 FDCT, explicit double cosine sum (O(64^2), tests only)."""
    out = np.zeros((8, 8))
    x = np.arange(8)
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            cos_u = np.cos((2 * x + 1) * u * np.pi / 16)
            cos_v = np.cos((2 * x + 1) * v * np.pi / 16)
            out[u, v] = 0.25 * cu * cv * float(cos_u @ block @ cos_v)
    return out


def _idct_spec(coef):
    """Spec A.3.3 IDCT (reference inverse for the expected pixels)."""
    out = np.zeros((8, 8))
    x = np.arange(8)
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            cos_u = np.cos((2 * x[:, None] + 1) * u * np.pi / 16)
            cos_v = np.cos((2 * x[None, :] + 1) * v * np.pi / 16)
            out += 0.25 * cu * cv * coef[u, v] * (cos_u * cos_v)
    return out


class _Writer:
    def __init__(self):
        self.buf = bytearray()
        self.acc = ""

    def bits(self, code, length):
        self.acc += format(code, f"0{length}b")
        while len(self.acc) >= 8:
            b = int(self.acc[:8], 2)
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.acc = self.acc[8:]

    def flush(self):
        if self.acc:
            self.bits(0b1111111, 8 - len(self.acc))


def _encode_block(w, coef_q, pred, dc_tab, ac_tab):
    zz = [int(coef_q.flat[ZZ[k]]) for k in range(64)]
    diff = zz[0] - pred
    size = abs(diff).bit_length()
    c, l = dc_tab[size]
    w.bits(c, l)
    if size:
        w.bits(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    nz = [k for k in range(1, 64) if zz[k] != 0]
    last = nz[-1] if nz else 0
    for k in range(1, last + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_tab[0xF0]
            w.bits(c, l)
            run -= 16
        size = abs(zz[k]).bit_length()
        c, l = ac_tab[(run << 4) | size]
        w.bits(c, l)
        w.bits(zz[k] if zz[k] >= 0 else zz[k] + (1 << size) - 1, size)
        run = 0
    if last < 63:
        c, l = ac_tab[0x00]
        w.bits(c, l)
    return zz[0]


def _rgb_to_ycc(px):
    r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
    return (
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    )


def _ycc_to_rgb(y, cb, cr):
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def reference_encode(px, subsample=(1, 1), restart_interval=0):
    """Clean-room baseline JPEG with Annex K tables. Returns
    ``(jpeg_bytes, expected_rgb)`` where ``expected_rgb`` is computed by
    the in-test reference inverse path from the SAME quantized
    coefficients (so the assertion is exact up to the two rounding steps,
    not merely 'close to the original image')."""
    px = np.asarray(px, dtype=np.uint8)
    h, w0 = px.shape[:2]
    sh, sv = subsample
    y, cb, cr = _rgb_to_ycc(px)

    def pad(p, mh, mw):
        return np.pad(p, ((0, (-p.shape[0]) % mh), (0, (-p.shape[1]) % mw)), mode="edge")

    y = pad(y, 8 * sv, 8 * sh)
    if (sh, sv) != (1, 1):
        cbp, crp = pad(cb, 8 * sv, 8 * sh), pad(cr, 8 * sv, 8 * sh)
        cb = cbp.reshape(cbp.shape[0] // sv, sv, cbp.shape[1] // sh, sh).mean(axis=(1, 3))
        cr = crp.reshape(crp.shape[0] // sv, sv, crp.shape[1] // sh, sh).mean(axis=(1, 3))
    else:
        cb, cr = pad(cb, 8, 8), pad(cr, 8, 8)

    def to_blocks(plane, qt):
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        q = np.zeros((bh, bw, 8, 8), dtype=np.int64)
        rec = np.zeros_like(plane)
        for i in range(bh):
            for j in range(bw):
                blk = plane[i * 8 : i * 8 + 8, j * 8 : j * 8 + 8] - 128.0
                q[i, j] = np.round(_fdct_spec(blk) / qt).astype(np.int64)
                rec[i * 8 : i * 8 + 8, j * 8 : j * 8 + 8] = _idct_spec(q[i, j] * qt) + 128.0
        return q, rec

    qy, rec_y = to_blocks(y, QT_LUM)
    qcb, rec_cb = to_blocks(cb, QT_CHR)
    qcr, rec_cr = to_blocks(cr, QT_CHR)

    # expected pixels: reference inverse of the quantized coefficients
    if (sh, sv) != (1, 1):
        rec_cb = np.repeat(np.repeat(rec_cb, sv, axis=0), sh, axis=1)
        rec_cr = np.repeat(np.repeat(rec_cr, sv, axis=0), sh, axis=1)
    expected = _ycc_to_rgb(rec_y[:h, :w0], rec_cb[:h, :w0], rec_cr[:h, :w0])

    dc_l, ac_l = _huff_codes(*DC_LUM), _huff_codes(*AC_LUM)
    dc_c, ac_c = _huff_codes(*DC_CHR), _huff_codes(*AC_CHR)
    wtr = _Writer()
    preds = [0, 0, 0]
    mcus_y, mcus_x = qy.shape[0] // sv, qy.shape[1] // sh
    scan = bytearray()
    n_mcu, rst = 0, 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                wtr.flush()
                scan += wtr.buf + bytes([0xFF, 0xD0 + rst % 8])
                wtr, preds, rst = _Writer(), [0, 0, 0], rst + 1
            for by in range(sv):
                for bx in range(sh):
                    preds[0] = _encode_block(
                        wtr, qy[my * sv + by, mx * sh + bx], preds[0], dc_l, ac_l
                    )
            preds[1] = _encode_block(wtr, qcb[my, mx], preds[1], dc_c, ac_c)
            preds[2] = _encode_block(wtr, qcr[my, mx], preds[2], dc_c, ac_c)
            n_mcu += 1
    wtr.flush()
    scan += wtr.buf

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def zzbytes(qt):
        return bytes(int(qt.flat[ZZ[k]]) for k in range(64))

    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out = bytes([0xFF, 0xD8])
    out += seg(0xE0, jfif)  # APP0 — decoder must skip
    out += seg(0xFE, b"clean-room Annex K fixture")  # COM — decoder must skip
    out += seg(0xDB, bytes([0x00]) + zzbytes(QT_LUM) + bytes([0x01]) + zzbytes(QT_CHR))
    sof = bytes([8]) + px.shape[0].to_bytes(2, "big") + px.shape[1].to_bytes(2, "big")
    sof += bytes([3])
    sof += bytes([1, (sh << 4) | sv, 0])  # Y  → qtable 0
    sof += bytes([2, 0x11, 1])            # Cb → qtable 1
    sof += bytes([3, 0x11, 1])            # Cr → qtable 1
    out += seg(0xC0, sof)
    dht = bytes([0x00]) + bytes(DC_LUM[0]) + bytes(DC_LUM[1])
    dht += bytes([0x10]) + bytes(AC_LUM[0]) + bytes(AC_LUM[1])
    dht += bytes([0x01]) + bytes(DC_CHR[0]) + bytes(DC_CHR[1])
    dht += bytes([0x11]) + bytes(AC_CHR[0]) + bytes(AC_CHR[1])
    out += seg(0xC4, dht)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xDA, sos) + bytes(scan) + bytes([0xFF, 0xD9])
    return out, expected


# ---- fixtures ----------------------------------------------------------------

def _gradient(h, w, seed):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            40 + 160 * xx / max(w - 1, 1),
            220 - 150 * yy / max(h - 1, 1),
            60 + 90 * (xx + yy) / max(h + w - 2, 1),
        ],
        axis=-1,
    )
    return np.clip(base + rng.randint(-6, 7, size=(h, w, 3)), 0, 255).astype(np.uint8)


def test_foreign_jpeg_solid_gray_exact():
    """DC-only fixture with exactly representable values: v=144 gives
    Y coeff 8·16/16 = 8 → reconstructs to exactly 144; gray ⇒ Cb=Cr=128
    exactly. The decode must be bit-exact."""
    px = np.full((8, 8, 3), 144, dtype=np.uint8)
    buf, expected = reference_encode(px)
    got = multimodal.decode_jpeg(buf)
    assert np.array_equal(expected, px)  # the fixture's own premise
    assert np.array_equal(got, px)


@pytest.mark.parametrize("shape,seed", [((8, 8), 3), ((16, 24), 5), ((13, 21), 9)])
def test_foreign_jpeg_444_matches_reference_inverse(shape, seed):
    """Asymmetric gradients (zigzag transposition would misplace AC
    coefficients and blow the bound) through the full Annex K table set;
    decoded pixels must match the in-test reference inverse within the
    two independent rounding steps."""
    px = _gradient(*shape, seed)
    buf, expected = reference_encode(px)
    got = multimodal.decode_jpeg(buf)
    assert got.shape == expected.shape
    assert np.abs(got.astype(int) - expected.astype(int)).max() <= 1


def test_foreign_jpeg_420_matches_reference_inverse():
    px = _gradient(16, 24, 7)
    buf, expected = reference_encode(px, subsample=(2, 2))
    got = multimodal.decode_jpeg(buf)
    assert got.shape == expected.shape
    assert np.abs(got.astype(int) - expected.astype(int)).max() <= 1


def test_foreign_jpeg_restart_interval_matches_no_restart():
    px = _gradient(16, 16, 13)
    buf_rst, expected = reference_encode(px, restart_interval=1)
    buf_plain, _ = reference_encode(px)
    a = multimodal.decode_jpeg(buf_rst)
    b = multimodal.decode_jpeg(buf_plain)
    assert np.array_equal(a, b)  # same coefficients, different framing
    assert np.abs(a.astype(int) - expected.astype(int)).max() <= 1
