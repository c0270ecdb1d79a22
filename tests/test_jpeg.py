"""JpegDecodeBackend (round 4): stdlib baseline-JPEG decode.

No codec library exists in this container to serve as an oracle, so the
decoder is verified two independent ways:

1. HAND-BUILT spec-exact streams: JPEG files assembled byte-by-byte in
   the test with known DC/AC coefficients, whose expected pixels are
   computed HERE from the T.81 IDCT definition formula (explicit cosine
   double-sum — not the implementation's matrix), catching zigzag /
   dequant / IDCT-scaling errors that a round-trip would cancel out.
2. ROUND-TRIPS through a test-local minimal encoder (forward DCT +
   quantize + canonical fixed-length Huffman tables it declares in its
   own DHT segments), covering 4:4:4 / 4:2:0, grayscale, odd dimensions,
   and restart markers, asserting reconstruction error within the
   quantization budget.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from globalign_spark.ops.multimodal import (
    _ZIGZAG,
    JpegDecodeBackend,
    extract_media_features,
)

# --------------------------------------------------------- test-local encoder

QUANT = np.full(64, 16.0)  # flat table: error budget +-8 per DCT coef


def _huff_fixed(symbols: list[int], length: int) -> tuple[dict, bytes]:
    """Canonical table with every symbol at the same code length.
    Valid iff len(symbols) < 2^length (the all-ones code stays unused)."""
    assert len(symbols) < (1 << length)
    enc = {s: (length, i) for i, s in enumerate(symbols)}
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    dht = bytes(counts) + bytes(symbols)
    return enc, dht


DC_SYMS = list(range(12))
AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
DC_ENC, DC_DHT = _huff_fixed(DC_SYMS, 4)
AC_ENC, AC_DHT = _huff_fixed(AC_SYMS, 8)

_FDCT_A = np.array([
    [0.5 * (1 / np.sqrt(2) if u == 0 else 1.0)
     * np.cos((2 * x + 1) * u * np.pi / 16) for u in range(8)]
    for x in range(8)
])


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, length: int, value: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self):
        if self.n:
            self.write(8 - self.n, (1 << (8 - self.n)) - 1)  # 1-pad

    def marker(self, m: int):
        self.flush()
        self.out += bytes([0xFF, m])


def _category(v: int) -> int:
    return 0 if v == 0 else int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(bw: _BitWriter, block: np.ndarray, dc_pred: int) -> int:
    coef = _FDCT_A.T @ (block - 128.0) @ _FDCT_A
    q = np.round(coef.reshape(64) / QUANT).astype(int)
    zz = q[_ZIGZAG]
    diff = zz[0] - dc_pred
    t = _category(diff)
    bw.write(*DC_ENC[t])
    if t:
        bw.write(t, diff if diff >= 0 else diff + (1 << t) - 1)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*AC_ENC[0xF0])
            run -= 16
        s = _category(zz[k])
        bw.write(*AC_ENC[(run << 4) | s])
        v = int(zz[k])
        bw.write(s, v if v >= 0 else v + (1 << s) - 1)
        run = 0
    if last_nz < 63:
        bw.write(*AC_ENC[0x00])  # EOB
    return int(zz[0])


def encode_jpeg(
    img: np.ndarray, subsample_420: bool = False, restart_interval: int = 0
) -> bytes:
    """Minimal baseline encoder: uint8 (h, w) grayscale or (h, w, 3) RGB."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        comps = [(1, 1, 1, img.astype(np.float64))]
    else:
        f = img.astype(np.float64)
        y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
        cb = 128.0 - 0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2]
        cr = 128.0 + 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2]
        if subsample_420:
            def down(p):
                ph = p[: h - h % 2 or None, : w - w % 2 or None]
                eh, ew = ph.shape[0] // 2 * 2, ph.shape[1] // 2 * 2
                ph = p[:eh, :ew] if eh and ew else p[:1, :1]
                return ph.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            comps = [(1, 2, 2, y), (2, 1, 1, down(cb)), (3, 1, 1, down(cr))]
        else:
            comps = [(1, 1, 1, y), (2, 1, 1, cb), (3, 1, 1, cr)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker, payload):
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    seg(0xDB, bytes([0x00]) + bytes(int(v) for v in QUANT))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch, cv, _ in comps:
        sof += bytes([cid, (ch << 4) | cv, 0])
    seg(0xC0, sof)
    seg(0xC4, bytes([0x00]) + DC_DHT)
    seg(0xC4, bytes([0x10]) + AC_DHT)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, _, _, _ in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    # pad each plane to its own MCU-covered size
    padded = []
    for cid, ch, cv, plane in comps:
        ph, pw = mcus_y * cv * 8, mcus_x * ch * 8
        p = np.empty((ph, pw))
        sh, sw = plane.shape
        p[:sh, :sw] = plane
        p[sh:, :sw] = plane[sh - 1:sh, :]
        p[:, sw:] = p[:, sw - 1:sw]
        padded.append(p)

    bw = _BitWriter()
    dc_pred = [0] * len(comps)
    rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            bw.marker(0xD0 + (rst & 7))
            rst += 1
            dc_pred = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for ci, (cid, ch, cv, _) in enumerate(comps):
            for by in range(cv):
                for bx in range(ch):
                    y0 = (my * cv + by) * 8
                    x0 = (mx * ch + bx) * 8
                    dc_pred[ci] = _encode_block(
                        bw, padded[ci][y0:y0 + 8, x0:x0 + 8], dc_pred[ci]
                    )
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# ------------------------------------------------------- hand-built streams


def _hand_jpeg(dc: int, ac_idx_zz: int = 0, ac_val: int = 0) -> bytes:
    """8x8 grayscale, quant all-16, one block: quantized DC = ``dc`` and
    optionally one AC coefficient (zigzag index) = ``ac_val``."""
    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    seg(0xC4, bytes([0x00]) + DC_DHT)
    seg(0xC4, bytes([0x10]) + AC_DHT)
    seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bw = _BitWriter()
    t = _category(dc)
    bw.write(*DC_ENC[t])
    if t:
        bw.write(t, dc if dc >= 0 else dc + (1 << t) - 1)
    if ac_val:
        run = ac_idx_zz - 1
        s = _category(ac_val)
        bw.write(*AC_ENC[(run << 4) | s])
        bw.write(s, ac_val if ac_val >= 0 else ac_val + (1 << s) - 1)
    bw.write(*AC_ENC[0x00])
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def _idct_definition(coef: np.ndarray) -> np.ndarray:
    """T.81 A.3.3 IDCT as the literal double sum (independent of the
    implementation's matrix form)."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            acc = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    acc += (
                        cu * cv * coef[v, u]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[y, x] = acc / 4 + 128.0
    return out


def test_dc_only_block_exact():
    be = JpegDecodeBackend()
    # DC quantized value 16 -> coefficient 256 -> flat 256/8 + 128 = 160
    px = be.decode_pixels(_hand_jpeg(dc=16))
    assert px.shape == (8, 8)
    assert np.all(px == 160)
    # negative DC: -8 -> -128/8 + 128 = 112
    assert np.all(be.decode_pixels(_hand_jpeg(dc=-8)) == 112)


def test_single_ac_coefficient_matches_definition():
    be = JpegDecodeBackend()
    # zigzag index 1 is (u=1, v=0); quantized 5 -> coefficient 80
    px = be.decode_pixels(_hand_jpeg(dc=0, ac_idx_zz=1, ac_val=5))
    coef = np.zeros((8, 8))
    coef[0, 1] = 80.0
    expect = np.clip(np.round(_idct_definition(coef)), 0, 255)
    assert np.array_equal(px, expect.astype(np.uint8))
    # zigzag index 2 is (u=0, v=1)
    px2 = be.decode_pixels(_hand_jpeg(dc=0, ac_idx_zz=2, ac_val=5))
    coef2 = np.zeros((8, 8))
    coef2[1, 0] = 80.0
    expect2 = np.clip(np.round(_idct_definition(coef2)), 0, 255)
    assert np.array_equal(px2, expect2.astype(np.uint8))


# ------------------------------------------------------------- round-trips


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(255.0**2 / mse)


@pytest.fixture(scope="module")
def gradient_rgb():
    g = np.zeros((40, 56, 3), np.uint8)
    g[..., 0] = np.linspace(0, 255, 56, dtype=np.uint8)[None, :]
    g[..., 1] = np.linspace(0, 255, 40, dtype=np.uint8)[:, None]
    g[..., 2] = 128
    return g


def test_roundtrip_rgb_444(gradient_rgb):
    be = JpegDecodeBackend()
    px = be.decode_pixels(encode_jpeg(gradient_rgb))
    assert px.shape == gradient_rgb.shape
    assert _psnr(px, gradient_rgb) > 35


def test_roundtrip_rgb_420_odd_dims():
    rng = np.random.default_rng(7)
    base = rng.integers(60, 196, (4, 5, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(base, 9, axis=0), 9, axis=1)  # 36x45, smooth
    be = JpegDecodeBackend()
    px = be.decode_pixels(encode_jpeg(img, subsample_420=True))
    assert px.shape == img.shape
    assert _psnr(px, img) > 28  # chroma subsampling costs fidelity


def test_roundtrip_grayscale():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    be = JpegDecodeBackend()
    px = be.decode_pixels(encode_jpeg(img))
    assert px.shape == (24, 24)
    # flat-16 quant on noise: per-pixel error bounded by coef budget
    assert _psnr(px, img) > 25


def test_roundtrip_restart_markers(gradient_rgb):
    be = JpegDecodeBackend()
    blob = encode_jpeg(gradient_rgb, restart_interval=2)
    assert b"\xff\xd0" in blob or b"\xff\xd1" in blob
    px = be.decode_pixels(blob)
    assert _psnr(px, gradient_rgb) > 35


def test_feature_contract(gradient_rgb):
    be = JpegDecodeBackend()
    f = be.decode("image", encode_jpeg(gradient_rgb))
    assert f.shape == (64,)
    assert f.sum() == pytest.approx(1.0)
    with pytest.raises(NotImplementedError):
        be.decode("audio", b"\xff\xd8")


def test_error_paths(gradient_rgb):
    be = JpegDecodeBackend()
    with pytest.raises(ValueError):
        be.decode_pixels(b"not a jpeg")
    # progressive (SOF2) is the documented seam
    blob = bytearray(encode_jpeg(gradient_rgb))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF2"):
        be.decode_pixels(bytes(blob))


def test_spark_path_counts_failures(spark, gradient_rgb):
    good = encode_jpeg(gradient_rgb)
    prog = bytearray(good)
    prog[prog.find(b"\xff\xc0") + 1] = 0xC2  # progressive -> seam
    rows = [
        (1, "image", bytes(good)),
        (2, "image", bytes(prog)),
        (3, "image", b"\x00garbage"),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, blob binary")
    out = {
        r.media_id: r
        for r in extract_media_features(
            df, backend=JpegDecodeBackend()
        ).collect()
    }
    assert out[1].decode_error is None and len(out[1].features) == 64
    assert "NotImplementedError" in out[2].decode_error
    assert "ValueError" in out[3].decode_error  # counted, never fatal
