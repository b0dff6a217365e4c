"""WebP lossless (VP8L) codec: writer<->decoder roundtrips for the
simple-code subset, plus HAND-ASSEMBLED bitstreams (built bit-by-bit
from RFC 9649 field layouts by an independent test-side assembler)
exercising full code-length-coded prefix trees, LZ77 backward
references, the color cache, and the subtract-green / predictor
transforms — none of which the production writer can emit, so the
decoder is checked against streams it could never have co-authored."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from docling_japanese_books_spark.multimodal.webp_codec import (
    _CLC_ORDER,
    pixels_to_webp,
    webp_to_pixels,
)


# ---------------------------------------------------------------------------
# writer subset roundtrips
# ---------------------------------------------------------------------------


def test_two_color_roundtrips():
    for h, w, seed in ((5, 7, 1), (1, 1, 2), (16, 3, 3), (8, 24, 4)):
        mask = ((np.indices((h, w)).sum(axis=0) + seed) % 2).astype(np.uint8)
        px = np.zeros((h, w, 3), np.uint8)
        px[:, :, 0] = np.where(mask, 200, 10)
        px[:, :, 1] = np.where(mask, 60, 250)
        px[:, :, 2] = np.where(mask, 0, 128)
        back = webp_to_pixels(pixels_to_webp(px))
        assert back.shape == px.shape and (back == px).all()


def test_gray_and_uniform():
    g = np.full((3, 4), 77, np.uint8)
    back = webp_to_pixels(pixels_to_webp(g))
    assert back.shape == (3, 4, 3) and (back == 77).all()


def test_full_encoder_arbitrary_images():
    """The encoder's full-tree path (heap Huffman -> code-length-coded
    trees): gradients, uniform noise, and a pathologically skewed
    distribution (deep trees, Kraft-repair territory) all roundtrip
    exactly through the decoder's canonical reconstruction."""
    rng = np.random.RandomState(11)
    x, y = np.arange(21), np.arange(13)
    grad = np.dstack(
        [
            ((x[None, :] * 7 + y[:, None] * 13 + s) % 256).astype(np.uint8)
            for s in (0, 50, 100)
        ]
    )
    noise = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    skew = np.zeros((40, 40, 3), np.uint8)
    skew[0, :37, 0] = np.arange(37)  # 1563 zeros + 36 singleton values
    fib = np.zeros((30, 30), np.uint8)
    # Fibonacci-ish frequencies force maximally unbalanced Huffman depths
    pos = 0
    for i, f in enumerate((1, 1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 233)):
        fib.ravel()[pos : pos + f] = 10 + i
        pos += f
    for px in (grad, noise, skew, fib):
        back = webp_to_pixels(pixels_to_webp(px))
        exp = px if px.ndim == 3 else np.dstack([px, px, px])
        assert (back == exp).all()


# ---------------------------------------------------------------------------
# independent bit assembler (test-side; LSB-first like the spec)
# ---------------------------------------------------------------------------


class BW:
    def __init__(self):
        self.bits = []

    def put(self, v, n):  # ReadBits(n) fields: LSB first
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def code(self, c, length):  # prefix codes: MSB first
        for i in reversed(range(length)):
            self.bits.append((c >> i) & 1)

    def vp8l(self, w, h):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        payload = b"\x2f" + bytes(out)
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:
            chunk += b"\x00"
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def header(bw, w, h):
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)  # alpha hint
    bw.put(0, 3)  # version


def simple(bw, syms):
    """Simple prefix code; returns sym -> (code, nbits)."""
    bw.put(1, 1)
    bw.put(len(syms) - 1, 1)
    bw.put(1, 1)  # 8-bit first symbol
    bw.put(syms[0], 8)
    if len(syms) == 2:
        bw.put(syms[1], 8)
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    return {syms[0]: (0, 0)}


def full(bw, spec, alphabet):
    """Code-length-coded prefix tree for {symbol: length}; returns the
    canonical sym -> (code, nbits) map the decoder must reconstruct."""
    clc_syms = sorted(set(spec.values()) | {0, 17, 18})
    assert len(clc_syms) <= 8
    clc = {s: (i, 3) for i, s in enumerate(clc_syms)}  # canonical, all len 3
    bw.put(0, 1)   # not simple
    bw.put(15, 4)  # 19 code length codes
    for s in _CLC_ORDER:
        bw.put(3 if s in clc_syms else 0, 3)
    bw.put(0, 1)   # no explicit max_symbol

    def emit_zeros(n):
        while n > 0:
            if n >= 11:
                k = min(n, 138)
                bw.code(*clc[18])
                bw.put(k - 11, 7)
                n -= k
            elif n >= 3:
                bw.code(*clc[17])
                bw.put(n - 3, 3)
                n -= n
            else:
                bw.code(*clc[0])
                n -= 1

    prev = -1
    for sym in sorted(spec):
        emit_zeros(sym - prev - 1)
        bw.code(*clc[spec[sym]])
        prev = sym
    emit_zeros(alphabet - prev - 1)

    # canonical code assignment (DEFLATE order) the decoder will derive
    used = sorted((l, s) for s, l in spec.items())
    counts = {}
    for l, _ in used:
        counts[l] = counts.get(l, 0) + 1
    code, next_code = 0, {}
    for length in range(1, max(counts) + 1):
        code = (code + counts.get(length - 1, 0)) << 1
        next_code[length] = code
    out = {}
    for l, s in used:
        out[s] = (next_code[l], l)
        next_code[l] += 1
    return out


def no_transform_no_cache_no_meta(bw):
    bw.put(0, 1)  # no transforms
    bw.put(0, 1)  # no cache
    bw.put(0, 1)  # no meta groups


# ---------------------------------------------------------------------------
# external fixtures
# ---------------------------------------------------------------------------


def test_external_full_prefix_code():
    """4x1, three distinct greens -> a genuine code-length-coded tree
    (lengths 1/2/2), which the simple-code writer cannot produce."""
    bw = BW()
    header(bw, 4, 1)
    no_transform_no_cache_no_meta(bw)
    g = full(bw, {10: 1, 20: 2, 30: 2}, 256 + 24)
    simple(bw, [5])    # red
    simple(bw, [7])    # blue
    simple(bw, [255])  # alpha
    simple(bw, [0])    # distance
    for green in (10, 20, 30, 10):
        bw.code(*g[green])
    out = webp_to_pixels(bw.vp8l(4, 1))
    assert out.shape == (1, 4, 3)
    assert out[0, :, 1].tolist() == [10, 20, 30, 10]  # greens
    assert (out[0, :, 0] == 5).all() and (out[0, :, 2] == 7).all()


def test_external_lz77_backward_reference():
    """6x1: one literal then a length-5 distance-1 copy (green symbol
    260 = length prefix 4 + extra bit; distance code 2 via the 2D map
    entry (1, 0))."""
    bw = BW()
    header(bw, 6, 1)
    no_transform_no_cache_no_meta(bw)
    g = full(bw, {100: 1, 260: 1}, 256 + 24)
    simple(bw, [40])   # red
    simple(bw, [90])   # blue
    simple(bw, [255])  # alpha
    simple(bw, [1])    # distance tree: prefix code 1 -> dist_code 2
    bw.code(*g[100])   # literal pixel
    bw.code(*g[260])   # length prefix code 4...
    bw.put(0, 1)       # ...extra bit -> length 5
    # distance tree is single-symbol: zero bits
    out = webp_to_pixels(bw.vp8l(6, 1))
    assert out.shape == (1, 6, 3)
    assert (out[0, :, 1] == 100).all() and (out[0, :, 0] == 40).all()


def test_external_color_cache():
    """3x1 with a 2-entry color cache: literal, then two cache hits."""
    argb = (255 << 24) | (5 << 16) | (50 << 8) | 7
    idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> 31  # cache_bits=1
    cache_sym = 256 + 24 + idx
    bw = BW()
    header(bw, 3, 1)
    bw.put(0, 1)  # no transforms
    bw.put(1, 1)  # color cache present
    bw.put(1, 4)  # cache_bits = 1
    bw.put(0, 1)  # no meta groups
    g = full(bw, {50: 1, cache_sym: 1}, 256 + 24 + 2)
    simple(bw, [5])
    simple(bw, [7])
    simple(bw, [255])
    simple(bw, [0])
    bw.code(*g[50])         # literal -> inserted into cache
    bw.code(*g[cache_sym])  # cache hit
    bw.code(*g[cache_sym])  # cache hit again
    out = webp_to_pixels(bw.vp8l(3, 1))
    assert (out[0, :, 0] == 5).all()
    assert (out[0, :, 1] == 50).all()
    assert (out[0, :, 2] == 7).all()


def test_external_subtract_green():
    """2x1 uniform color through the subtract-green transform: stored
    residuals are r-g and b-g mod 256; decoder must add green back."""
    r, gr, b = 100, 40, 20
    bw = BW()
    header(bw, 2, 1)
    bw.put(1, 1)  # a transform follows
    bw.put(2, 2)  # subtract green
    bw.put(0, 1)  # no more transforms
    bw.put(0, 1)  # no cache
    bw.put(0, 1)  # no meta
    simple(bw, [gr])                 # green tree
    simple(bw, [(r - gr) % 256])     # red residual
    simple(bw, [(b - gr) % 256])     # blue residual
    simple(bw, [255])
    simple(bw, [0])
    # all trees single-symbol: zero pixel bits
    out = webp_to_pixels(bw.vp8l(2, 1))
    assert out[0, 0].tolist() == [r, gr, b]
    assert out[0, 1].tolist() == [r, gr, b]


def _predictor_stream(mode):
    """2x2 through the predictor transform with block size 4 (one mode
    block). Residual greens/reds/blues: (0,0)=5, (1,0)=5, (0,1)=0,
    (1,1)=5 — finals depend on the mode at (1,1) only."""
    bw = BW()
    header(bw, 2, 2)
    bw.put(1, 1)  # a transform follows
    bw.put(0, 2)  # predictor
    bw.put(0, 3)  # size_bits = 2 -> 4x4 blocks -> 1x1 mode image
    # mode sub-image (1x1, entropy-coded, no cache, single group):
    bw.put(0, 1)  # no cache
    simple(bw, [mode])  # green = predictor mode
    simple(bw, [0])
    simple(bw, [0])
    simple(bw, [0])
    simple(bw, [0])
    # no more transforms
    bw.put(0, 1)
    bw.put(0, 1)  # no cache (main)
    bw.put(0, 1)  # no meta
    g = simple(bw, [5, 0])
    r = simple(bw, [5, 0])
    b = simple(bw, [5, 0])
    simple(bw, [0])  # alpha residual 0 everywhere
    simple(bw, [0])  # distance
    for res in (5, 5, 0, 5):
        for tree in (g, r, b):
            bw.code(*tree[res])
    return bw.vp8l(2, 2)


def test_external_predictor_modes():
    """Mode 1 (left) vs mode 2 (top) disagree only at (1,1): left chain
    gives 10, top chain gives 15 — pins that the mode is actually
    consulted, not just the first-row/column special cases."""
    out_left = webp_to_pixels(_predictor_stream(1))
    out_top = webp_to_pixels(_predictor_stream(2))
    for out in (out_left, out_top):
        assert out[0, 0, 1] == 5    # (0,0): pred 0xff000000
        assert out[0, 1, 1] == 10   # first row: left + 5
        assert out[1, 0, 1] == 5    # first col: top + 0
    assert out_left[1, 1, 1] == 10  # L(=5) + 5
    assert out_top[1, 1, 1] == 15   # T(=10) + 5


def test_valueerror_contract():
    good = pixels_to_webp(np.full((2, 2), 9, np.uint8))
    for bad in (
        b"",
        b"RIFF\x00\x00\x00\x00WEBP",
        good[:24],
        good[:12] + b"VP8 " + good[16:],  # lossy chunk
        good[:12] + b"VP8X" + good[16:],  # extended container
        good[:20] + b"\x00" + good[21:],  # corrupt VP8L signature byte
    ):
        with pytest.raises(ValueError):
            webp_to_pixels(bad)


def test_decode_image_real_dispatches_webp():
    from docling_japanese_books_spark.multimodal.images import decode_image_real

    mask = (np.indices((6, 9)).sum(axis=0) % 2).astype(np.uint8)
    px = np.dstack([mask * 200, mask * 90 + 10, 255 - mask * 55]).astype(np.uint8)
    meta = decode_image_real(pixels_to_webp(px))
    assert meta["format"] == "webp"
    assert (meta["width"], meta["height"]) == (9, 6)
    assert meta["feature"] is not None
