"""Pure-Python GIF codec (multimodal/gif_codec).

Roundtrips pin encoder+decoder LZW synchronization (width growth, 12-bit
reset); the hand-assembled fixtures use valid spec constructions the
encoder never emits — clear-per-symbol streams, the KwKwK deferred-entry
case, interlaced row order, local color tables, GIF87a — so they indict
the decoder independently."""

from __future__ import annotations

import numpy as np
import pytest

from docling_japanese_books_spark.multimodal.gif_codec import (
    _LZWWriter,
    gif_to_pixels,
    pixels_to_gif,
)

PAL4 = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)


def _manual_gif(
    w: int,
    h: int,
    lzw: bytes,
    min_code: int = 2,
    interlaced: bool = False,
    version: bytes = b"GIF89a",
    palette: np.ndarray = PAL4,
    with_gce: bool = False,
) -> bytes:
    depth = max(1, (len(palette) - 1).bit_length())
    out = bytearray(version)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (depth - 1), 0, 0])
    gct = np.zeros((1 << depth, 3), np.uint8)
    gct[: len(palette)] = palette
    out += gct.tobytes()
    if with_gce:  # graphic control extension the decoder must skip
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += b"\x2c" + b"\x00" * 4
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlaced else 0x00])
    out += bytes([min_code])
    for i in range(0, len(lzw), 255):
        out += bytes([len(lzw[i : i + 255])]) + lzw[i : i + 255]
    return bytes(out + b"\x00\x3b")


def _codes(codes, width: int) -> bytes:
    wtr = _LZWWriter()
    for c in codes:
        wtr.write(c, width)
    return wtr.flush()


def test_roundtrip_exact_through_width_growth_and_reset():
    rng = np.random.RandomState(5)
    for shape, ncol in (((6, 9), 2), ((40, 55), 16), ((100, 100), 4)):
        pal = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
        idx = rng.randint(0, ncol, shape).astype(np.uint8)
        rgb = gif_to_pixels(pixels_to_gif(idx, pal))
        assert (rgb == pal[idx]).all()  # 100x100 random grows past 4096: reset


def test_external_clear_per_symbol_stream():
    """CLEAR before every pixel keeps the dictionary empty and the width
    constant — a valid encoding our encoder never produces (it clears only
    at the 12-bit cap). min_code=2: CLEAR=4, EOI=5, literals 0-3."""
    pixels = [1, 2, 3, 0, 2, 1]
    codes = [4]
    for p in pixels:
        codes += [p, 4]
    codes[-1] = 5  # final CLEAR becomes EOI
    gif = _manual_gif(3, 2, _codes(codes, 3), with_gce=True)
    rgb = gif_to_pixels(gif)
    assert (rgb == PAL4[np.array(pixels).reshape(2, 3)]).all()


def test_external_kwkwk_deferred_entry():
    """The spec's KwKwK case: a code referencing the entry being defined.
    [CLEAR, 0, 6] with min_code=2 decodes to A + AA = pixels [0,0,0]."""
    gif = _manual_gif(3, 1, _codes([4, 0, 6, 5], 3))
    rgb = gif_to_pixels(gif)
    assert (rgb == PAL4[np.zeros((1, 3), np.int64)]).all()


def test_external_interlaced_rows():
    """Interlace flag: rows are stored in the four-pass order (0,8..),
    (4,12..),(2,6..),(1,3..); the decoder must reorder them."""
    h, w = 8, 4
    idx = (np.arange(h)[:, None] % 4 * np.ones((1, w))).astype(np.uint8)
    pass_order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    stored = idx[pass_order]  # what an interlacing ENCODER would write
    # encode the stored order with clear-per-symbol codes (hand-stream)
    codes = [4]
    for p in stored.ravel().tolist():
        codes += [p, 4]
    codes[-1] = 5
    gif = _manual_gif(w, h, _codes(codes, 3), interlaced=True)
    assert (gif_to_pixels(gif) == PAL4[idx]).all()


def test_external_gif87a_and_local_palette():
    lpal = np.array([[9, 9, 9], [200, 100, 50]], np.uint8)
    # min_code is 2 even for a 2-color palette (spec minimum)
    pixels = [0, 1, 1, 0]
    codes = [4]
    for p in pixels:
        codes += [p, 4]
    codes[-1] = 5
    body = _codes(codes, 3)
    # hand-build with LOCAL color table (flag 0x80 on the descriptor)
    out = bytearray(b"GIF87a")
    out += (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
    out += bytes([0x00, 0, 0])  # no global color table
    out += b"\x2c" + b"\x00" * 4
    out += (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
    out += bytes([0x80 | 0x00])  # local table, depth 1 (2 entries)
    out += lpal.tobytes()
    out += bytes([2]) + bytes([len(body)]) + body + b"\x00\x3b"
    rgb = gif_to_pixels(bytes(out))
    assert (rgb == lpal[np.array(pixels).reshape(2, 2)]).all()


def test_malformed_rejected():
    with pytest.raises(ValueError, match="signature"):
        gif_to_pixels(b"NOTGIF" + b"\x00" * 20)
    idx = np.zeros((4, 4), np.uint8)
    good = pixels_to_gif(idx, PAL4)
    with pytest.raises(ValueError):
        gif_to_pixels(good[:20])  # truncated
    # pixel index outside the color table must raise, not wrap: literal 3
    # against a 2-entry palette
    bad_codes = [4]
    for p in [0, 1, 3, 1]:
        bad_codes += [p, 4]
    bad_codes[-1] = 5
    two_pal = np.array([[0, 0, 0], [1, 1, 1]], np.uint8)
    gif = _manual_gif(2, 2, _codes(bad_codes, 3), palette=two_pal)
    with pytest.raises(ValueError, match="outside color table"):
        gif_to_pixels(gif)


def test_decode_image_real_handles_gif():
    from docling_japanese_books_spark.multimodal.images import decode_image_real

    idx = (np.arange(48).reshape(6, 8) % 4).astype(np.uint8)
    meta = decode_image_real(pixels_to_gif(idx, PAL4))
    assert meta["format"] == "gif"
    assert (meta["width"], meta["height"]) == (8, 6)
    assert meta["feature"] is not None
