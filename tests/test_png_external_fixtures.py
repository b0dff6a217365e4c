"""Spec-derived EXTERNAL fixtures for the PNG decoder.

The roundtrip tests prove `pixels_to_png` -> `png_to_pixels` is
self-consistent; these fixtures break that closed loop: filtered scanlines
are hand-assembled and the expected reconstructed pixels are computed BY
HAND from the filter recurrences in the public spec (W3C PNG / RFC 2083
§6):

    Sub:     Recon(x) = Filt(x) + Recon(x - bpp)
    Up:      Recon(x) = Filt(x) + Prior(x)
    Average: Recon(x) = Filt(x) + floor((Recon(x-bpp) + Prior(x)) / 2)
    Paeth:   Recon(x) = Filt(x) + PaethPredictor(left, up, upper-left)

so any disagreement indicts the decoder, not the fixture.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from docling_japanese_books_spark.multimodal.png_codec import (
    PNG_SIGNATURE,
    png_to_pixels,
)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _png(w: int, h: int, color: int, raw_stream: bytes, idat_split: int = 0) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(raw_stream)
    out = PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
    # ancillary chunk the decoder must skip (spec: unknown chunks ignored)
    out += _chunk(b"tEXt", b"Comment\x00hand-assembled fixture")
    if idat_split:
        out += _chunk(b"IDAT", idat[:idat_split]) + _chunk(b"IDAT", idat[idat_split:])
    else:
        out += _chunk(b"IDAT", idat)
    return out + _chunk(b"IEND", b"")


def test_grayscale_all_five_filters_hand_computed():
    """4x5 gray, one scanline per filter type; expected values worked by
    hand from the spec recurrences (see module docstring)."""
    raw = (
        b"\x00" + bytes([10, 20, 30, 40])  # None: recon = filt
        + b"\x01" + bytes([5, 5, 5, 5])     # Sub: cumulative left sum
        + b"\x02" + bytes([1, 2, 3, 4])     # Up: + prior
        + b"\x03" + bytes([10, 10, 10, 10]) # Average
        + b"\x04" + bytes([1, 1, 1, 1])     # Paeth
    )
    expected = np.array(
        [
            [10, 20, 30, 40],
            [5, 10, 15, 20],      # 5, 5+5, 10+5, 15+5
            [6, 12, 18, 24],      # 1+5, 2+10, 3+15, 4+20
            [13, 22, 30, 37],     # 10+floor((0+6)/2), 10+floor((13+12)/2), ...
            [14, 23, 31, 38],     # 1+Paeth(0,13,0)=14, 1+Paeth(14,22,13)=23, ...
        ],
        dtype=np.uint8,
    )
    got = png_to_pixels(_png(4, 5, 0, raw))
    assert got.shape == (5, 4)
    assert (got == expected).all()


def test_rgb_sub_and_paeth_respect_pixel_stride():
    """2x2 RGB: Sub/Paeth 'left' is x - bpp (3 bytes back), NOT x - 1 —
    a byte-stride bug reconstructs garbage here but passes on grayscale."""
    raw = (
        b"\x01" + bytes([100, 50, 25, 10, 20, 30])  # Sub
        + b"\x04" + bytes([5, 5, 5, 5, 5, 5])        # Paeth
    )
    expected = np.array(
        [
            [[100, 50, 25], [110, 70, 55]],
            [[105, 55, 30], [115, 75, 60]],
        ],
        dtype=np.uint8,
    )
    got = png_to_pixels(_png(2, 2, 2, raw))
    assert got.shape == (2, 2, 3)
    assert (got == expected).all()


def test_average_floor_division_unsigned():
    """Average uses floor((left + up) / 2) on UNSIGNED bytes: left=255,
    up=255 must predict 255, not -1 (a signed-arithmetic bug wraps here)."""
    raw = (
        b"\x00" + bytes([255, 255])
        + b"\x03" + bytes([0, 1])
    )
    # row1: x0: 0 + floor((0 + 255)/2) = 127; x1: 1 + floor((127+255)/2) = 192
    got = png_to_pixels(_png(2, 2, 0, raw))
    assert got[1].tolist() == [127, 192]


def test_idat_split_mid_stream_and_ancillary_chunks():
    """IDAT may be split at ANY byte boundary (spec §5.6) and ancillary
    chunks interleave freely; the decoder must concatenate before inflate."""
    raw = b"\x00" + bytes([1, 2, 3]) + b"\x02" + bytes([10, 10, 10])
    whole = png_to_pixels(_png(3, 2, 0, raw))
    split = png_to_pixels(_png(3, 2, 0, raw, idat_split=3))
    assert (whole == split).all()
    assert whole[1].tolist() == [11, 12, 13]


def test_corrupt_crc_rejected():
    good = _png(2, 1, 0, b"\x00\x07\x09")
    bad = good[:-5] + bytes([good[-5] ^ 0xFF]) + good[-4:]
    # flip a byte inside the IEND CRC region
    with pytest.raises(ValueError, match="CRC|chunk"):
        png_to_pixels(bad)
