"""Baseline TIFF codec (multimodal/tiff_codec.py): roundtrips across
byte orders / strips / PackBits / photometrics, hand-assembled external
fixtures (spec IFD byte layout), and the ValueError-only contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from docling_japanese_books_spark.multimodal.tiff_codec import (
    packbits_decode,
    packbits_encode,
    pixels_to_tiff,
    tiff_to_pixels,
)


def _grad(h, w, seed=0):
    x, y = np.arange(w), np.arange(h)
    return ((x[None, :] * 7 + y[:, None] * 13 + seed) % 256).astype(np.uint8)


def test_gray_roundtrip_both_byte_orders():
    px = _grad(13, 21, 5)
    for bo in ("<", ">"):
        back = tiff_to_pixels(pixels_to_tiff(px, byte_order=bo))
        assert back.shape == (13, 21) and (back == px).all(), bo


def test_rgb_roundtrip_multistrip():
    px = np.dstack([_grad(16, 9, s) for s in (0, 50, 100)])
    for rps in (1, 3, 16):
        back = tiff_to_pixels(pixels_to_tiff(px, rows_per_strip=rps))
        assert back.shape == (16, 9, 3) and (back == px).all(), rps


def test_packbits_roundtrip_and_compression():
    # long constant runs compress well and must roundtrip exactly
    px = np.repeat(np.arange(8, dtype=np.uint8) * 32, 40).reshape(8, 40)
    data = pixels_to_tiff(px, compression=32773, rows_per_strip=2)
    assert len(data) < px.size  # PackBits actually compressed the runs
    assert (tiff_to_pixels(data) == px).all()
    # adversarial mixed content through the raw encoder
    for blob in (b"", b"a", b"abc", b"aaab", b"ab" * 64, bytes(range(256)) * 3):
        assert packbits_decode(packbits_encode(blob)) == blob


def test_packbits_spec_examples():
    """The worked example from the TIFF 6.0 spec, §9."""
    encoded = bytes(
        [0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA, 0x03, 0x80, 0x00,
         0x2A, 0x22, 0xF7, 0xAA]
    )
    expected = (
        b"\xaa\xaa\xaa\x80\x00\x2a\xaa\xaa\xaa\xaa\x80\x00\x2a\x22"
        + b"\xaa" * 10
    )
    assert packbits_decode(encoded) == expected


def _ifd_entry(bo, tag, typ, count, value):
    return struct.pack(bo + "HHI", tag, typ, count) + value


def test_external_hand_assembled_gray_tiff():
    """A 2x2 grayscale TIFF laid out byte-by-byte from the spec: header,
    pixel strip at offset 8, IFD at 12 — our writer never produced these
    bytes (different layout), so the decoder is checked independently."""
    bo = "<"
    pixels = bytes([10, 200, 30, 255])
    entries = [
        _ifd_entry(bo, 256, 3, 1, struct.pack("<HH", 2, 0)),   # width
        _ifd_entry(bo, 257, 3, 1, struct.pack("<HH", 2, 0)),   # height
        _ifd_entry(bo, 258, 3, 1, struct.pack("<HH", 8, 0)),   # bits
        _ifd_entry(bo, 259, 3, 1, struct.pack("<HH", 1, 0)),   # no compression
        _ifd_entry(bo, 262, 3, 1, struct.pack("<HH", 1, 0)),   # BlackIsZero
        _ifd_entry(bo, 273, 4, 1, struct.pack("<I", 8)),       # strip at 8
        _ifd_entry(bo, 277, 3, 1, struct.pack("<HH", 1, 0)),   # 1 sample
        _ifd_entry(bo, 278, 3, 1, struct.pack("<HH", 2, 0)),   # rows/strip
        _ifd_entry(bo, 279, 4, 1, struct.pack("<I", 4)),       # strip bytes
    ]
    ifd = struct.pack("<H", len(entries)) + b"".join(entries) + struct.pack("<I", 0)
    blob = b"II*\x00" + struct.pack("<I", 12) + pixels + ifd
    out = tiff_to_pixels(blob)
    assert out.tolist() == [[10, 200], [30, 255]]


def test_external_big_endian_white_is_zero():
    """Big-endian + WhiteIsZero: a fax-style inverted grayscale, all
    fields MM-packed by hand."""
    bo = ">"
    pixels = bytes([0, 255, 128, 64])
    entries = [
        _ifd_entry(bo, 256, 3, 1, struct.pack(">HH", 2, 0)),
        _ifd_entry(bo, 257, 3, 1, struct.pack(">HH", 2, 0)),
        _ifd_entry(bo, 258, 3, 1, struct.pack(">HH", 8, 0)),
        _ifd_entry(bo, 259, 3, 1, struct.pack(">HH", 1, 0)),
        _ifd_entry(bo, 262, 3, 1, struct.pack(">HH", 0, 0)),  # WhiteIsZero
        _ifd_entry(bo, 273, 4, 1, struct.pack(">I", 8)),
        _ifd_entry(bo, 277, 3, 1, struct.pack(">HH", 1, 0)),
        _ifd_entry(bo, 278, 3, 1, struct.pack(">HH", 2, 0)),
        _ifd_entry(bo, 279, 4, 1, struct.pack(">I", 4)),
    ]
    ifd = struct.pack(">H", len(entries)) + b"".join(entries) + struct.pack(">I", 0)
    blob = b"MM\x00*" + struct.pack(">I", 12) + pixels + ifd
    out = tiff_to_pixels(blob)
    assert out.tolist() == [[255, 0], [127, 191]]  # inverted


def test_palette_tiff():
    """Photometric 3: indices map through a 16-bit ColorMap (>>8)."""
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    # build via the writer layout, then patch photometric + append a map?
    # simpler: hand-build with the colormap stored after the IFD
    bo = "<"
    cmap_vals = [0] * 768
    cmap_vals[0], cmap_vals[1], cmap_vals[2] = 0x1000, 0x8000, 0xFF00  # reds
    cmap_vals[256], cmap_vals[257] = 0x2000, 0x4000                     # greens
    cmap_vals[512 + 2] = 0xFF00                                         # blues
    pixels = idx.tobytes()
    ifd_off = 8 + len(pixels)
    cmap_off = ifd_off + 2 + 10 * 12 + 4
    entries = [
        _ifd_entry(bo, 256, 3, 1, struct.pack("<HH", 2, 0)),
        _ifd_entry(bo, 257, 3, 1, struct.pack("<HH", 2, 0)),
        _ifd_entry(bo, 258, 3, 1, struct.pack("<HH", 8, 0)),
        _ifd_entry(bo, 259, 3, 1, struct.pack("<HH", 1, 0)),
        _ifd_entry(bo, 262, 3, 1, struct.pack("<HH", 3, 0)),  # palette
        _ifd_entry(bo, 273, 4, 1, struct.pack("<I", 8)),
        _ifd_entry(bo, 277, 3, 1, struct.pack("<HH", 1, 0)),
        _ifd_entry(bo, 278, 3, 1, struct.pack("<HH", 2, 0)),
        _ifd_entry(bo, 279, 4, 1, struct.pack("<I", len(pixels))),
        _ifd_entry(bo, 320, 3, 768, struct.pack("<I", cmap_off)),
    ]
    ifd = struct.pack("<H", len(entries)) + b"".join(entries) + struct.pack("<I", 0)
    blob = (
        b"II*\x00" + struct.pack("<I", ifd_off) + pixels + ifd
        + struct.pack("<768H", *cmap_vals)
    )
    out = tiff_to_pixels(blob)
    assert out.shape == (2, 2, 3)
    assert out[0, 0].tolist() == [0x10, 0x20, 0x00]
    assert out[0, 1].tolist() == [0x80, 0x40, 0x00]
    assert out[1, 0].tolist() == [0xFF, 0x00, 0xFF]


def test_valueerror_contract():
    px = _grad(4, 4)
    good = pixels_to_tiff(px)
    for bad in (
        b"",
        b"II*\x00",                         # header only
        b"XX*\x00" + good[4:],              # bad magic
        good[:20],                           # truncated IFD
        good[:-6] + struct.pack("<IH", 99999, 0),  # strip offset OOB-ish
    ):
        with pytest.raises(ValueError):
            tiff_to_pixels(bad)
    # unsupported compression id
    lzw = pixels_to_tiff(px)
    idx = lzw.find(struct.pack("<HHI", 259, 3, 1))
    bad = lzw[: idx + 8] + struct.pack("<HH", 5, 0) + lzw[idx + 12 :]
    with pytest.raises(ValueError, match="compression"):
        tiff_to_pixels(bad)


def test_decode_image_real_dispatches_tiff():
    from docling_japanese_books_spark.multimodal.images import decode_image_real

    px = _grad(10, 12, 3)
    meta = decode_image_real(pixels_to_tiff(px, byte_order=">"))
    assert meta["format"] == "tiff"
    assert (meta["width"], meta["height"]) == (12, 10)
    assert meta["feature"] is not None
