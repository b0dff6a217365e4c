"""Pure-Python baseline JPEG codec (multimodal/jpeg_codec).

Roundtrips pin encoder+decoder consistency; the hand-assembled fixture in
``test_external_dc_only_fixture`` breaks the closed loop — its entropy
bytes are Huffman-coded BY HAND from the Annex K tables and its expected
pixels derived from the spec's DC-only IDCT (all samples = DC/8 + 128),
so it indicts the decoder independently of the encoder."""

from __future__ import annotations

import numpy as np
import pytest

from docling_japanese_books_spark.multimodal.jpeg_codec import (
    AC_LUM_BITS,
    AC_LUM_VALS,
    DC_LUM_BITS,
    DC_LUM_VALS,
    QUANT_LUM,
    ZIGZAG,
    jpeg_header,
    jpeg_to_pixels,
    pixels_to_jpeg,
)


def _gradient(w: int, h: int) -> np.ndarray:
    x, y = np.meshgrid(np.linspace(0.0, 1.0, w), np.linspace(0.0, 1.0, h))
    return (60 + 120 * x + 50 * y).astype(np.uint8)


def test_uniform_gray_quality100_is_exact():
    """A uniform image quantizes to DC-only blocks with step 1 at q100:
    the roundtrip must be byte-exact (the oracle query relies on this)."""
    for v in (0, 7, 132, 255):
        px = np.full((24, 17), v, np.uint8)
        back = jpeg_to_pixels(pixels_to_jpeg(px, quality=100))
        assert back.shape == (24, 17)
        assert (back == px).all(), f"value {v} not exact"


def test_uniform_rgb_quality100_is_exact_both_subsamplings():
    for sub in ("4:4:4", "4:2:0"):
        px = np.full((16, 16, 3), [120, 33, 250], np.uint8)
        back = jpeg_to_pixels(pixels_to_jpeg(px, quality=100, subsampling=sub))
        assert (back == px).all(), sub


def test_smooth_gradient_tolerances():
    px = _gradient(37, 23)
    back = jpeg_to_pixels(pixels_to_jpeg(px, quality=95))
    assert back.shape == px.shape
    assert np.abs(back.astype(int) - px.astype(int)).max() <= 4
    rgb = np.stack([px, px[::-1], px // 2], axis=-1)
    for sub, tol in (("4:4:4", 6), ("4:2:0", 8)):
        back = jpeg_to_pixels(pixels_to_jpeg(rgb, quality=95, subsampling=sub))
        assert np.abs(back.astype(int) - rgb.astype(int)).max() <= tol, sub


def test_odd_sizes_and_block_padding():
    """Dimensions not multiples of 8 (and of 16 for 4:2:0 MCUs) decode to
    the EXACT original frame size, never the padded grid."""
    for w, h in ((1, 1), (7, 3), (9, 17), (31, 15)):
        px = _gradient(w, h)
        back = jpeg_to_pixels(pixels_to_jpeg(px, quality=92))
        assert back.shape == (h, w)
        rgb = np.stack([px, px, px], axis=-1)
        back = jpeg_to_pixels(
            pixels_to_jpeg(rgb, quality=92, subsampling="4:2:0")
        )
        assert back.shape == (h, w, 3)


def test_restart_intervals_roundtrip():
    """DRI/RSTn: predictors reset and the bitstream re-aligns per interval;
    decoded output must equal the no-restart encode."""
    px = _gradient(48, 32)
    plain = jpeg_to_pixels(pixels_to_jpeg(px, quality=90))
    restarted = jpeg_to_pixels(pixels_to_jpeg(px, quality=90, restart_interval=3))
    assert (plain == restarted).all()
    jp = pixels_to_jpeg(px, quality=90, restart_interval=3)
    assert any(
        jp[i] == 0xFF and 0xD0 <= jp[i + 1] <= 0xD7 for i in range(len(jp) - 1)
    )  # real RST markers present


def test_header_probe():
    jp = pixels_to_jpeg(_gradient(37, 23), quality=80)
    assert jpeg_header(jp) == (37, 23, 1)
    rgb = np.stack([_gradient(5, 9)] * 3, axis=-1)
    assert jpeg_header(pixels_to_jpeg(rgb)) == (5, 9, 3)


def test_byte_stuffing_survives():
    """Encodes that produce 0xFF bytes in the entropy stream must stuff
    0x00 and the decoder must unstuff — a high-entropy image makes FF
    bytes near-certain."""
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (40, 40), np.uint8)
    jp = pixels_to_jpeg(px, quality=97)
    back = jpeg_to_pixels(jp)
    assert back.shape == (40, 40)
    # quality 97 on noise: bounded quantization error, not garbage
    assert np.abs(back.astype(int) - px.astype(int)).max() <= 32


def test_out_of_subset_rejected():
    jp = bytearray(pixels_to_jpeg(_gradient(16, 16)))
    sof = jp.find(b"\xff\xc0")
    jp[sof + 1] = 0xC2  # masquerade as progressive
    with pytest.raises(ValueError, match="SOF0 only"):
        jpeg_to_pixels(bytes(jp))
    with pytest.raises(ValueError, match="SOI"):
        jpeg_to_pixels(b"not a jpeg")
    with pytest.raises(ValueError):
        jpeg_to_pixels(pixels_to_jpeg(_gradient(16, 16))[:40])  # truncated


def test_external_dc_only_fixture():
    """Hand-assembled single-block grayscale JPEG, entropy bytes Huffman-
    coded BY HAND from the Annex K tables:

      DC category 2 code '011' + bits '10'  (diff = +2)
      EOB code '1010'
      -> 011 10 1010 + 1-padding = 0x75 0x7F

    Annex K luminance quantizer [0] = 16, so DC = 2*16 = 32 and the
    DC-only IDCT gives every sample 32/8 + 128 = 132."""

    def marker(tag: int, payload: bytes) -> bytes:
        return bytes([0xFF, tag]) + (len(payload) + 2).to_bytes(2, "big") + payload

    dqt = marker(0xDB, bytes([0]) + bytes(QUANT_LUM[ZIGZAG].tolist()))
    sof = marker(
        0xC0,
        bytes([8])  # precision
        + (8).to_bytes(2, "big")  # height
        + (8).to_bytes(2, "big")  # width
        + bytes([1])  # 1 component
        + bytes([1, 0x11, 0]),  # id=1, h=v=1, quant table 0
    )
    dht_dc = marker(0xC4, bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
    dht_ac = marker(0xC4, bytes([0x10]) + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS))
    sos = marker(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    jp = b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + bytes([0x75, 0x7F]) + b"\xff\xd9"

    px = jpeg_to_pixels(jp)
    assert px.shape == (8, 8)
    assert (px == 132).all()


def test_decode_image_real_handles_jpeg():
    from docling_japanese_books_spark.multimodal.images import decode_image_real

    px = _gradient(20, 12)
    meta = decode_image_real(pixels_to_jpeg(px, quality=95))
    assert meta["format"] == "jpeg"
    assert (meta["width"], meta["height"]) == (20, 12)
    assert meta["feature"] is not None and len(meta["feature"]) == 8
