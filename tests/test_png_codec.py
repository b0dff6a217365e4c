"""Pure-Python PNG codec (multimodal/png_codec): real pixel decode without
PIL, all five scanline filters, and the real resize + feature paths wired
through the Spark multimodal operators."""

from __future__ import annotations

import numpy as np
import pytest

from docling_japanese_books_spark.multimodal.png_codec import (
    image_features,
    pixels_to_png,
    png_header,
    png_to_pixels,
    resize_nearest,
)


@pytest.mark.parametrize("shape", [(5, 7), (8, 8, 3), (3, 4, 4), (1, 1)])
@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_roundtrip_every_shape_and_filter(shape, ft):
    rng = np.random.default_rng(hash((shape, ft)) % 2**32)
    px = rng.integers(0, 256, shape, dtype=np.uint8)
    back = png_to_pixels(pixels_to_png(px, filter_type=ft))
    assert back.shape == px.shape
    assert (back == px).all()


def test_header_and_subset_rejection():
    px = np.zeros((4, 6), np.uint8)
    assert png_header(pixels_to_png(px)) == (6, 4, 8, 0)
    with pytest.raises(ValueError):
        png_to_pixels(b"not a png")
    # corrupted CRC must be rejected, not mis-read
    data = bytearray(pixels_to_png(px))
    data[20] ^= 0xFF
    with pytest.raises(ValueError):
        png_to_pixels(bytes(data))


def test_resize_nearest_exact_semantics():
    px = np.arange(24, dtype=np.uint8).reshape(4, 6)
    small = resize_nearest(px, 3, 2)
    assert small.shape == (2, 3)
    # index map: ys = [0,2], xs = [0,2,4]
    assert (small == px[[0, 2]][:, [0, 2, 4]]).all()
    up = resize_nearest(px, 12, 8)
    assert up.shape == (8, 12)


def test_decode_image_real_png_without_pil():
    from docling_japanese_books_spark.multimodal.images import decode_image_real

    px = np.full((10, 20), 128, np.uint8)
    meta = decode_image_real(pixels_to_png(px))
    assert meta["width"] == 20 and meta["height"] == 10
    assert meta["format"] == "png"
    assert abs(meta["feature"][0] - 128 / 255) < 1e-9  # real mean from pixels
    assert len(meta["feature"]) == 8


def test_extract_image_features_real_decoder_spark(spark):
    from docling_japanese_books_spark.multimodal.images import (
        decode_image_real,
        extract_image_features,
    )

    px_a = np.zeros((4, 4), np.uint8)
    px_b = np.full((6, 2, 3), 255, np.uint8)
    df = spark.createDataFrame(
        [
            (1, 0, pixels_to_png(px_a)),
            (1, 1, pixels_to_png(px_b)),
            (2, 0, b"corrupt-bytes"),
        ],
        "doc_id long, image_index int, payload binary",
    )
    out = {
        (r.doc_id, r.image_index): r
        for r in extract_image_features(df, decode_fn=decode_image_real).collect()
    }
    assert out[(1, 0)].width == 4 and out[(1, 0)].height == 4
    assert out[(1, 0)].feature[0] == 0.0  # black
    assert out[(1, 1)].width == 2 and out[(1, 1)].height == 6
    assert abs(out[(1, 1)].feature[0] - 1.0) < 1e-9  # white
    assert out[(2, 0)].width is None  # corrupt blob isolated, not a crash


def test_resize_images_real_png_spark(spark):
    from docling_japanese_books_spark.multimodal.media import resize_images

    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    df = spark.createDataFrame(
        [(1, 0, pixels_to_png(px)), (2, 0, b"not-png")],
        "doc_id long, image_index int, payload binary",
    )
    out = {r.doc_id: r for r in resize_images(df, 4, 4).collect()}
    resized = png_to_pixels(bytes(out[1].payload))
    assert resized.shape == (4, 4)
    assert (resized == resize_nearest(px, 4, 4)).all()  # real pixels resized
    assert bytes(out[2].payload).startswith(b"resized:4x4:")  # non-PNG -> stub


def test_image_features_range_and_quadrants():
    px = np.zeros((8, 8), np.uint8)
    px[:4, :4] = 255  # bright top-left quadrant
    f = image_features(px)
    assert all(0.0 <= x <= 1.0 for x in f)
    assert f[4] == 1.0 and f[7] == 0.0  # q_tl bright, q_br dark


def test_adam7_interlaced_decode_hand_built():
    """Adam7 (spec §8.2) fixtures assembled pass-by-pass by hand: the
    seven sub-images are sliced, filtered with None, concatenated into
    one zlib stream — bytes our writer never produces (it only writes
    interlace 0), so the pass geometry is checked independently."""
    import struct
    import zlib

    import numpy as np

    from docling_japanese_books_spark.multimodal.png_codec import (
        PNG_SIGNATURE,
        _ADAM7,
        _chunk,
        png_to_pixels,
    )

    def adam7_png(px):
        h, w = px.shape[:2]
        ch = 1 if px.ndim == 2 else px.shape[2]
        color = {1: 0, 3: 2, 4: 6}[ch]
        px3 = px.reshape(h, w, ch)
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = px3[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            for row in sub:
                raw.append(0)
                raw += row.tobytes()
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1)
        return (
            PNG_SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b"")
        )

    rng = np.random.RandomState(9)
    for shape in ((1, 1), (2, 2), (7, 5), (8, 8), (9, 10, 3), (16, 3)):
        px = rng.randint(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(png_to_pixels(adam7_png(px)), px), shape
    # truncated interlaced stream must be ValueError
    blob = adam7_png(rng.randint(0, 256, size=(8, 8), dtype=np.uint8))
    import pytest

    with pytest.raises(ValueError):
        png_to_pixels(
            blob.replace(b"IDAT", b"IDAT")[:60] + blob[-12:]
        )


def test_palette_png_decode():
    """Color type 3: indices expand through PLTE to (H,W,3); an index
    beyond the palette is a ValueError, not a mis-read."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from docling_japanese_books_spark.multimodal.png_codec import (
        PNG_SIGNATURE,
        _chunk,
        png_to_pixels,
    )

    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = b"".join(b"\x00" + r.tobytes() for r in idx)
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    blob = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", pal)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    out = png_to_pixels(blob)
    assert out.shape == (2, 3, 3)
    assert out[0].tolist() == [[255, 0, 0], [0, 255, 0], [0, 0, 255]]
    assert out[1].tolist() == [[0, 0, 255], [0, 255, 0], [255, 0, 0]]

    oob = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal)
        + _chunk(b"IDAT", zlib.compress(b"\x00\x05"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette"):
        png_to_pixels(oob)
    no_plte = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="PLTE"):
        png_to_pixels(no_plte)
