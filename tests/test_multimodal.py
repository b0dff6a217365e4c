"""Multimodal plumbing: binary payloads -> typed metadata -> manifest."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from docling_japanese_books_spark.multimodal.images import (
    decode_image_real,
    extract_image_features,
    fake_decode,
    image_manifest,
)


@pytest.fixture(scope="module")
def images(spark):
    rows = [
        (1, 0, b"payload-one"),
        (1, 1, b"payload-two"),
        (2, 0, b"payload-three"),
        (3, 0, b""),  # empty payload must not crash
    ]
    return spark.createDataFrame(rows, "doc_id long, image_index int, payload binary")


def test_feature_extraction_schema_and_hashes(spark, images):
    meta = extract_image_features(images)
    rows = {(r.doc_id, r.image_index): r for r in meta.collect()}
    assert rows[(1, 0)].sha256 == hashlib.sha256(b"payload-one").hexdigest()
    assert rows[(1, 0)].n_bytes == len(b"payload-one")
    assert len(rows[(1, 0)].feature) == 8
    assert rows[(1, 0)].format in ("png", "jpeg", "webp")
    assert rows[(3, 0)].n_bytes == 0  # empty payload handled


def test_fake_decode_deterministic():
    a, b = fake_decode(b"same"), fake_decode(b"same")
    assert a == b
    assert 64 <= a["width"] < 256 and 64 <= a["height"] < 256


def test_real_decode_gated():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image_real(b"not an image")


def test_manifest_caps_hashes_at_5(spark):
    rows = [(9, i, f"p{i}".encode()) for i in range(8)]
    images = spark.createDataFrame(rows, "doc_id long, image_index int, payload binary")
    m = image_manifest(extract_image_features(images)).collect()[0]
    assert m.n_images == 8
    assert len(m.image_hashes) == 5  # [:5] like ref vector_db.py:273-275
    assert m.image_hashes == sorted(m.image_hashes)


def test_resize_real_transcodes_all_decodable_formats():
    """resize_image_real now decodes every pure-Python format and
    re-encodes the resized pixels as PNG (lossless transcode target);
    undecodable bytes keep the stub contract."""
    import numpy as np

    from docling_japanese_books_spark.multimodal.gif_codec import pixels_to_gif
    from docling_japanese_books_spark.multimodal.media import resize_image_real
    from docling_japanese_books_spark.multimodal.png_codec import (
        PNG_SIGNATURE,
        png_to_pixels,
    )
    from docling_japanese_books_spark.multimodal.tiff_codec import pixels_to_tiff
    from docling_japanese_books_spark.multimodal.webp_codec import pixels_to_webp

    x, y = np.arange(16), np.arange(12)
    gray = ((x[None, :] * 7 + y[:, None] * 13) % 256).astype(np.uint8)
    rgb = np.dstack([gray, gray[::-1], 255 - gray])

    # GIF is palette-indexed: 4-color blocks image through its own writer
    gif_pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [250, 250, 250]], np.uint8
    )
    gif_idx = (np.indices((12, 16)).sum(axis=0) % 4).astype(np.uint8)
    gif_rgb = gif_pal[gif_idx]

    payloads = {
        "tiff": (pixels_to_tiff(rgb), rgb),
        "webp": (pixels_to_webp(rgb), rgb),
        "gif": (pixels_to_gif(gif_idx, gif_pal), gif_rgb),
    }
    for fmt, (blob, src_img) in payloads.items():
        out = resize_image_real(blob, 8, 6)
        assert out[: len(PNG_SIGNATURE)] == PNG_SIGNATURE, fmt
        px = png_to_pixels(out)
        assert px.shape[:2] == (6, 8), fmt
        # nearest-neighbor: every output pixel exists in the source
        src = src_img.reshape(-1, 3)
        flat = px.reshape(-1, 3) if px.ndim == 3 else px.reshape(-1, 1)
        for p in flat[::7]:
            assert (src == p).all(axis=1).any(), fmt

    stub = resize_image_real(b"not an image", 8, 6)
    assert stub.startswith(b"resized:8x6:")
