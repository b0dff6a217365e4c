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
