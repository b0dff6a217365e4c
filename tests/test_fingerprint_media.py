"""Winnowing fingerprints + audio/video multimodal plumbing."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from docling_japanese_books_spark.multimodal.media import (
    extract_media_features,
    fake_decode_media,
    resize_image_stub,
)
from docling_japanese_books_spark.operators.fingerprint import (
    fingerprint_documents,
    fingerprint_overlap,
    rolling_kgram_hashes,
    winnow,
    winnowing_fingerprint,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches from "
    "the warm windowsill in the afternoon sun and nothing else happens today"
)


class TestWinnowing:
    def test_rolling_hash_matches_naive(self):
        # rolling hashes must equal independently computed polynomial hashes
        text, k = "abcdefghij", 4
        h = rolling_kgram_hashes(text, k)
        B, MASK = 1000003, (1 << 61) - 1
        for i in range(len(text) - k + 1):
            expected = 0
            for c in text[i : i + k].encode():
                expected = (expected * B + c) & MASK
            assert int(h[i]) == expected

    def test_guarantee_shared_fingerprint_for_long_matches(self):
        # winnowing guarantee: any shared substring of length >= w+k-1
        # yields at least one shared fingerprint
        a = "PREFIX " + BASE + " SUFFIX-A"
        b = "other start " + BASE + " different end"
        fa, fb = set(winnowing_fingerprint(a)), set(winnowing_fingerprint(b))
        assert fa & fb

    def test_disjoint_texts_share_nothing(self):
        fa = set(winnowing_fingerprint("aaaaaaaaaaaaaaaaaaaaaa"))
        fb = set(winnowing_fingerprint("bbbbbbbbbbbbbbbbbbbbbb"))
        assert not (fa & fb)

    def test_short_and_empty(self):
        assert winnowing_fingerprint("") == []
        assert winnowing_fingerprint("abc") == []  # shorter than k
        assert len(winnowing_fingerprint("abcdefgh")) == 1  # exactly one k-gram

    def test_winnow_window_edge(self):
        h = np.array([5, 3, 9, 1, 7], dtype=np.uint64)
        out = winnow(h, w=2)
        assert set(out.tolist()) == {3, 1}  # window minima: 3,3,1,1

    def test_spark_overlap(self, spark):
        rows = [(0, BASE), (1, "intro " + BASE + " outro"), (2, "q" * 100)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        fps = fingerprint_documents(df)
        a, b = fps.alias("a"), fps.alias("b")
        pairs = (
            a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("ia"),
                F.col("b.doc_id").alias("ib"),
                fingerprint_overlap(
                    F.col("a.fingerprint"), F.col("b.fingerprint")
                ).alias("ov"),
            )
            .collect()
        )
        ov = {(r.ia, r.ib): r.ov for r in pairs}
        assert ov[(0, 1)] > 0.8  # contained document -> high containment
        assert ov[(0, 2)] == 0.0


class TestMedia:
    def test_media_features_schema(self, spark):
        rows = [(1, 0, b"audio-or-video-bytes-one"), (2, 0, b""), (3, 0, None)]
        df = spark.createDataFrame(rows, "doc_id long, media_index int, payload binary")
        out = {r.doc_id: r for r in extract_media_features(df, n_samples=3).collect()}
        r1 = out[1]
        assert r1.kind in ("audio", "video")
        assert len(r1.samples) == 3
        assert all(len(s.feature) == 4 for s in r1.samples)
        assert (r1.sample_rate is not None) == (r1.kind == "audio")
        assert out[3].n_bytes == 0  # null payload handled

    def test_fake_decode_deterministic(self):
        assert fake_decode_media(b"x") == fake_decode_media(b"x")

    def test_resize_stub_tagged(self):
        out = resize_image_stub(b"img", 32, 16)
        assert out.startswith(b"resized:32x16:") and len(out) > 14


def test_resize_images_plumbing(spark):
    from docling_japanese_books_spark.multimodal.media import (
        resize_image_stub,
        resize_images,
    )

    df = spark.createDataFrame(
        [(1, 0, b"image-a"), (2, 0, b"image-b")],
        "doc_id long, image_index int, payload binary",
    )
    out = {r.doc_id: r for r in resize_images(df, 32, 16).collect()}
    assert out[1].width == 32 and out[1].height == 16
    assert bytes(out[1].payload) == resize_image_stub(b"image-a", 32, 16)
    assert out[1].n_bytes_in == len(b"image-a")
    assert out[1].n_bytes_out == len(bytes(out[1].payload))


def test_sample_frames_video_only_and_deterministic(spark):
    import hashlib

    from docling_japanese_books_spark.multimodal.media import (
        fake_decode_media,
        sample_frames,
    )

    # find payloads that the fake codec classifies as video vs audio
    vid = aud = None
    for i in range(64):
        p = f"payload-{i}".encode()
        kind = fake_decode_media(p)["kind"]
        if kind == "video" and vid is None:
            vid = p
        if kind == "audio" and aud is None:
            aud = p
        if vid and aud:
            break
    df = spark.createDataFrame(
        [(1, 0, vid), (2, 0, aud)], "doc_id long, media_index int, payload binary"
    )
    rows = sample_frames(df, n_frames=4).collect()
    assert {r.doc_id for r in rows} == {1}  # audio rows skipped
    assert sorted(r.frame_index for r in rows) == [0, 1, 2, 3]
    meta = fake_decode_media(vid, n_samples=4)
    by_idx = {r.frame_index: r for r in rows}
    for i, s in enumerate(meta["samples"]):
        assert abs(by_idx[i].offset_s - s["offset_s"]) < 1e-9
        start = (i * 16) % len(vid)
        assert by_idx[i].frame_sha256 == hashlib.sha256(
            vid[start : start + 64] or b"\0"
        ).hexdigest()
    # evenly spaced offsets within the fake duration
    offs = [by_idx[i].offset_s for i in range(4)]
    assert offs == sorted(offs) and offs[0] == 0.0
