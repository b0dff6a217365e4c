"""Uncompressed AVI codec (multimodal/avi_codec.py): roundtrips, the
bottom-up-BGR-with-stride-padding pixel math on a hand-assembled
fixture, frame sampling on real pixels, and the ValueError contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from docling_japanese_books_spark.multimodal.avi_codec import (
    avi_to_frames,
    frame_features,
    frames_to_avi,
)


def _frames(n, h, w, seed=0):
    rng = np.arange(n * h * w * 3, dtype=np.int64) * 31 + seed
    return (rng % 256).astype(np.uint8).reshape(n, h, w, 3)


def test_roundtrip_multiframe():
    frames = _frames(5, 7, 9, seed=3)  # w*3=27 -> stride padding exercised
    back, fps = avi_to_frames(frames_to_avi(frames, fps=12))
    assert fps == 12.0
    assert back.shape == frames.shape and (back == frames).all()


def test_roundtrip_single_frame_aligned_width():
    frames = _frames(1, 4, 8)  # w*3=24, already 4-byte aligned
    back, fps = avi_to_frames(frames_to_avi(frames, fps=24))
    assert (back == frames).all() and fps == 24.0


def _chunk(fcc, body):
    pad = b"\x00" if len(body) % 2 else b""
    return fcc + struct.pack("<I", len(body)) + body + pad


def _list(kind, body):
    return _chunk(b"LIST", kind + body)


def test_external_hand_assembled_2x2():
    """A 2x2 single-frame AVI laid out field-by-field from the AVI/DIB
    spec: bottom-up rows, BGR order, rows padded 6 -> 8 bytes. Expected
    RGB output hand-derived — the decoder is checked against bytes our
    writer never produced (different header field choices)."""
    avih = struct.pack(
        "<14I", 41667, 0, 0, 0, 1, 0, 1, 0, 2, 2, 0, 0, 0, 0
    )  # 24 fps via usec-per-frame ONLY (no strh rate -> fallback path)
    strh = b"vids" + b"RGB " + struct.pack(
        "<IHHIIIIIIII4h", 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0
    )  # dwScale=dwRate=0 -> decoder must fall back to avih
    strf = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 0, 0, 0, 0)
    # bottom row first: (B,G,R) pixels; pad each 6-byte row to 8
    bottom = bytes([255, 0, 0,   0, 255, 0]) + b"\x00\x00"  # blue, green
    top = bytes([0, 0, 255,   255, 255, 255]) + b"\x00\x00"  # red, white
    frame = _chunk(b"00db", bottom + top)
    body = (
        b"AVI "
        + _list(b"hdrl", _chunk(b"avih", avih)
                + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
        + _list(b"movi", frame)
    )
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    frames, fps = avi_to_frames(blob)
    assert abs(fps - 24.0) < 0.01  # 1e6 / 41667
    assert frames.shape == (1, 2, 2, 3)
    # top-down RGB: row 0 = [red, white], row 1 = [blue, green]
    assert frames[0, 0, 0].tolist() == [255, 0, 0]
    assert frames[0, 0, 1].tolist() == [255, 255, 255]
    assert frames[0, 1, 0].tolist() == [0, 0, 255]
    assert frames[0, 1, 1].tolist() == [0, 255, 0]


def test_valueerror_contract():
    good = frames_to_avi(_frames(2, 3, 3))
    for bad in (
        b"",
        b"RIFF\x04\x00\x00\x00WAVE",          # wrong RIFF form
        good[:40],                             # truncated
        good.replace(b"00db", b"00dc", 1)[:12]  # nonsense slice
        + b"\xff" * 8,
    ):
        with pytest.raises(ValueError):
            avi_to_frames(bad)
    # compressed fourcc must be rejected, not mis-read: set biCompression
    idx = good.find(struct.pack("<Iii", 40, 3, 3))  # strf BITMAPINFOHEADER
    assert idx > 0
    bad = bytearray(good)
    struct.pack_into("<I", bad, idx + 16, 0x30355649)  # 'IV50'
    with pytest.raises(ValueError, match="compressed AVI"):
        avi_to_frames(bytes(bad))


def test_decode_media_real_video_branch():
    from docling_japanese_books_spark.multimodal.media import decode_media_real

    frames = _frames(8, 4, 4, seed=7)
    meta = decode_media_real(frames_to_avi(frames, fps=4), n_samples=4)
    assert meta["kind"] == "video"
    assert meta["n_frames"] == 8
    assert abs(meta["duration_s"] - 2.0) < 1e-9
    assert len(meta["samples"]) == 4
    # offsets are evenly spaced real frame timestamps
    assert [s["offset_s"] for s in meta["samples"]] == [0.0, 0.5, 1.0, 1.5]
    # features are the real per-frame channel means
    exp = frame_features(frames[2])
    assert meta["samples"][1]["feature"] == exp


def test_sample_frames_real_avi(spark):
    from docling_japanese_books_spark.multimodal.media import sample_frames

    frames = _frames(6, 4, 5, seed=1)
    rows = [
        (1, 0, frames_to_avi(frames, fps=3)),
        (2, 0, b"not a video at all"),  # falls back to the fake path
        (3, 0, frames_to_avi(frames[:1], fps=1)[:30]),  # corrupt: skipped
    ]
    df = spark.createDataFrame(rows, "doc_id long, media_index int, payload binary")
    out = sample_frames(df, n_frames=3).collect()
    mine = [r for r in out if r.doc_id == 1]
    assert len(mine) == 3
    assert [r.offset_s for r in mine] == [0.0, 0.667, 1.333]
    import hashlib

    assert mine[0].frame_sha256 == hashlib.sha256(frames[0].tobytes()).hexdigest()
    assert not [r for r in out if r.doc_id == 3]  # corrupt isolated
