"""Pure-Python RIFF/WAVE codec (multimodal/wav_codec) + media integration.

Roundtrips pin encoder+decoder consistency; the hand-assembled fixtures
(8-bit unsigned PCM, float32, extensible format tag, interleaved LIST
chunk with odd-length padding) follow spec conventions the encoder never
emits, so they indict the decoder independently."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from docling_japanese_books_spark.multimodal.wav_codec import (
    audio_features,
    audio_windows,
    samples_to_wav,
    wav_to_samples,
)


def _chunk(tag: bytes, body: bytes) -> bytes:
    out = tag + struct.pack("<I", len(body)) + body
    return out + (b"\x00" if len(body) % 2 else b"")


def _riff(chunks: bytes) -> bytes:
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _fmt(tag: int, ch: int, rate: int, bits: int, extra: bytes = b"") -> bytes:
    block = ch * bits // 8
    return _chunk(
        b"fmt ",
        struct.pack("<HHIIHH", tag, ch, rate, rate * block, block, bits) + extra,
    )


def test_int16_roundtrip_exact_mono_and_stereo():
    rng = np.random.RandomState(3)
    mono = rng.randint(-32768, 32768, 500, np.int64).astype(np.int16)
    back, rate = wav_to_samples(samples_to_wav(mono, 16000))
    assert rate == 16000 and back.shape == (500, 1)
    assert (back[:, 0] == mono).all()

    stereo = rng.randint(-32768, 32768, (300, 2), np.int64).astype(np.int16)
    back, rate = wav_to_samples(samples_to_wav(stereo, 44100))
    assert rate == 44100 and back.shape == (300, 2)
    assert (back == stereo).all()


def test_external_8bit_unsigned_pcm():
    """8-bit PCM is UNSIGNED with midpoint 128 per the spec — a signed
    read produces garbage. Hand-built: bytes [128, 255, 0, 128] must map
    to int16 [0, 32512, -32768, 0]."""
    wav = _riff(_fmt(1, 1, 8000, 8) + _chunk(b"data", bytes([128, 255, 0, 128])))
    s, rate = wav_to_samples(wav)
    assert rate == 8000
    assert s[:, 0].tolist() == [0, (255 - 128) << 8, -32768, 0]


def test_external_float32():
    f = np.array([0.0, 0.5, -1.0, 2.0], dtype="<f4")  # 2.0 must clip
    wav = _riff(_fmt(3, 1, 22050, 32) + _chunk(b"data", f.tobytes()))
    s, _ = wav_to_samples(wav)
    assert s[:, 0].tolist() == [0, 16384, -32767, 32767]


def test_external_chunk_walk_and_extensible_tag():
    """LIST metadata chunk (odd-sized body -> pad byte), a fact chunk, and
    WAVE_FORMAT_EXTENSIBLE whose SubFormat carries PCM: the decoder must
    skip the extras, honor padding, and unwrap the real format tag."""
    sig = np.arange(-100, 100, dtype=np.int16)
    # cbSize=22, validBits=16, channelMask=0x3, SubFormat GUID starting
    # with the real format tag (PCM=1) per WAVE_FORMAT_EXTENSIBLE layout
    ext = struct.pack("<HHI", 22, 16, 0x3) + struct.pack("<H", 1) + b"\x00" * 14
    chunks = (
        _chunk(b"LIST", b"INFOIART" + b"x" * 5)  # odd length -> padded
        + _fmt(0xFFFE, 1, 8000, 16, ext)
        + _chunk(b"fact", struct.pack("<I", len(sig)))
        + _chunk(b"data", sig.astype("<i2").tobytes())
    )
    s, rate = wav_to_samples(_riff(chunks))
    assert rate == 8000 and (s[:, 0] == sig).all()


def test_compressed_formats_rejected():
    wav = _riff(_fmt(2, 1, 8000, 4) + _chunk(b"data", b"\x00" * 16))  # ADPCM
    with pytest.raises(ValueError, match="unsupported WAV format"):
        wav_to_samples(wav)
    with pytest.raises(ValueError, match="RIFF"):
        wav_to_samples(b"not audio at all")
    trunc = _riff(_fmt(1, 1, 8000, 16) + b"data" + struct.pack("<I", 100) + b"\x00" * 10)
    with pytest.raises(ValueError, match="truncated"):
        wav_to_samples(trunc)


def test_audio_features_hand_computed():
    """A square wave alternating +/-16384: RMS = 0.5 exactly, every
    consecutive pair crosses zero."""
    sig = np.tile([16384, -16384], 400).astype(np.int16)
    f = audio_features(sig, 8000)
    assert f["duration_s"] == 800 / 8000
    assert abs(f["rms"] - 0.5) < 1e-12
    assert abs(f["zcr"] - (799 / 800)) < 1e-12
    assert f["peak"] == 0.5
    wins = audio_windows(sig, 8000, n_windows=4)
    assert len(wins) == 4
    assert wins[1]["offset_s"] == round(200 / 8000, 3)
    assert all(abs(w["feature"][0] - 0.5) < 1e-12 for w in wins)


def test_decode_media_real_wav_through_spark(spark):
    """Real WAV bytes through the media pipeline: extract_media_features
    with decode_media_real yields true duration/rate/windows; corrupt
    payloads isolate to null rows, not task failures."""
    from pyspark.sql import Row

    from docling_japanese_books_spark.multimodal.media import (
        decode_media_real,
        extract_media_features,
    )

    def clip(d: int) -> bytes:
        i = np.arange(800 + d * 80)
        return samples_to_wav(((i * 13 + d) % 1500 - 750).astype(np.int16), 8000)

    rows = [Row(doc_id=d, media_index=0, payload=clip(d)) for d in range(6)]
    rows.append(Row(doc_id=99, media_index=0, payload=b"RIFFxxxxWAVEjunk"))
    df = spark.createDataFrame(rows)
    out = {
        (r.doc_id): r
        for r in extract_media_features(df, decode_fn=decode_media_real).collect()
    }
    for d in range(6):
        assert out[d].kind == "audio"
        assert out[d].sample_rate == 8000
        assert abs(out[d].duration_s - (800 + d * 80) / 8000.0) < 1e-9
        assert len(out[d].samples) == 4
    assert out[99].kind is None  # corrupt bytes isolated per row


def test_nonfinite_float32_rejected():
    """ADVICE r4: NaN/Inf float samples would survive clip/round into a
    platform-undefined int16 cast — malformed media must raise, not
    silently decode to garbage."""
    for val in (float("nan"), float("inf"), float("-inf")):
        f = np.array([0.0, val, 0.5], dtype="<f4")
        wav = _riff(_fmt(3, 1, 22050, 32) + _chunk(b"data", f.tobytes()))
        with pytest.raises(ValueError, match="non-finite"):
            wav_to_samples(wav)
