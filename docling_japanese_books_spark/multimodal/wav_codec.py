"""Pure-Python WAV (RIFF/WAVE) codec — real audio decode without ffmpeg.

``multimodal/media.py`` gated ALL real audio decode behind ffmpeg; but
uncompressed WAV is a public container spec (RIFF 1991 / EBU Tech 3285)
with no compression at all, so a real decode path needs only struct +
numpy — the same move that un-gated PNG (round 3) and JPEG (round 4):

- ``samples_to_wav``: int16 PCM (mono or multi-channel) -> valid RIFF
  bytes (fmt + data chunks, correct sizes, word-aligned).
- ``wav_to_samples``: decodes PCM 8-bit (unsigned, per spec) and 16-bit
  (signed little-endian) plus IEEE float32 (format 3), walking the chunk
  list (LIST/fact/bext chunks skipped, odd-length padding honored).
  Compressed formats (ADPCM, mu-law, MP3-in-WAV) raise ValueError —
  rejected, never mis-read.
- ``audio_features``: duration, RMS, zero-crossing rate, peak — the
  deterministic feature set the media pipeline samples per window.

Lossless: int16 round-trips byte-exactly, which the oracle query
(`wav_audio_roundtrip`) hash-checks per document.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np


def samples_to_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 samples, shape (n,) mono or (n, ch) -> RIFF/WAVE bytes."""
    s = np.asarray(samples)
    if s.dtype != np.int16:
        raise ValueError("samples must be int16 (PCM)")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError(f"unsupported sample shape {samples.shape}")
    n, ch = s.shape
    data = s.astype("<i2").tobytes()
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, 16
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:  # word alignment (cannot happen for 16-bit, kept for form)
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def wav_to_samples(payload: bytes) -> Tuple[np.ndarray, int]:
    """WAV bytes -> (int16 samples (n, ch), sample_rate).

    8-bit PCM is unsigned per spec (recentred to signed 16-bit here);
    float32 is clipped to [-1, 1] and scaled to int16."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt_tag = None
    ch = rate = bits = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt_tag, ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt_tag == 0xFFFE and size >= 40:  # WAVE_FORMAT_EXTENSIBLE
                # SubFormat GUID's first two bytes carry the real tag
                fmt_tag = struct.unpack("<H", body[24:26])[0]
        elif tag == b"data":
            data = body
        # LIST / fact / bext / anything else: skipped
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt_tag is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if fmt_tag == 1 and bits == 16:
        s = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
    elif fmt_tag == 1 and bits == 8:
        # 8-bit PCM is UNSIGNED (0..255, midpoint 128) per the spec
        u = np.frombuffer(data, dtype=np.uint8).astype(np.int32)
        s = ((u - 128) << 8).astype(np.int16)
    elif fmt_tag == 3 and bits == 32:
        f = np.frombuffer(data[: len(data) // 4 * 4], dtype="<f4")
        # NaN/Inf samples would propagate through clip/round and hit a
        # platform-undefined float->int16 cast — malformed media is
        # rejected, never mis-read
        if not np.isfinite(f).all():
            raise ValueError("non-finite float32 WAV samples")
        s = np.clip(np.round(np.clip(f, -1.0, 1.0) * 32767.0), -32768, 32767).astype(
            np.int16
        )
    else:
        raise ValueError(
            f"unsupported WAV format (tag={fmt_tag}, bits={bits}); PCM 8/16 "
            "and float32 only"
        )
    if ch and ch > 1:
        s = s[: len(s) // ch * ch].reshape(-1, ch)
    else:
        s = s.reshape(-1, 1)
    return s, int(rate)


def audio_features(samples: np.ndarray, sample_rate: int) -> dict:
    """Deterministic whole-clip features: duration, RMS (of the float
    [-1,1] signal), zero-crossing rate, peak."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 2:
        s = s.mean(axis=1)  # mixdown
    x = s / 32768.0
    n = len(x)
    if n == 0:
        return dict(duration_s=0.0, rms=0.0, zcr=0.0, peak=0.0)
    zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return dict(
        duration_s=n / float(sample_rate),
        rms=float(np.sqrt(np.mean(x * x))),
        zcr=zc / float(n),
        peak=float(np.abs(x).max()),
    )


def audio_windows(
    samples: np.ndarray, sample_rate: int, n_windows: int = 4
) -> List[dict]:
    """Evenly-spaced analysis windows, each with a 4-dim feature
    [rms, zcr, mean, peak] — the same batch shape the fake decoder (and a
    real ffmpeg frame sampler) produces."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 2:
        s = s.mean(axis=1)
    n = len(s)
    out = []
    if n == 0:
        return out
    win = max(1, n // n_windows)
    for i in range(n_windows):
        a = i * win
        chunk = s[a : a + win] / 32768.0
        if len(chunk) == 0:
            break
        zc = int(np.count_nonzero(np.signbit(chunk[1:]) != np.signbit(chunk[:-1])))
        out.append(
            dict(
                offset_s=round(a / float(sample_rate), 3),
                feature=[
                    float(np.sqrt(np.mean(chunk * chunk))),
                    zc / float(len(chunk)),
                    float(chunk.mean()),
                    float(np.abs(chunk).max()),
                ],
            )
        )
    return out
