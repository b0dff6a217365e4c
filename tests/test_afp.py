"""Audio fingerprinting (multimodal/afp.py): exact volume invariance,
re-quantization nearness, separation of unrelated clips, and the
banding near-dup join over real WAV bytes."""

from __future__ import annotations

import numpy as np

from docling_japanese_books_spark.multimodal.afp import (
    afp64,
    audio_afp,
    audio_near_dups,
)
from docling_japanese_books_spark.multimodal.wav_codec import samples_to_wav


def _clip(seed=3, n=8000):
    """A deterministic BROADBAND clip: tilted spectral envelope with a
    seed-dependent ripple, random phases, and a slow temporal amplitude
    modulation — the spectral/temporal structure real audio has (a
    sparse multi-tone fixture leaves most band energies at noise level
    and the sign grid undecided)."""
    rng = np.random.RandomState(seed)
    m = n // 2 + 1
    k = np.arange(m)
    mag = (1.0 + k / 40.0) ** -1.5 * (
        1.0 + 0.8 * np.sin(2 * np.pi * k / 37.0 + seed)
    )
    spec = mag * np.exp(1j * rng.uniform(0, 2 * np.pi, m))
    spec[0] = 0
    x = np.fft.irfft(spec, n)
    t = np.arange(n) / n
    x = x * (1.0 + 0.6 * np.sin(2 * np.pi * (3 + seed % 3) * t))
    return x / np.abs(x).max() * 0.5


def _i16(x, scale=1.0):
    return np.clip(np.round(x * scale * 32767.0), -32768, 32767).astype(
        np.int16
    )


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_afp_volume_invariance_is_exact():
    x = _clip()
    # float-domain scaling is exactly sign-preserving on the energies
    assert afp64(x * 0.25) == afp64(x)
    assert afp64(x * 3.0) == afp64(x)
    # int16-domain halving only nudges energies via rounding noise
    assert _ham(afp64(_i16(x)), afp64(_i16(x, 0.5))) <= 4


def test_afp_requantization_is_near_not_equal():
    x = _i16(_clip())
    crushed = ((x.astype(np.int32) >> 8) << 8).astype(np.int16)  # 8-bit depth
    d = _ham(afp64(x), afp64(crushed))
    assert d <= 6, d


def test_afp_unrelated_clips_separate():
    d = _ham(afp64(_clip(seed=1)), afp64(_clip(seed=2)))
    assert d >= 16, d


def test_afp_edge_inputs():
    assert afp64(np.zeros(100)) == 0          # silence: no sign ever wins
    assert isinstance(afp64(np.ones(5)), int)  # tiny input pads, no crash
    # stereo mixes down: duplicating the channel changes nothing
    x = _clip()
    assert afp64(np.stack([x, x], axis=1)) == afp64(x)


def test_audio_near_dups_end_to_end(spark):
    """Volume-normalized twins pair up; unrelated clips and corrupt
    payloads don't."""
    rows = [
        (0, bytearray(samples_to_wav(_i16(_clip(seed=1)), 8000))),
        (1, bytearray(samples_to_wav(_i16(_clip(seed=1), 0.5), 8000))),
        (2, bytearray(samples_to_wav(_i16(_clip(seed=2)), 8000))),
        (3, bytearray(b"RIFFgarbage")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fps = {r.doc_id: r.afp for r in audio_afp(df).collect()}
    assert fps[3] is None
    assert _ham(fps[0], fps[1]) <= 4
    pairs = {
        (r.id_a, r.id_b) for r in audio_near_dups(df, max_hamming=6).collect()
    }
    assert (0, 1) in pairs
    assert all(2 not in p and 3 not in p for p in pairs)
