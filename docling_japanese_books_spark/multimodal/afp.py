"""Audio fingerprinting for audio-level near-dup detection — the third
consumer of the generalized 64-bit hamming machinery (text simhash,
image dhash, audio afp), because a crawl's audio corpus duplicates the
same way its images do: re-encodes, volume normalizations, container
moves.

``afp64`` condenses the Haitsma-Kalker sign fingerprint (the published
"robust audio hashing" construction: energy DIFFERENCES along both the
band axis and the time axis, keeping only the sign) to one 64-bit value:
mono mix -> 9 equal time frames -> per-frame magnitude spectrum -> 9
band energies -> bit(f, b) = sign of the band-difference's CHANGE
between consecutive frames — an 8 x 8 sign grid. Two properties do the
work, both test-pinned:

- **volume invariance is EXACT**: scaling every sample by c scales all
  energies by c^2, and sign((c^2 a) - (c^2 b)) == sign(a - b) — so a
  renormalized copy fingerprints identically;
- **re-quantization is NEAR**: an 8-bit PCM re-encode of a 16-bit clip
  perturbs energies slightly, flipping few sign bits — a hamming-near
  pair, exactly what the banding join is for.

Scale shape mirrors phash: one Arrow stage with per-row corruption
isolation, then ``dedup.hamming_near_dups``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .wav_codec import wav_to_samples

_FRAMES = 9   # -> 8 frame-to-frame transitions
_BANDS = 9    # -> 8 band-to-band differences


def afp64(samples: np.ndarray, band_frac: float = 0.25) -> int:
    """64-bit sign fingerprint of an (n,) or (n, ch) sample array.
    Signed-long wrapped like dhash64. Sample RATE doesn't enter: frames
    and bands are relative partitions, so the fingerprint compares
    clips, not absolute frequencies (re-rate a clip and it still
    matches itself — a deliberate simplification of the published
    per-rate filterbank).

    ``band_frac``: only the lowest fraction of the spectrum feeds the
    bands — the published fingerprint restricts to 300-2000 Hz for the
    same reason: real signals carry almost no energy near Nyquist, so
    high bands are noise-dominated and their sign bits are junk
    (measured: full-spectrum bands put -40 dB-noise twins 16 bits apart
    and some unrelated pairs at 13; the low quarter puts twins <= 6 and
    unrelated >= 16 on a 10x10 clip matrix)."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 2:
        a = a.mean(axis=1)
    if a.ndim != 1 or a.size == 0:
        raise ValueError("afp64 needs a non-empty sample array")
    if a.size < _FRAMES * _BANDS * 2:
        a = np.pad(a, (0, _FRAMES * _BANDS * 2 - a.size))
    n = a.size
    fb = (np.arange(_FRAMES + 1) * n) // _FRAMES
    energies = np.empty((_FRAMES, _BANDS))
    for f in range(_FRAMES):
        spec = np.abs(np.fft.rfft(a[fb[f] : fb[f + 1]])) ** 2
        spec = spec[1:]  # drop DC: a constant offset is not content
        m = max(int(spec.size * band_frac), _BANDS)
        spec = spec[:m]
        bb = (np.arange(_BANDS + 1) * m) // _BANDS
        energies[f] = np.add.reduceat(spec, bb[:-1])
    band_diff = energies[:, 1:] - energies[:, :-1]          # 9 x 8
    bits = (band_diff[1:] - band_diff[:-1] > 0).flatten()   # 8 x 8
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def audio_afp(
    audio: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, afp) per WAV payload — one Arrow stage, undecodable
    rows fingerprint to null and leave the candidate pool."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    s, _rate = wav_to_samples(bytes(payload))
                    fp = afp64(s)
                except Exception:
                    fp = None
                ids.append(int(i))
                fps.append(fp)
            yield pd.DataFrame(
                {
                    id_col: pd.array(ids, dtype="Int64"),
                    "afp": pd.array(fps, dtype="Int64"),
                }
            )

    return audio.select(id_col, payload_col).mapInPandas(
        op, f"{id_col} long, afp long"
    )


def audio_near_dups(
    audio: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_hamming: int = 6,
) -> DataFrame:
    """Near-duplicate audio pairs ``(id_a, id_b, hamming)`` with
    hamming(afp) <= max_hamming via the pigeonhole banding join. The
    default bound is looser than the image one: re-quantization
    legitimately flips a few sign bits where a pixel transcode flips
    none."""
    from ..operators.dedup import hamming_near_dups

    sigs = audio_afp(audio, payload_col=payload_col, id_col=id_col)
    return hamming_near_dups(
        sigs, hash_col="afp", id_col=id_col, max_hamming=max_hamming
    )
