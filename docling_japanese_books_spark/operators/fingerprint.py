"""Document fingerprinting by rolling hash + winnowing (task brief:
"document fingerprinting (rolling hash)").

Classic MOSS/winnowing scheme (Schleimer, Wilkerson, Aiken, SIGMOD'03 —
public algorithm):

1. polynomial rolling hash over every k-gram of the text (numpy-vectorized:
   the rolling property h_{i+1} = (h_i - c_i * B^{k-1}) * B + c_{i+k} is
   evaluated as one cumulative product-free matrix pass);
2. slide a window of w consecutive k-gram hashes; keep each window's
   minimum (rightmost on ties) — guarantees any match of length
   >= w + k - 1 shares a fingerprint;
3. the document's fingerprint = the sorted distinct selected hashes.

Two documents' fingerprint overlap estimates shared content robustly to
insertions/reordering — the containment analog of MinHash's resemblance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_B = np.uint64(1000003)  # polynomial base
_MASK = np.uint64((1 << 61) - 1)


def rolling_kgram_hashes(text: str, k: int = 8) -> np.ndarray:
    """All k-gram rolling hashes of the utf-8 bytes, vectorized.

    Arithmetic is uint64 with intentional wraparound (mod 2^64) followed by
    a 61-bit mask — the product can exceed 64 bits, so overflow wraps by
    design; np.errstate silences the (expected) overflow warning."""
    data = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    n = data.size
    if n < k:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        powers = np.empty(k, dtype=np.uint64)
        powers[0] = np.uint64(1)
        for i in range(1, k):
            powers[i] = (powers[i - 1] * _B) & _MASK
        # windows (n-k+1, k) dot powers-reversed, wraparound + 61-bit mask
        windows = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
        h = np.zeros(windows.shape[0], dtype=np.uint64)
        for j in range(k):  # k is small (8): k passes over the array, no python per-row
            h = (h + windows[:, j] * powers[k - 1 - j]) & _MASK
    return h


def winnow(hashes: np.ndarray, w: int = 4) -> np.ndarray:
    """Select each w-window's minimum hash (rightmost ties), deduplicated."""
    if hashes.size == 0:
        return hashes
    if hashes.size <= w:
        return np.unique(hashes.min(keepdims=True))
    win = np.lib.stride_tricks.sliding_window_view(hashes, w)
    mins = win.min(axis=1)
    return np.unique(mins)


def winnowing_fingerprint(text: str, k: int = 8, w: int = 4) -> list:
    return [int(x) for x in winnow(rolling_kgram_hashes(text, k), w)]


def fingerprint_udf(k: int = 8, w: int = 4):
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _fp(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: winnowing_fingerprint(t or "", k, w))

    return _fp


def fingerprint_overlap(a: Column, b: Column) -> Column:
    """Containment estimate: |A∩B| / min(|A|,|B|) over fingerprint arrays."""
    inter = F.size(F.array_intersect(a, b))
    denom = F.least(F.size(a), F.size(b))
    return F.when(denom > 0, inter.cast("double") / denom).otherwise(F.lit(0.0))


def fingerprint_documents(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8, w: int = 4
) -> DataFrame:
    return df.select(
        F.col(id_col), fingerprint_udf(k, w)(F.col(text_col)).alias("fingerprint")
    )
