"""Embedding quantization kernels (A14 made real).

The reference's quantization study is analytical — storage-size and
claimed-speed tables (``quantization_analysis.py:110-247``); it never
quantizes a vector. These are the actual kernels, as column algebra so
they run inside the scan projection:

- **int8 symmetric**: scale = max|v| / 127, q_i = round(v_i / scale),
  dequant = q_i * scale. Storage 4x smaller; reconstruction error
  measured, not assumed.
- **binary (sign)**: b_i = 1 if v_i > 0 — 32x smaller, searched by
  hamming distance (pairs with the SimHash machinery in dedup.py).

HOF expressions are interpreted per element (fine for projections at
64-1024 dims; for a quantize-everything hot path, swap in a numpy pandas
UDF with identical arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPS = 1e-12  # all-zero vectors quantize to zeros, not NaNs


def int8_scale(vec: Column) -> Column:
    """Symmetric per-vector scale: max|v| / 127."""
    return F.greatest(
        F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double")))) / 127.0,
        F.lit(_EPS),
    )


def quantize_int8(vec: Column, scale: Column) -> Column:
    """v -> array<int> in [-127, 127]."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double") / scale).cast("int")
    )


def dequantize_int8(q: Column, scale: Column) -> Column:
    return F.transform(q, lambda x: x.cast("double") * scale)


def reconstruction_mse(vec: Column, deq: Column) -> Column:
    """Mean squared error between the original and dequantized vectors."""
    sq = F.zip_with(vec, deq, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b))
    return F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x) / F.size(vec)


def quantize_binary(vec: Column) -> Column:
    """Sign quantization: array<int> of 0/1 (1 where v > 0)."""
    return F.transform(vec, lambda x: (x.cast("double") > 0).cast("int"))
