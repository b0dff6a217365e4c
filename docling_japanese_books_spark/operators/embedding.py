"""Deterministic embedding stub (reference §2.10 item 5).

The reference embeds chunks with BGE-M3 / Jina models
(``vector_db.py:222-229``, dim 1024 per ``config.py:96-99``). Per the north
rule the correctness invariant is byte-identical *extracted text*, not
embeddings — so for fixture parity we substitute a deterministic,
model-free hash-projection embedding with the same downstream cosine math
(A2-A5). Properties:

- pure function of the text (no RNG, no wall clock, no network);
- identical results across processes/executors (hashlib.sha256-based,
  not Python's salted ``hash``);
- fixed dim (default 64 to match the fixture ``embeddings`` table);
- L2-normalized so cosine == dot.

Executed as an Arrow-batched pandas UDF; per-row work is numpy over
character trigram buckets.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_DIM = 64


def embed_text(text: str, dim: int = DEFAULT_DIM) -> np.ndarray:
    """Hash character trigrams into ``dim`` buckets, signed, L2-normalized."""
    vec = np.zeros(dim, dtype=np.float64)
    if text:
        data = text.encode("utf-8", "surrogatepass")
        for i in range(max(1, len(data) - 2)):
            h = hashlib.sha256(data[i : i + 3]).digest()
            bucket = int.from_bytes(h[:4], "little") % dim
            sign = 1.0 if h[4] & 1 else -1.0
            vec[bucket] += sign
    n = np.linalg.norm(vec)
    if n > 0:
        vec /= n
    return vec.astype(np.float32)


def embed_udf(dim: int = DEFAULT_DIM):
    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: embed_text(t or "", dim).tolist())

    return _embed
