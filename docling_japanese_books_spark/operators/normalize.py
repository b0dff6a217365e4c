"""X12: CJK-aware text normalization (north-rule requirement).

Not present in the reference (implied by BASELINE north rule: "CJK-aware
text normalization (NFKC, zenkaku/hankaku folding)"). NFKC already folds
full-width ASCII (ＡＢＣ１２３ → ABC123) and half-width katakana
(ｶﾀｶﾅ → カタカナ); we expose it as an Arrow-batched pandas UDF so the byte
output is produced in exactly one place (SURVEY §7 "byte-identical text
across Arrow round-trips").

Determinism: ``unicodedata.normalize`` is pure; pandas keeps strings as
Python objects through Arrow, so UTF-8 bytes survive the round trip.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_cjk(text: str) -> str:
    """NFKC normalization + whitespace canonicalization (pure core)."""
    if text is None:
        return None
    out = unicodedata.normalize("NFKC", text)
    # canonicalize exotic unicode spaces to ASCII space (NFKC already maps
    # U+3000 ideographic space); collapse \r\n → \n for cross-platform bytes
    return out.replace("\r\n", "\n").replace("\r", "\n")


@F.pandas_udf(T.StringType())
def normalize_cjk_udf(texts: pd.Series) -> pd.Series:
    # pd.Series.map over the batch: one Arrow transfer per ~256 rows, the
    # per-string work is C-level inside unicodedata.
    return texts.map(lambda t: normalize_cjk(t) if t is not None else None)
