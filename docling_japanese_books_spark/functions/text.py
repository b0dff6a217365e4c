"""Text/scalar column functions (reference §2.3): pure Spark SQL expressions.

Everything here is JVM-side (regexp/arith, whole-stage codegen) — no UDFs.
Semantics pinned to the reference:

- X4 script counting, X5 cultural indicators, X6 japanese-confidence score:
  ``image_processor.py:255-305``;
- X7 keyword indicators / X8 layout orientation: ``image_processor.py:338-371``;
- F6 preview truncation: ``query.py:70-76``;
- X10 filename stem: ``processor.py:482-483``;
- X1 sha256 hex: ``image_processor.py:113-116``;
- X2 base64 data-URI decode: ``image_processor.py:165-171``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Unicode ranges exactly as the reference regexes (image_processor.py:267-270)
HIRAGANA = r"[぀-ゟ]"
KATAKANA = r"[゠-ヿ]"
KANJI = r"[一-龯]"

# (pattern, description) pairs — image_processor.py:274-281
JAPANESE_INDICATOR_PATTERNS = [
    (r"(?:san|chan|kun|sama)", "Japanese honorifics"),
    (r"(?:sushi|ramen|tempura|yakitori)", "Japanese food terms"),
    (r"(?:kimono|yukata|obi)", "Japanese clothing"),
    (r"(?:temple|shrine|torii|pagoda)", "Japanese architecture"),
    (r"(?:sakura|cherry blossom)", "Japanese nature"),
    (r"(?:manga|anime)", "Japanese media"),
]

LAYOUT_INDICATORS = ["vertical", "horizontal", "縦書き", "横書き", "right-to-left"]


def count_matches(col: Column, pattern: str) -> Column:
    """X4: number of regex matches in a string (len(re.findall(...)))."""
    return F.coalesce(F.regexp_count(col, F.lit(pattern)), F.lit(0))


def japanese_char_count(col: Column) -> Column:
    return (
        count_matches(col, HIRAGANA)
        + count_matches(col, KATAKANA)
        + count_matches(col, KANJI)
    )


def indicator_count(col: Column) -> Column:
    """X5: how many of the 6 cultural-indicator patterns match (case-insens)."""
    out = F.lit(0)
    for pattern, _desc in JAPANESE_INDICATOR_PATTERNS:
        out = out + F.when(col.rlike(f"(?i){pattern}"), 1).otherwise(0)
    return out


def japanese_confidence(col: Column) -> Column:
    """X6: 0.7*script_ratio + 0.3*min(0.2*indicators, 1)
    (ref image_processor.py:286-293)."""
    total = F.length(col)
    script_conf = F.when(total > 0, japanese_char_count(col) / total).otherwise(0.0)
    indic_conf = F.least(indicator_count(col).cast("double") * 0.2, F.lit(1.0))
    return script_conf * 0.7 + indic_conf * 0.3


def has_japanese(col: Column) -> Column:
    """X6: confidence > 0.3 threshold (ref image_processor.py:295)."""
    return japanese_confidence(col) > 0.3


def layout_cues(col: Column) -> Column:
    """X8: any layout-orientation substring in lowercased text
    (ref image_processor.py:361-371)."""
    lowered = F.lower(col)
    out = F.lit(False)
    for ind in LAYOUT_INDICATORS:
        out = out | lowered.contains(ind)
    return out


def preview(col: Column, n: int = 80) -> Column:
    """F6: text[:n] + '...', newlines→space (ref query.py:70-76)."""
    cleaned = F.regexp_replace(col, r"[\n\r]", " ")
    return F.when(
        F.length(cleaned) > n,
        F.concat(F.substring(cleaned, 1, n), F.lit("...")),
    ).otherwise(cleaned)


def file_stem(path: Column) -> Column:
    """X10: Path(...).stem (ref processor.py:482-483)."""
    return F.regexp_extract(path, r"([^/]+?)(?:\.[^./]*)?$", 1)


def sha256_hex(col: Column) -> Column:
    """X1: sha256 hex digest of binary/string content
    (ref image_processor.py:113-116)."""
    return F.sha2(col, 256)


def data_uri_payload(uri: Column) -> Column:
    """X2: decode base64 payload of a data: URI (ref image_processor.py:165-171)."""
    return F.unbase64(F.regexp_extract(uri, r",(.*)$", 1))
