"""DOCX/PPTX extraction queries (driver-checkable, oracle-predicted).

Closes the last accepted-but-unparseable format gap (round-4 verdict #1):
``sources/files.py`` admits ``.docx``/``.pptx`` mirroring the reference's
supported list (ref config.py:52-66), and the reference converts them via
Docling (ref processor.py:285-319); these queries run REAL OOXML packages
through the pure-Python writers/decoders in ``extraction/ooxml.py`` under
the correctness gate, with the oracle predicting block counts
analytically from the synthesis geometry (so a decode defect cannot
cancel against the writer).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .relational import query, t, tfan

_ROUNDTRIP_SCHEMA = T.StructType(
    [
        T.StructField("status", T.StringType(), False),
        T.StructField("text_match", T.BooleanType(), False),
        T.StructField("n_blocks", T.IntegerType(), False),
        T.StructField("n_paragraphs", T.IntegerType(), False),
    ]
)

DOCX_PARA_WORDS = 5  # roundtrip geometry: 5 words per paragraph
PPTX_PARA_WORDS = 4  # 4 words per paragraph, 2 paragraphs per slide
PPTX_PARAS_PER_SLIDE = 2


@F.pandas_udf(_ROUNDTRIP_SCHEMA)
def _docx_roundtrip_udf(text: pd.Series) -> pd.DataFrame:
    from ..extraction.ooxml import paragraphs_to_docx, parse_docx

    def one(t: str) -> dict:
        words = " ".join((t or "").split()).split(" ")
        paras = [
            " ".join(words[i : i + DOCX_PARA_WORDS])
            for i in range(0, len(words), DOCX_PARA_WORDS)
        ]
        e = parse_docx(paragraphs_to_docx(paras))
        return dict(
            status=e["status"],
            text_match=e["text"] == "\n".join(paras),
            n_blocks=e["n_blocks"],
            n_paragraphs=e["n_paragraphs"],
        )

    return pd.DataFrame([one(x) for x in text])


@query(
    "docx_real_roundtrip",
    r"""
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS t
      FROM documents)
    SELECT doc_id, 'ok' AS status, true AS text_match,
           CAST(ceil(len(string_split(t, ' ')) / 5.0) AS INT) AS n_paragraphs
    FROM norm WHERE length(t) > 0
    """,
)
def docx_real_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL DOCX packages through the engine: each document's text becomes
    a standards-shaped OOXML zip (one w:p per 5 words, runs split every 3
    words so the decoder must concatenate runs) built in-plan, then decoded
    back through the pure-Python zip+XML parser. text_match asserts the
    exact roundtrip; the oracle independently predicts the paragraph count
    from the synthesis geometry. Ref parity: processor.py:285-319 converts
    .docx via Docling; config.py:52-66 lists the accepted suffixes."""
    docs = tfan(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace("text", r"\s+", " "))
    parsed = (
        docs.select("doc_id", norm.alias("text"))
        .filter(F.length("text") > 0)
        .select("doc_id", _docx_roundtrip_udf(F.col("text")).alias("e"))
    )
    return parsed.select(
        "doc_id",
        F.col("e.status").alias("status"),
        F.col("e.text_match").alias("text_match"),
        F.col("e.n_paragraphs").alias("n_paragraphs"),
    )


@F.pandas_udf(_ROUNDTRIP_SCHEMA)
def _pptx_roundtrip_udf(text: pd.Series) -> pd.DataFrame:
    from ..extraction.ooxml import parse_pptx, slides_to_pptx

    def one(t: str) -> dict:
        words = " ".join((t or "").split()).split(" ")
        paras = [
            " ".join(words[i : i + PPTX_PARA_WORDS])
            for i in range(0, len(words), PPTX_PARA_WORDS)
        ]
        slides = [
            paras[i : i + PPTX_PARAS_PER_SLIDE]
            for i in range(0, len(paras), PPTX_PARAS_PER_SLIDE)
        ]
        e = parse_pptx(slides_to_pptx(slides))
        expected = "\n\n".join("\n".join(s) for s in slides)
        return dict(
            status=e["status"],
            text_match=e["text"] == expected,
            n_blocks=e["n_blocks"],
            n_paragraphs=e["n_paragraphs"],
        )

    return pd.DataFrame([one(x) for x in text])


@query(
    "pptx_real_roundtrip",
    r"""
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS t
      FROM documents)
    SELECT doc_id, 'ok' AS status, true AS text_match,
           CAST(ceil(ceil(len(string_split(t, ' ')) / 4.0) / 2.0) AS INT)
             AS n_slides,
           CAST(ceil(len(string_split(t, ' ')) / 4.0) AS INT) AS n_paragraphs
    FROM norm WHERE length(t) > 0
    """,
)
def pptx_real_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PPTX packages: text becomes slides (2 paragraphs each, 4 words
    per paragraph) in a multi-part OOXML zip (presentation + per-slide
    parts + relationships), decoded back in numeric slide order. The
    oracle predicts slide/paragraph counts from the geometry; text_match
    asserts the exact roundtrip including slide ordering."""
    docs = tfan(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace("text", r"\s+", " "))
    parsed = (
        docs.select("doc_id", norm.alias("text"))
        .filter(F.length("text") > 0)
        .select("doc_id", _pptx_roundtrip_udf(F.col("text")).alias("e"))
    )
    return parsed.select(
        "doc_id",
        F.col("e.status").alias("status"),
        F.col("e.text_match").alias("text_match"),
        F.col("e.n_blocks").alias("n_slides"),
        F.col("e.n_paragraphs").alias("n_paragraphs"),
    )
