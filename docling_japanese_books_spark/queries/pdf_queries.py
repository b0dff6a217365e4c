"""PDF layout-parse queries (north-rule operator, driver-checkable)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extraction.pdf import parse_pdf_udf
from .relational import query, t


@query(
    "pdf_layout_roundtrip",
    "SELECT doc_id, replace(text, ' ', chr(10)) AS extracted FROM documents",
)
def pdf_layout_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout-IR reading-order roundtrip: each document's words become
    positioned spans (one column, ascending y) serialized as layout-IR JSON
    entirely JVM-side; the parser must reconstruct exactly the words in
    order — oracle is a pure string transform of the source text."""
    docs = t(spark, sf_dir, "documents")
    # to_json escapes the payload, so quote/backslash characters in the
    # document text cannot break the synthesized layout-IR literal
    spans = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda w, i: F.to_json(
                F.struct(
                    F.lit(0).alias("x"),
                    (i * 30).alias("y"),
                    w.alias("text"),
                )
            ),
        ),
        ",",
    )
    ir = F.encode(
        F.concat(F.lit('{"pages":[{"spans":['), spans, F.lit("]}]}")), "utf-8"
    )
    return docs.select(
        "doc_id", parse_pdf_udf(ir).getField("text").alias("extracted")
    )


@query("pdf_layout_vertical")
def pdf_layout_vertical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertical-text reading order over synthesized two-column pages
    (rows-only; column semantics pinned by tests/test_pdf_layout.py)."""
    docs = t(spark, sf_dir, "documents").limit(100)
    # two vertical columns: first half of words in the right column (x=500),
    # second half in the left column (x=100) — reading order = original order
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    spans = F.array_join(
        F.transform(
            words,
            lambda w, i: F.to_json(
                F.struct(
                    F.lit(True).alias("vertical"),
                    F.when(i < n / 2, F.lit(500)).otherwise(F.lit(100)).alias("x"),
                    F.when(i < n / 2, i * 30)
                    .otherwise((i - n / 2) * 30)
                    .alias("y"),
                    w.alias("text"),
                )
            ),
        ),
        ",",
    )
    ir = F.encode(
        F.concat(F.lit('{"pages":[{"spans":['), spans, F.lit("]}]}")), "utf-8"
    )
    parsed = docs.select("doc_id", F.col("text"), parse_pdf_udf(ir).alias("e"))
    return parsed.select(
        "doc_id",
        (F.col("e.text") == F.replace(F.col("text"), F.lit(" "), F.lit("\n"))).alias(
            "order_preserved"
        ),
        F.col("e.n_spans").alias("n_spans"),
    )
