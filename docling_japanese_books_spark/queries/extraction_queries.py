"""Extraction queries (north-rule pipeline), driver-checkable.

``extract_roundtrip`` is the oracle-checkable correctness anchor: wrap each
document's text in a boilerplate-laden HTML template **inside the plan**
(JVM-side concat), run the boilerplate stripper, and require the extracted
text to equal the original — i.e. the oracle is simply ``SELECT doc_id,
text FROM documents``. A wrong keep/drop decision or any byte drift through
the Arrow boundary fails the hash compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extraction.html import extract_pages, extract_udf
from ..extraction.pages import generate_pages
from .relational import query, t

# boilerplate template around the payload — nav/ads/footer must be stripped
_PRE = (
    "<html><head><style>.x{color:red}</style><script>var q=1;</script></head>"
    "<body><nav><a href='/a'>one</a> <a href='/b'>two</a> <a href='/c'>three</a></nav>"
    "<header><div>site header chrome</div></header><article><p>"
)
_POST = (
    "</p></article><div class='ads'><a href='/ad1'>buy now buy now</a>"
    "<a href='/ad2'>click here click here</a></div>"
    "<footer><div>copyright <a href='/tos'>terms</a></div></footer></body></html>"
)


@query(
    "extract_roundtrip",
    "SELECT doc_id, text AS extracted FROM documents",
)
def extract_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate strip recovers the payload byte-for-byte (north rule)."""
    docs = t(spark, sf_dir, "documents")
    html = F.encode(F.concat(F.lit(_PRE), F.col("text"), F.lit(_POST)), "utf-8")
    return docs.select(
        "doc_id", extract_udf(html).getField("text").alias("extracted")
    )


@query(
    "extract_metrics",
    """
    SELECT 'ok' AS status, count(*) AS n, CAST(1 AS INT) AS blocks_kept
    FROM documents
    """,
)
def extract_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16 extraction metrics: status histogram + kept-block count. On the
    template corpus every row extracts 'ok' with exactly 1 kept block."""
    docs = t(spark, sf_dir, "documents")
    html = F.encode(F.concat(F.lit(_PRE), F.col("text"), F.lit(_POST)), "utf-8")
    ext = docs.select(extract_udf(html).alias("e"))
    return (
        ext.groupBy(F.col("e.status").alias("status"))
        .agg(
            F.count("*").alias("n"),
            F.max("e.blocks_kept").alias("blocks_kept"),
        )
    )


@query("extract_pages_pipeline")
def extract_pages_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full north-rule pipeline over the synthetic pages corpus: generate
    (deterministic, distributed) -> extract -> per-status metrics.
    Rows-only check (pages is generated, not a fixture view), but the
    byte-identity of this pipeline is pinned by tests/test_extraction.py."""
    pages = generate_pages(spark, 2000, seed=42)
    extracted = extract_pages(pages)
    return (
        extracted.select(
            "url",
            "lang",
            F.col("extracted.status").alias("status"),
            F.col("extracted.blocks_kept").alias("blocks_kept"),
            F.col("extracted.blocks_dropped").alias("blocks_dropped"),
            (F.col("extracted.text") == F.col("text")).alias("byte_identical"),
        )
        .groupBy("lang", "status")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("byte_identical").cast("int")).alias("n_byte_identical"),
            F.sum("blocks_kept").alias("total_blocks_kept"),
            F.sum("blocks_dropped").alias("total_blocks_dropped"),
        )
    )
