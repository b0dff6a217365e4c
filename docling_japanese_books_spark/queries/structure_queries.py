"""C4 structure-aware chunking query (driver-checkable).

The documents fixture is plain text, so sectioned HTML is synthesized
INSIDE the plan (JVM-side concat, same pattern as extract_roundtrip): each
document's words are split into three <h2> sections under one <h1>. The
REAL operator (``operators/structure.py``) parses the HTML back into the
heading tree and emits contextualized chunks; the oracle reproduces the
expected heading paths and section bodies with pure string arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.structure import chunk_by_structure
from .relational import query, t, tfan

_N_SECTIONS = 3


@query(
    "chunk_structural",
    f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    secs AS (
      SELECT doc_id, k,
             array_to_string(
               words[CAST(floor(k * len(words) / {_N_SECTIONS}.0) AS BIGINT) + 1 :
                     CAST(floor((k + 1) * len(words) / {_N_SECTIONS}.0) AS BIGINT)],
               ' ') AS body
      FROM d CROSS JOIN (SELECT unnest(range(0, {_N_SECTIONS})) AS k) ks),
    nz AS (SELECT doc_id, k, body FROM secs WHERE body <> '')
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY k) - 1 AS INT)
             AS chunk_index,
           'Title > Part ' || CAST(k AS VARCHAR) AS heading_path,
           CAST(2 AS INT) AS level,
           body
    FROM nz
    """,
)
def chunk_structural(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 hierarchical structure chunking (ref processor.py:86-98,511:
    HierarchicalChunker over the document tree): heading-tree parse of
    synthesized sectioned HTML -> contextualized chunks with heading paths."""
    docs = tfan(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n = F.size(words)

    def section_body(k: int):
        start = F.floor(F.lit(k) * n / _N_SECTIONS).cast("int")
        end = F.floor(F.lit(k + 1) * n / _N_SECTIONS).cast("int")
        return F.array_join(F.slice(words, start + 1, end - start), " ")

    html_col = F.concat(
        F.lit("<html><body><h1>Title</h1>"),
        *[
            F.concat(
                F.lit(f"<h2>Part {k}</h2><p>"),
                section_body(k),
                F.lit("</p>"),
            )
            for k in range(_N_SECTIONS)
        ],
        F.lit("</body></html>"),
    )
    chunked = chunk_by_structure(
        docs.select("doc_id", html_col.alias("html")),
        html_col="html",
        max_chunk_length=1_000_000,  # one chunk per section: pack nothing apart
    )
    return chunked.select(
        "doc_id", "chunk_index", "heading_path", "level", "body"
    )
