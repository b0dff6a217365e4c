"""C4: hierarchical document-structure chunking (+ heading-path context).

The reference chunks by Docling's document tree via
``HierarchicalChunker()`` (``processor.py:86-98``) and materializes one
chunk per structural item at ``processor.py:511,516``, enriching each chunk
with its place in the document hierarchy. Docling's tree comes from PDF
layout models; our honest equivalent builds the tree from extracted HTML
structure: headings (h1..h6) define the section hierarchy, and every
content block is chunked WITHIN its section, carrying the full heading
path as context (the docling chunker's "contextualize" behavior).

Semantics:

- a heading of level L replaces the path at depth L and truncates deeper
  levels (standard outline semantics);
- consecutive content blocks under the same heading path are greedy-packed
  into chunks of at most ``max_chunk_length`` chars (single blocks longer
  than the limit stay whole — never split mid-block);
- chunk text is ``"H1 > H2 > ..." + "\\n\\n" + body`` when a path exists;
- output records carry (chunk_index, heading_path, level, text, body).

Spark surface: Arrow-batched pandas UDF -> posexplode_outer (the same
UDF-once plan shape as chunking.py — pinned by tests/test_plans.py for the
other chunkers).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HEADINGS = {f"h{i}": i for i in range(1, 7)}
_BLOCK_TAGS = set(
    "p div li td th pre blockquote article section header footer br tr ul ol table".split()
) | set(_HEADINGS)
_DROP_TAGS = {"script", "style", "noscript", "template"}


class _StructureParser(HTMLParser):
    """Flat (kind, level, text) block stream: kind is 'heading' or 'body'."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.items: List[Tuple[str, int, str]] = []
        self._buf: List[str] = []
        self._heading_level: Optional[int] = None
        self._drop_depth = 0

    def _flush(self) -> None:
        text = " ".join("".join(self._buf).split())
        if text:
            if self._heading_level is not None:
                self.items.append(("heading", self._heading_level, text))
            else:
                self.items.append(("body", 0, text))
        self._buf = []

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_TAGS:
            self._drop_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            self._heading_level = _HEADINGS.get(tag)

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag in _HEADINGS:
                self._heading_level = None

    def handle_data(self, data):
        if self._drop_depth == 0:
            self._buf.append(data)

    def close(self):
        super().close()
        self._flush()


def parse_structure(html: str) -> List[Tuple[str, int, str]]:
    """HTML -> flat (kind, level, text) items in document order."""
    p = _StructureParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return p.items


def hierarchical_structure_chunks(
    html: str, max_chunk_length: int = 500
) -> List[dict]:
    """One record per structural chunk: heading-path context + packed body.

    Mirrors HierarchicalChunker's contextualized output (one chunk per
    structural item, heading metadata attached) with greedy same-section
    packing bounded by ``max_chunk_length``."""
    items = parse_structure(html or "")
    path: List[str] = []  # heading text by depth (index 0 = h1)
    chunks: List[dict] = []
    buf: List[str] = []
    buf_path: List[str] = []

    def flush() -> None:
        if not buf:
            return
        body = " ".join(buf)
        heading_path = " > ".join(buf_path)
        text = f"{heading_path}\n\n{body}" if heading_path else body
        chunks.append(
            dict(
                chunk_index=len(chunks),
                heading_path=heading_path,
                level=len(buf_path),
                body=body,
                text=text,
            )
        )
        buf.clear()

    for kind, level, text in items:
        if kind == "heading":
            flush()
            del path[level - 1 :]  # truncate deeper + same level
            path.extend([""] * (level - 1 - len(path)))  # pad skipped levels
            path.append(text)
            buf_path = [p for p in path if p]
        else:
            candidate = len(" ".join(buf)) + (1 if buf else 0) + len(text)
            if buf and candidate > max_chunk_length:
                flush()
            buf.append(text)
    flush()
    return chunks


STRUCT_CHUNK_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("chunk_index", T.IntegerType(), False),
            T.StructField("heading_path", T.StringType(), False),
            T.StructField("level", T.IntegerType(), False),
            T.StructField("body", T.StringType(), False),
            T.StructField("text", T.StringType(), False),
        ]
    )
)


def structure_chunk_udf(max_chunk_length: int = 500):
    @F.pandas_udf(STRUCT_CHUNK_SCHEMA)
    def _chunk(htmls: pd.Series) -> pd.Series:
        return htmls.map(
            lambda h: [
                (
                    c["chunk_index"],
                    c["heading_path"],
                    c["level"],
                    c["body"],
                    c["text"],
                )
                for c in hierarchical_structure_chunks(h or "", max_chunk_length)
            ]
        )

    return _chunk


def chunk_by_structure(
    docs: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    max_chunk_length: int = 500,
) -> DataFrame:
    """Documents (HTML) -> one row per structural chunk.

    posexplode_outer + IS NOT NULL keeps the UDF evaluated exactly once
    (plain posexplode makes Catalyst clone it into a size() pre-filter)."""
    udf = structure_chunk_udf(max_chunk_length)
    return (
        docs.select(id_col, udf(F.col(html_col)).alias("chunks"))
        .select(id_col, F.explode_outer("chunks").alias("chunk"))
        .filter(F.col("chunk").isNotNull())
        .select(
            id_col,
            F.col("chunk.chunk_index").alias("chunk_index"),
            F.col("chunk.heading_path").alias("heading_path"),
            F.col("chunk.level").alias("level"),
            F.col("chunk.body").alias("body"),
            F.col("chunk.text").alias("text"),
        )
    )
