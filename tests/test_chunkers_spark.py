"""Spark-side chunker parity: the exploded chunks DataFrame must carry the
same bytes as the pure-Python core, per document (the byte-identical
per-url invariant, applied through Arrow round-trips)."""

from __future__ import annotations

import json
from pathlib import Path

from docling_japanese_books_spark.operators.chunking import (
    chunk_documents,
    hierarchical_chunking,
    simple_sentence_chunker,
)

FIXTURES = json.loads(
    (Path(__file__).parent / "fixtures" / "chunker_goldens.json").read_text()
)


def test_spark_chunks_match_pure_python(spark):
    docs = [(i, text) for i, text in enumerate(FIXTURES["inputs"].values())]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = chunk_documents(df, method="simple", max_chunk_length=400)
    rows = out.orderBy("doc_id", "chunk_index").collect()

    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)

    for doc_id, text in docs:
        expected_chunks, expected_spans = simple_sentence_chunker(text, 400)
        got = by_doc.get(doc_id, [])
        assert [r.text for r in got] == expected_chunks
        assert [(r.start, r.end) for r in got] == [tuple(s) for s in expected_spans]
        assert [r.chunk_index for r in got] == list(range(len(expected_chunks)))


def test_spark_chunks_on_fixture_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = chunk_documents(docs, method="simple", max_chunk_length=500)
    n_docs = docs.count()
    stats = out.groupBy().count().collect()[0]
    assert stats["count"] >= n_docs  # every non-empty doc yields >=1 chunk


def test_hierarchical_chunking_tags(spark):
    df = spark.createDataFrame(
        [(1, "短い文。次の文！三つ目？" * 30)], "doc_id long, text string"
    )
    out = hierarchical_chunking(df)
    grans = {r.granularity for r in out.select("granularity").distinct().collect()}
    assert grans == {"small", "medium", "large"}
    sample = out.filter("granularity = 'small'").first()
    assert sample.text.startswith("[SMALL-0] ")
