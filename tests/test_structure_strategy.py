"""C4 structural chunker, C7 strategy map, S4 page cap, S9 image sink."""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from docling_japanese_books_spark.operators.structure import (
    chunk_by_structure,
    hierarchical_structure_chunks,
    parse_structure,
)
from docling_japanese_books_spark.operators.strategy import (
    chunk_with_strategy,
    determine_chunking_strategies,
    model_task,
    resolve_chunking_strategy,
)
from docling_japanese_books_spark.extraction.pdf import parse_pdf_layout, decode_pdf_real

HTML = (
    "<html><body>"
    "<h1>Book</h1>"
    "<p>intro paragraph text</p>"
    "<h2>Chapter One</h2>"
    "<p>first section body</p><p>more of the first section</p>"
    "<h3>Detail</h3>"
    "<p>nested detail text</p>"
    "<h2>Chapter Two</h2>"
    "<p>second chapter body</p>"
    "<script>var ignored = 1;</script>"
    "</body></html>"
)


# --- C4 -------------------------------------------------------------------


def test_parse_structure_items():
    items = parse_structure(HTML)
    assert ("heading", 1, "Book") in items
    assert ("heading", 2, "Chapter One") in items
    assert ("body", 0, "intro paragraph text") in items
    assert all("ignored" not in t for _, _, t in items)


def test_hierarchical_chunks_heading_paths_and_packing():
    chunks = hierarchical_structure_chunks(HTML, max_chunk_length=500)
    by_path = {c["heading_path"]: c for c in chunks}
    assert by_path["Book"]["body"] == "intro paragraph text"
    # two small blocks under the same section pack into one chunk
    assert (
        by_path["Book > Chapter One"]["body"]
        == "first section body more of the first section"
    )
    assert by_path["Book > Chapter One > Detail"]["body"] == "nested detail text"
    assert by_path["Book > Chapter Two"]["body"] == "second chapter body"
    # outline semantics: h2 after h3 truncates the deeper level
    assert by_path["Book > Chapter Two"]["level"] == 2
    # contextualized text = path + body
    c = by_path["Book > Chapter One"]
    assert c["text"] == "Book > Chapter One\n\n" + c["body"]
    # chunk_index is document order
    assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))


def test_hierarchical_chunks_packing_limit():
    html = "<h2>S</h2>" + "".join(f"<p>{'x' * 30}</p>" for _ in range(4))
    chunks = hierarchical_structure_chunks(html, max_chunk_length=70)
    # 30+1+30=61 fits, adding another 30 exceeds 70 -> 2 chunks of 2 blocks
    assert [len(c["body"]) for c in chunks] == [61, 61]
    assert all(c["heading_path"] == "S" for c in chunks)


def test_chunk_by_structure_spark(spark):
    df = spark.createDataFrame([(1, HTML), (2, ""), (3, "<p>plain</p>")],
                               "doc_id long, html string")
    rows = chunk_by_structure(df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 2 not in by_doc
    assert {r.heading_path for r in by_doc[1]} == {
        "Book", "Book > Chapter One", "Book > Chapter One > Detail",
        "Book > Chapter Two",
    }
    assert by_doc[3][0].heading_path == "" and by_doc[3][0].level == 0


# --- C7 -------------------------------------------------------------------


def test_strategy_map_matches_reference_rules():
    # ref vector_db.py:71-93
    assert determine_chunking_strategies("BAAI/bge-m3") == (
        "late", ["hybrid", "traditional"])
    assert determine_chunking_strategies("jinaai/jina-embeddings-v4") == (
        "hybrid", ["traditional"])
    assert determine_chunking_strategies(
        "Snowflake/snowflake-arctic-embed-l-v2.0") == ("traditional", ["hybrid"])
    assert determine_chunking_strategies("anything/else") == (
        "traditional", ["hybrid"])
    assert model_task("jinaai/jina-embeddings-v4") == "retrieval"
    assert model_task("BAAI/bge-m3") is None


def test_fallback_walk_and_exhaustion():
    def boom():
        raise RuntimeError("unavailable")

    made = []

    def ok():
        made.append(1)
        return lambda docs: docs

    fn, used = resolve_chunking_strategy(
        "BAAI/bge-m3", {"late": boom, "hybrid": boom, "traditional": ok}
    )
    assert used == "traditional" and made  # walked late -> hybrid -> traditional

    with pytest.raises(RuntimeError, match="All chunking strategies failed"):
        resolve_chunking_strategy("BAAI/bge-m3", {"late": boom})


def test_chunk_with_strategy_tags_method(spark):
    docs = spark.createDataFrame(
        [(1, "一つ目の文です。二つ目の文です。")], "doc_id long, text string"
    )
    out, used = chunk_with_strategy(docs, "BAAI/bge-m3", max_chunk_length=10)
    assert used == "late"
    assert out.select("chunking_method").distinct().collect()[0][0] == "late"

    out2, used2 = chunk_with_strategy(docs, "unknown-model", max_chunk_length=10)
    assert used2 == "traditional"
    assert out2.select("chunking_method").distinct().collect()[0][0] == "traditional"


# --- S4 -------------------------------------------------------------------


def _ir(n_pages: int) -> bytes:
    return json.dumps(
        {"pages": [{"spans": [{"x": 0, "y": 0, "text": f"p{i}"}]}
                   for i in range(n_pages)]}
    ).encode()


def test_page_cap_truncates_and_tags():
    full = parse_pdf_layout(_ir(5))
    assert full["status"] == "ok" and full["n_pages"] == 5

    capped = parse_pdf_layout(_ir(5), max_pages=3)
    assert capped["status"] == "truncated"
    assert capped["n_pages"] == 3 and capped["n_spans"] == 3
    assert capped["text"] == "p0\n\np1\n\np2"

    under = parse_pdf_layout(_ir(2), max_pages=3)
    assert under["status"] == "ok" and under["n_pages"] == 2

    # decoder-side pre-truncation flag is honored
    pre = json.dumps({"pages": [{"spans": [{"x": 0, "y": 0, "text": "a"}]}],
                      "truncated": True}).encode()
    assert parse_pdf_layout(pre)["status"] == "truncated"


def test_real_pdf_decode_rejects_garbage():
    # the pure-Python fallback decodes real PDFs (see test_pdf_bytes.py)
    # and raises on non-PDF bytes rather than silently returning something
    with pytest.raises(ValueError):
        decode_pdf_real(b"%PDF-1.4 fake")


# --- S9 -------------------------------------------------------------------


def test_write_image_files_sink(spark, tmp_path):
    from docling_japanese_books_spark.multimodal.images import write_image_files

    payloads = [(1, b"image-bytes-a"), (1, b"image-bytes-b"), (2, b"image-bytes-a")]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    out_dir = str(tmp_path / "imgs")
    manifest = {r.doc_id: r for r in write_image_files(df, out_dir).collect()}

    # files are content-addressed: 2 distinct payloads -> 2 files
    files = sorted(Path(out_dir).glob("*.png"))
    assert len(files) == 2
    for p in files:
        data = p.read_bytes()
        assert p.stem == hashlib.sha256(data).hexdigest()

    assert manifest[1].n_images == 2
    assert manifest[2].n_images == 1
    assert manifest[2].image_hashes == [hashlib.sha256(b"image-bytes-a").hexdigest()]
    assert manifest[1].total_bytes == len(b"image-bytes-a") + len(b"image-bytes-b")


def test_hybrid_tag_matches_strategy_used(spark):
    docs = spark.createDataFrame(
        [(1, "一つ目の文です。二つ目の文です。")], "doc_id long, text string"
    )
    out, used = chunk_with_strategy(docs, "jinaai/jina-embeddings-v4")
    assert used == "hybrid"
    assert out.select("chunking_method").distinct().collect()[0][0] == "hybrid"
