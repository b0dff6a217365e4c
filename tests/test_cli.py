"""CLI lifecycles (E1 process, E2 search, E3 evaluate) end to end."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from docling_japanese_books_spark.__main__ import main
from docling_japanese_books_spark.extraction.pages import generate_pages


@pytest.fixture(scope="module")
def pages_parquet(spark):
    d = tempfile.mkdtemp(prefix="cli_")
    path = f"{d}/pages"
    generate_pages(spark, 150, seed=42).coalesce(2).write.parquet(path)
    yield d, path
    shutil.rmtree(d, ignore_errors=True)


def test_process_then_search(spark, pages_parquet, capsys):
    d, path = pages_parquet
    rc = main(["process", path, "-o", f"{d}/out", "--buckets", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "processed buckets=4" in out and "rows_out=150" in out

    rc = main(["search", "data spark table", "-i", f"{d}/out/data", "-l", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("\n") >= 3 and "1. [" in out

    # resume path: second process run skips everything
    rc = main(["process", path, "-o", f"{d}/out", "--buckets", "4"])
    out = capsys.readouterr().out
    assert "processed buckets=0 skipped=4" in out


def test_process_dry_run(spark, pages_parquet, capsys):
    d, path = pages_parquet
    rc = main(["process", path, "-o", f"{d}/ignored", "--dry-run"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "dry run: 150 pages" in out
    assert out.count("https://") == 10  # first-10 listing like ref cli.py:103-106


def test_evaluate(spark, capsys):
    rc = main(["evaluate", "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "strategy" in out and "words_200" in out


def test_stats(spark, capsys, tmp_path):
    (tmp_path / "x.pdf").write_bytes(b"a")
    (tmp_path / "y.txt").write_bytes(b"b")
    rc = main(["stats", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "pdf: 1" in out and "txt: 1" in out


def test_json_export_sink_roundtrip(spark, tmp_path):
    """S6 JSON export (ref processor.py:437-439) + S8 JSONL: chunks written
    as real JSON lines read back losslessly."""
    from docling_japanese_books_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "eins zwei drei")],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, method="words", max_chunk_length=12)
    out = str(tmp_path / "chunks_json")
    chunks.write.mode("overwrite").json(out)
    back = spark.read.json(out)
    assert back.count() == chunks.count()
    orig = {(r.doc_id, r.chunk_index): r.text for r in chunks.collect()}
    got = {(r.doc_id, r.chunk_index): r.text for r in back.collect()}
    assert orig == got


def test_chunk_command(spark, tmp_path, capsys):
    from docling_japanese_books_spark.__main__ import main

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "最初の文です。二番目の文です。三番目の文です。")],
        "doc_id long, text string",
    ).write.parquet(src)
    out = str(tmp_path / "chunks")
    assert main(["chunk", src, "-o", out, "-m", "BAAI/bge-m3",
                 "--max-chunk-length", "15"]) == 0
    printed = capsys.readouterr().out
    assert "strategy=late" in printed
    rows = spark.read.parquet(out).collect()
    assert rows and all(r.chunking_method == "late" for r in rows)

    out2 = str(tmp_path / "chunks2")
    assert main(["chunk", src, "-o", out2, "-m", "Snowflake/arctic"]) == 0
    assert "strategy=traditional" in capsys.readouterr().out
