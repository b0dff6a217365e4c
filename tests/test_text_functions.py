"""Unit pins for the column functions whose oracle queries were retired in
round 7 (doc_preview, doc_file_stem, doc_chunk_estimate,
events_improvement_pct, doc_nonempty — VERDICT r6 #3): preview truncation
(F6, ref query.py:70-76), Path.stem extraction (X10, ref
processor.py:482-483), the chunks-per-book estimator (C6, ref
quantization_analysis.py:188-198), improvement % (A7, ref
embedding_evaluation.py:1008-1019), and the trim-nonempty filter (F1, ref
processor.py:381-383). One literal frame, hand-computed expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_japanese_books_spark.functions.text import file_stem, preview
from docling_japanese_books_spark.functions.vectors import improvement_pct
from docling_japanese_books_spark.operators.chunking import chunks_per_book


def test_preview_truncation(spark):
    rows = [
        (1, "short text"),
        (2, "line\none\r\ntwo"),
        (3, "x" * 100),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r.p for r in df.select("id", preview(F.col("text")).alias("p")).collect()}
    assert got[1] == "short text"
    assert got[2] == "line one  two"          # \n and \r each -> one space
    assert got[3] == "x" * 80 + "..."


def test_file_stem_matches_pathlib(spark):
    import pathlib

    paths = [
        "/corpus/web/doc_1.pdf",
        "/corpus/web/doc_2.tar.gz",   # Path.stem keeps .tar
        "/corpus/web/doc_3",
        "/corpus/web/doc_4.HTML",
        "relative/name.txt",
    ]
    df = spark.createDataFrame([(p,) for p in paths], "path string")
    got = {r.path: r.stem for r in df.select("path", file_stem(F.col("path")).alias("stem")).collect()}
    for p in paths:
        assert got[p] == pathlib.PurePosixPath(p).stem, p


def test_chunks_per_book_estimator(spark):
    # effective chunk = 500 * 0.9 = 450 chars
    df = spark.createDataFrame([(0,), (1,), (450,), (451,), (4500,)], "n long")
    got = [r.c for r in df.select(chunks_per_book(F.col("n")).alias("c")).orderBy("n").collect()]
    assert got == [0, 1, 1, 2, 10]


def test_improvement_pct_guards_nonpositive_baseline(spark):
    rows = [(1, 2.0, 3.0), (2, 0.0, 5.0), (3, -1.0, 5.0), (4, 4.0, 3.0)]
    df = spark.createDataFrame(rows, "id long, base double, score double")
    got = {
        r.id: r.pct
        for r in df.select(
            "id", improvement_pct(F.col("base"), F.col("score")).alias("pct")
        ).collect()
    }
    assert got[1] == 50.0
    assert got[2] == 0.0 and got[3] == 0.0  # a <= 0 guard
    assert got[4] == -25.0


def test_trim_nonempty_filter(spark):
    df = spark.createDataFrame(
        [(1, "text"), (2, "   "), (3, ""), (4, "\n\t"), (5, " x ")],
        "id long, text string",
    )
    kept = sorted(r.id for r in df.filter(F.trim(F.col("text")) != "").collect())
    # trim strips SPACES only (Spark and DuckDB agree) — "\n\t" stays
    assert kept == [1, 4, 5]
