"""File discovery source (S1-S3), salted aggregation, enrichment join."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from docling_japanese_books_spark.operators.salting import host_of, salted_agg
from docling_japanese_books_spark.sources.files import (
    discover_files,
    extension_histogram,
)


@pytest.fixture()
def file_tree():
    d = Path(tempfile.mkdtemp(prefix="files_"))
    (d / "sub").mkdir()
    (d / "a.pdf").write_bytes(b"%PDF fake")
    (d / "b.html").write_bytes(b"<p>hi</p>")
    (d / "sub" / "c.txt").write_bytes(b"text")
    (d / "sub" / "d.exe").write_bytes(b"nope")  # unsupported ext
    (d / "big.pdf").write_bytes(b"x" * 2048)  # oversize for 1KB limit
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_discover_files_filters(spark, file_tree):
    files = discover_files(spark, str(file_tree), max_size_mb=1)
    paths = {Path(r.path).name for r in files.select("path").collect()}
    assert paths == {"a.pdf", "b.html", "c.txt", "big.pdf"}  # exe excluded, recursive

    # size predicate (1 KB limit via fractional mb is not supported; use bytes)
    small = discover_files(spark, str(file_tree)).filter(F.col("length") <= 1024)
    names = {Path(r.path).name for r in small.select("path").collect()}
    assert "big.pdf" not in names


def test_extension_histogram(spark, file_tree):
    files = discover_files(spark, str(file_tree))
    hist = {r.ext: r.n for r in extension_histogram(files).collect()}
    assert hist == {"pdf": 2, "html": 1, "txt": 1}


def test_salted_agg_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    salted = salted_agg(
        li,
        key="l_suppkey",
        aggs={
            "n": ("count", "l_orderkey"),
            "total_qty": ("sum", "l_quantity"),
            "avg_qty": ("avg", "l_quantity"),
            "max_price": ("max", "l_extendedprice"),
        },
        fine_col="l_orderkey",
        n_salt=8,
    )
    plain = li.groupBy("l_suppkey").agg(
        F.count("l_orderkey").alias("n"),
        F.sum("l_quantity").alias("total_qty"),
        F.avg("l_quantity").alias("avg_qty"),
        F.max("l_extendedprice").alias("max_price"),
    )
    s = {r.l_suppkey: (r.n, round(r.total_qty, 6), round(r.avg_qty, 9), r.max_price)
         for r in salted.collect()}
    p = {r.l_suppkey: (r.n, round(r.total_qty, 6), round(r.avg_qty, 9), r.max_price)
         for r in plain.collect()}
    assert s == p


def test_salted_plan_has_two_aggregation_phases(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = salted_agg(
        li, "l_suppkey", {"n": ("count", "l_orderkey")}, "l_orderkey", 8
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 4  # partial+final for both phases


def test_host_of(spark):
    df = spark.createDataFrame(
        [("https://host03.example.com/p/1",), ("http://x.y/z",)], "url string"
    )
    out = [r.h for r in df.select(host_of(F.col("url")).alias("h")).collect()]
    assert out == ["host03.example.com", "x.y"]


def test_enrichment_unmatched_ref_and_no_refs(spark):
    from docling_japanese_books_spark.operators.enrichment import (
        enrich_chunks_with_images,
    )

    chunks = spark.createDataFrame(
        [
            (1, 0, "text one", ["ref/ok", "ref/missing"]),
            (2, 0, "text two", []),
            (3, 0, "text three", None),
        ],
        "doc_id long, chunk_index int, text string, refs array<string>",
    )
    images = spark.createDataFrame(
        [("ref/ok", "HASH", "cap", ["anno"])],
        "self_ref string, hash string, caption string, annotations array<string>",
    )
    out = {r.doc_id: r.enriched_text
           for r in enrich_chunks_with_images(chunks, images).collect()}
    assert out[1] == "text one\n[Image: HASH.png - cap]\n  - anno"
    assert out[2] == "text two"  # no refs -> untouched
    assert out[3] == "text three"  # null refs -> untouched
