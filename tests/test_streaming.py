"""Streaming: incremental ingest processes only new files across restarts;
watermark windowing; re-crawl dedup."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from docling_japanese_books_spark.extraction.pages import generate_pages
from docling_japanese_books_spark.streaming.ingest import (
    dedup_recrawls,
    incremental_extract,
    windowed_event_metrics,
)


@pytest.fixture()
def dirs():
    base = tempfile.mkdtemp(prefix="stream_")
    yield {
        "in": f"{base}/in",
        "out": f"{base}/out",
        "ckpt": f"{base}/ckpt",
    }
    shutil.rmtree(base, ignore_errors=True)


def test_incremental_extract_exactly_once(spark, dirs):
    # batch 1 arrives
    generate_pages(spark, 100, seed=1).coalesce(2).write.mode("append").parquet(dirs["in"])
    incremental_extract(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    n1 = spark.read.parquet(dirs["out"]).count()
    assert n1 == 100

    # restart with NO new data: nothing reprocessed
    incremental_extract(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    assert spark.read.parquet(dirs["out"]).count() == 100

    # batch 2 arrives (different seed -> different urls)
    generate_pages(spark, 50, seed=2).coalesce(1).write.mode("append").parquet(dirs["in"])
    incremental_extract(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    out = spark.read.parquet(dirs["out"])
    # exactly-once: 150 rows total (reprocessing batch 1 would give 250);
    # urls may collide across seeds, so compare against the actual inputs
    assert out.count() == 150
    expected_keys = spark.read.parquet(dirs["in"]).select("url", "warc_ts").distinct().count()
    assert out.select("url", "warc_ts").distinct().count() == expected_keys


def test_windowed_event_metrics_batch_parity(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    agg = windowed_event_metrics(events).orderBy("window_start", "event_type")
    rows = agg.collect()
    assert rows
    # windows are epoch-aligned hours, counts sum to table size
    assert sum(r.n for r in rows) == events.count()
    assert all(r.window_start.minute == 0 and r.window_start.second == 0 for r in rows)


def test_dedup_recrawls_streaming(spark, dirs):
    import datetime as dt

    rows = [
        ("https://a/1", dt.datetime(2024, 1, 1, 0, 0), b"x", "", "en"),
        ("https://a/1", dt.datetime(2024, 1, 1, 0, 30), b"y", "", "en"),  # re-crawl
        ("https://a/2", dt.datetime(2024, 1, 1, 0, 10), b"z", "", "en"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    df.coalesce(1).write.mode("append").parquet(dirs["in"])

    stream = spark.readStream.schema(df.schema).parquet(dirs["in"])
    deduped = dedup_recrawls(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT url FROM dedup_out").collect()
    urls = sorted(r.url for r in got)
    assert urls == ["https://a/1", "https://a/2"]


def test_incremental_late_chunk_exactly_once(spark, dirs):
    from docling_japanese_books_spark.operators.late_chunking import (
        late_chunk_document,
    )
    from docling_japanese_books_spark.streaming.ingest import incremental_late_chunk

    docs1 = [(i, f"streaming document number {i} with several words") for i in range(20)]
    spark.createDataFrame(docs1, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(dirs["in"])
    incremental_late_chunk(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    out1 = spark.read.parquet(dirs["out"])
    n1 = out1.count()
    assert n1 > 0
    assert out1.filter(F.col("chunking_method") != "late").count() == 0

    # restart with no new data: nothing reprocessed
    incremental_late_chunk(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    assert spark.read.parquet(dirs["out"]).count() == n1

    # new batch appends only its own chunks
    docs2 = [(100 + i, f"late batch {i} of the stream") for i in range(5)]
    spark.createDataFrame(docs2, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(dirs["in"])
    incremental_late_chunk(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    out = spark.read.parquet(dirs["out"])
    extra = sum(
        len(late_chunk_document(t, max_chunk_length=200, method="words"))
        for _, t in docs2
    )
    assert out.count() == n1 + extra
    # streamed chunks match the batch operator byte-for-byte
    row = out.filter(F.col("doc_id") == 100).orderBy("chunk_index").collect()
    expect = late_chunk_document(docs2[0][1], max_chunk_length=200, method="words")
    assert [r.text for r in row] == [c["text"] for c in expect]
