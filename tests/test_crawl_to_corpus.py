"""The COMPOSED pipeline: one test driving the whole Common-Crawl-style
ingest story end to end, the way a user of this engine would —

    CDX index (filter by host/status)
      -> WARC byte-range fetch (HTTP-header charsets, legacy JP encodings)
      -> charset-aware boilerplate extraction
      -> decontamination vs a benchmark set
      -> cross-document paragraph dedup
      -> resumable bucketed pipeline write with snapshot lineage

Each stage has its own unit/oracle coverage; this test pins that the
INTERFACES compose (column names, hint threading, schema evolution) and
that the end state is exactly the expected curated corpus.
"""

from __future__ import annotations

import datetime as dt
import gzip
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from docling_japanese_books_spark.extraction.html import extract_pages
from docling_japanese_books_spark.operators.decontaminate import flag_contaminated
from docling_japanese_books_spark.operators.dedup import dedup_paragraphs
from docling_japanese_books_spark.pipeline.driver import (
    read_manifest,
    read_snapshot,
    run_extraction_pipeline,
)
from docling_japanese_books_spark.sources.cdx import build_cdxj_line, read_cdxj
from docling_japanese_books_spark.sources.warc import build_warc_record, parse_warc

BANNER = "このサイトはクッキーを使用しています 同意して続行してください"
BENCH_SENTENCE = "the quick brown fox jumps over the lazy dog benchmark sentence"


def _page(i: int) -> str:
    body = (
        f"文書{i}の本文です。これは充分に長い本文の段落であり、"
        f"ボイラープレートではありません。内容は文書ごとに異なります（{i}）。"
    )
    leak = f"<p>{BENCH_SENTENCE}</p>" if i == 7 else ""
    return (
        "<html><body>"
        f"<p>{BANNER}</p>"
        f"<p>{body}{body}</p>"
        f"{leak}"
        "</body></html>"
    )


@pytest.fixture()
def out_dir():
    d = tempfile.mkdtemp(prefix="crawl2corpus_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_crawl_to_corpus(spark, tmp_path, out_dir):
    # -- 1. a synthetic crawl: 12 pages across 2 hosts, mixed encodings,
    #       charset declared ONLY in the HTTP header
    codecs = ["utf-8", "shift_jis", "euc_jp"]
    records = []
    for i in range(12):
        host = "keep.example.jp" if i % 2 == 0 else "skip.example.org"
        codec = codecs[i % 3]
        records.append(
            (
                f"https://{host}/doc/{i}",
                dt.datetime(2024, 5, 1, 0, 0, i),
                _page(i).encode(codec),
                codec,
            )
        )
    members = [
        gzip.compress(
            build_warc_record(u, ts, html, content_type=f"text/html; charset={c}")
        )
        for u, ts, html, c in records
    ]
    archive = b"".join(members)
    offsets = [sum(len(m) for m in members[:k]) for k in range(len(members))]
    (tmp_path / "crawl.warc.gz").write_bytes(archive)
    idx = "\n".join(
        build_cdxj_line(
            records[i][0],
            records[i][1].strftime("%Y%m%d%H%M%S"),
            "crawl.warc.gz",
            offsets[i],
            len(members[i]),
        )
        for i in range(12)
    )
    (tmp_path / "crawl.cdxj").write_text(idx)

    # -- 2. index-first selection: only the JP host's captures
    wanted = (
        read_cdxj(spark, str(tmp_path / "crawl.cdxj"))
        .filter(F.col("host") == "keep.example.jp")
        .select("url", "warc_offset", "warc_length")
        .collect()
    )
    assert len(wanted) == 6
    # fetch exactly the selected byte ranges, re-wrap as a pages frame
    rows = []
    for r in wanted:
        chunk = archive[r.warc_offset : r.warc_offset + r.warc_length]
        rows.extend(parse_warc(chunk))
    assert len(rows) == 6
    pages = spark.createDataFrame(
        [
            (d["url"], d["warc_ts"], d["html"], d["text"], d["lang"], d["charset_hint"])
            for d in rows
        ],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, charset_hint string",
    )
    assert {r.charset_hint for r in pages.select("charset_hint").collect()} == {
        "utf-8", "shift_jis", "euc_jp",
    }

    # -- 3. charset-aware extraction (header hint threads through)
    extracted = extract_pages(pages, charset_col="charset_hint").select(
        "url",
        F.col("extracted.text").alias("text"),
        F.col("extracted.status").alias("status"),
        F.col("extracted.encoding").alias("encoding"),
    )
    got = {r.url: r for r in extracted.collect()}
    assert all(r.status == "ok" for r in got.values())
    assert {r.encoding for r in got.values()} == {"utf-8", "shift_jis", "euc_jp"}

    # -- 4. decontamination: the page embedding the benchmark sentence flags
    bench = spark.createDataFrame([(BENCH_SENTENCE,)], "text string")
    flagged = flag_contaminated(
        extracted, bench, n=5, id_col="url", text_col="text"
    )
    contaminated = {r.url for r in flagged.filter("contaminated").collect()}
    # doc 7 is on the skipped host; within the kept host nothing leaked
    assert contaminated == set()
    # prove the flag actually fires when the leaking page IS ingested
    leak_df = spark.createDataFrame(
        [("u7", _page(7).replace("<html><body>", "").replace("</body></html>", ""))],
        "url string, text string",
    )
    all_docs = extracted.select("url", "text").unionByName(leak_df)
    assert {
        r.url
        for r in flag_contaminated(all_docs, bench, n=5, id_col="url")
        .filter("contaminated")
        .collect()
    } == {"u7"}

    # -- 5. paragraph dedup: the shared banner survives only once
    deduped = dedup_paragraphs(
        extracted.select("url", "text"), id_col="url", text_col="text"
    )
    with_banner = deduped.filter(F.col("text").contains(BANNER)).count()
    assert with_banner == 1
    assert deduped.filter(F.trim("text") != "").count() == 6  # no doc emptied

    # -- 6. resumable versioned write of the curated corpus
    curated_pages = (
        extracted.join(deduped.withColumnRenamed("text", "clean_text"), "url")
        .select(
            "url",
            F.lit(dt.datetime(2024, 5, 1)).alias("warc_ts"),
            F.encode("clean_text", "utf-8").alias("html"),
            F.col("clean_text").alias("text"),
            F.lit("ja").alias("lang"),
        )
    )
    res = run_extraction_pipeline(
        spark, curated_pages, out_dir, run_id="crawl1", n_buckets=4,
        wave_size=4, versioned=True,
    )
    assert res.snapshot == 1
    snap = read_snapshot(spark, out_dir)
    assert snap.count() == 6
    m = read_manifest(spark, out_dir)
    assert m.agg(F.sum("rows_in")).collect()[0][0] == 6
    assert m.agg(F.sum("parse_failures")).collect()[0][0] == 0
