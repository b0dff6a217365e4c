"""The COMPOSED office-document pipeline: one test driving the round-5
surface end to end, the way a user with a DOCX/PPTX corpus would —

    binaryFile discovery (extension predicate admits .docx/.pptx)
      -> content-sniffing OOXML extraction through the resumable
         bucketed pipeline (snapshot lineage)
      -> exact-substring dedup of a shared boilerplate passage
      -> learned quality filter (fluent vs scrambled)
      -> BPE tokenization + token accounting

Each stage has its own unit/oracle coverage; this pins that the
INTERFACES compose and the end state is the expected curated, tokenized
corpus.
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from docling_japanese_books_spark.extraction.ooxml import (
    paragraphs_to_docx,
    slides_to_pptx,
)
from docling_japanese_books_spark.operators.bpe import encode_corpus, train_bpe
from docling_japanese_books_spark.operators.dedup import dedup_exact_substrings
from docling_japanese_books_spark.operators.quality_clf import (
    quality_score_udf,
    scramble_words,
    train_quality_classifier,
)
from docling_japanese_books_spark.pipeline.driver import (
    extract_office_pages,
    read_snapshot,
    run_extraction_pipeline,
)
from docling_japanese_books_spark.sources.files import discover_files

DISCLAIMER = (
    "this-report-is-provided-for-informational-purposes-only-and-carries-"
    "no-warranty-of-any-kind"
)

SENTENCES = [
    "the quarterly report shows steady growth across the region",
    "our pipeline processes documents from every department daily",
    "the committee approved the budget for the next fiscal year",
    "training material should be reviewed before the new session",
    "the archive keeps one copy of every published presentation",
    "data quality checks run before any document enters the corpus",
]


@pytest.fixture()
def office_dir():
    d = tempfile.mkdtemp(prefix="office_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_office_corpus_end_to_end(spark, office_dir, tmp_path):
    # -- 1. a mixed corpus of real OOXML files on disk -------------------
    n_docs = 12
    for i in range(n_docs):
        body = [SENTENCES[i % len(SENTENCES)], f"u{i}.{DISCLAIMER}.v{i}"]
        if i % 2 == 0:
            (Path(office_dir) / f"doc{i}.docx").write_bytes(
                paragraphs_to_docx(body)
            )
        else:
            (Path(office_dir) / f"deck{i}.pptx").write_bytes(
                slides_to_pptx([body])
            )
    (Path(office_dir) / "notes.xyz").write_text("ignored")  # bad extension

    files = discover_files(spark, office_dir)
    assert files.count() == n_docs  # extension predicate filtered .xyz

    # -- 2. resumable extraction with snapshot lineage -------------------
    pages = files.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.lit("en").alias("lang"),
        F.col("content").alias("html"),
    )
    out_dir = str(tmp_path / "table")
    r = run_extraction_pipeline(
        spark, pages, out_dir, run_id="ingest1", n_buckets=4,
        versioned=True, extractor=extract_office_pages,
    )
    assert r.rows_out == n_docs
    corpus = read_snapshot(spark, out_dir).select(
        F.col("url"), F.col("text"), F.col("status")
    )
    assert corpus.filter(F.col("status") != "ok").count() == 0
    # docx newline-joins paragraphs; pptx newline-joins slide lines
    sample = corpus.filter(F.col("url").endswith("doc0.docx")).first()
    assert sample.text == "\n".join(
        [SENTENCES[0], f"u0.{DISCLAIMER}.v0"]
    )

    # -- 3. exact-substring dedup strips the shared disclaimer -----------
    with_ids = corpus.withColumn(
        "doc_id", F.xxhash64("url") % 1_000_000_007
    ).select("doc_id", "url", "text")
    deduped = dedup_exact_substrings(
        with_ids.select("doc_id", "text"), min_len=len(DISCLAIMER)
    )
    joined = with_ids.drop("text").join(deduped, "doc_id")
    still_carrying = joined.filter(
        F.col("text").contains(DISCLAIMER)
    ).count()
    assert still_carrying == 1  # only the first corpus occurrence survives
    # every document keeps its unique sentence
    for i in (0, 1):
        row = joined.filter(F.col("url").endswith(f"{'doc' if i % 2 == 0 else 'deck'}{i}.{'docx' if i % 2 == 0 else 'pptx'}")).first()
        assert SENTENCES[i % len(SENTENCES)] in row.text

    # -- 4. learned quality filter scores fluent docs over scrambled -----
    texts = [r.text for r in joined.select("text").collect()]
    w, b = train_quality_classifier(
        texts, [scramble_words(t, seed=i) for i, t in enumerate(texts)],
        dim=1 << 14,
    )
    scored = joined.select(
        "doc_id", "text",
        quality_score_udf(w, b, 1 << 14)(F.col("text")).alias("q"),
    )
    kept = scored.filter(F.col("q") > 0.5)
    assert kept.count() == joined.count()  # the fluent originals all pass

    # -- 5. BPE tokenize the curated corpus ------------------------------
    merges = train_bpe(kept, n_merges=40, max_words=5_000)
    tokens = encode_corpus(kept, merges)
    stats = tokens.agg(
        F.sum("n_tokens").alias("total"), F.min("n_tokens").alias("mn")
    ).first()
    assert stats.total > 0 and stats.mn > 0
    # token streams reassemble their documents (spot check one row)
    row = tokens.join(kept, "doc_id").first()
    reassembled = "".join(t.replace("</w>", "") for t in row.tokens)
    assert reassembled == "".join(row.text.lower().split())
