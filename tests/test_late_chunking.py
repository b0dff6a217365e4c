"""Late chunking: span mapping parity with the reference's arithmetic,
pooled-vector goldens, and the Spark mapInPandas / declarative surfaces."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from docling_japanese_books_spark.operators.chunking import simple_sentence_chunker
from docling_japanese_books_spark.operators.embedding import embed_text
from docling_japanese_books_spark.operators.late_chunking import (
    late_chunk,
    late_chunk_document,
    map_span_to_tokens,
    map_spans_to_tokens,
    pool_token_spans,
)

JP_DOC = (
    "これは最初の文です。二番目の文はもう少し長くなっています。"
    "三番目の文。そして四番目の文がここにあります。"
    "最後の文は文書の終わりを示します。"
)


def test_span_mapping_matches_reference_arithmetic():
    # reference late_chunking.py:252-256: int() truncation + clamps
    doc_len, seq_len = 100, 16
    cases = [(0, 50), (50, 100), (0, 100), (99, 100), (3, 4)]
    for cs, ce in cases:
        ts, te = map_span_to_tokens(cs, ce, doc_len, seq_len)
        ref_ts = max(0, int((cs / doc_len) * seq_len))
        ref_te = min(seq_len, max(ref_ts + 1, int((ce / doc_len) * seq_len)))
        assert (ts, te) == (ref_ts, ref_te)
        assert te > ts  # never an empty span


def test_late_chunk_document_pools_token_windows():
    recs = late_chunk_document(JP_DOC, max_chunk_length=40, token_chars=8, dim=16)
    chunks, spans = simple_sentence_chunker(JP_DOC, 40)
    assert [r["text"] for r in recs] == chunks  # chunk text byte-identical to C1

    seq_len = math.ceil(len(JP_DOC) / 8)
    toks = np.stack(
        [embed_text(JP_DOC[i * 8 : (i + 1) * 8], 16) for i in range(seq_len)]
    )
    for r, (cs, ce) in zip(recs, spans):
        ts, te = map_span_to_tokens(cs, ce, len(JP_DOC), seq_len)
        assert (r["token_start"], r["token_end"]) == (ts, te)
        expect = toks[ts:te].mean(axis=0)
        assert np.allclose(np.array(r["embedding"]), expect, atol=1e-6)


def test_late_chunk_document_max_pooling_and_edges():
    recs = late_chunk_document(
        JP_DOC, max_chunk_length=40, token_chars=8, dim=16, pooling="max"
    )
    seq_len = math.ceil(len(JP_DOC) / 8)
    toks = np.stack(
        [embed_text(JP_DOC[i * 8 : (i + 1) * 8], 16) for i in range(seq_len)]
    )
    r = recs[0]
    expect = toks[r["token_start"] : r["token_end"]].max(axis=0)
    assert np.allclose(np.array(r["embedding"]), expect, atol=1e-6)

    assert late_chunk_document("") == []
    with pytest.raises(ValueError):
        late_chunk_document(JP_DOC, pooling="median")


def test_late_chunk_spark_matches_core(spark):
    docs = spark.createDataFrame(
        [(1, JP_DOC), (2, ""), (3, "短い文。もう一つ。")],
        "doc_id long, text string",
    )
    out = late_chunk(docs, max_chunk_length=40, token_chars=8, dim=16).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 2 not in by_doc  # empty doc yields no chunks
    for did, text in [(1, JP_DOC), (3, "短い文。もう一つ。")]:
        recs = late_chunk_document(text, max_chunk_length=40, token_chars=8, dim=16)
        rows = sorted(by_doc[did], key=lambda r: r.chunk_index)
        assert [r.text for r in rows] == [x["text"] for x in recs]
        for row, rec in zip(rows, recs):
            assert row.chunking_method == "late"
            assert (row.token_start, row.token_end) == (
                rec["token_start"],
                rec["token_end"],
            )
            assert np.allclose(row.embedding, rec["embedding"], atol=1e-6)


def test_declarative_pooling_matches_numpy(spark):
    # 1 doc, 4 tokens of dim 3; two chunk spans
    tokens = spark.createDataFrame(
        [
            (1, 0, [1.0, 0.0, 0.0]),
            (1, 1, [0.0, 1.0, 0.0]),
            (1, 2, [0.0, 0.0, 1.0]),
            (1, 3, [3.0, 3.0, 3.0]),
        ],
        "doc_id long, tok_idx long, embedding array<float>",
    )
    chunks = spark.createDataFrame(
        [(1, 0, 0, 2), (1, 1, 2, 4)],
        "doc_id long, chunk_index long, token_start long, token_end long",
    )
    out = {
        r.chunk_index: r
        for r in pool_token_spans(chunks, tokens).collect()
    }
    assert out[0].n_tokens == 2 and out[1].n_tokens == 2
    assert np.allclose(out[0].embedding, [0.5, 0.5, 0.0])
    assert np.allclose(out[1].embedding, [1.5, 1.5, 2.0])


def test_map_spans_to_tokens_column_algebra(spark):
    df = spark.createDataFrame(
        [(1, 100, 0, 50), (1, 100, 50, 100), (1, 100, 99, 100)],
        "doc_id long, doc_len long, char_start long, char_end long",
    )
    rows = map_spans_to_tokens(df, seq_len=F.lit(16)).collect()
    for r in rows:
        ts, te = map_span_to_tokens(r.char_start, r.char_end, 100, 16)
        assert (r.token_start, r.token_end) == (ts, te)


def test_declarative_pooling_keeps_tokenless_chunks(spark):
    tokens = spark.createDataFrame(
        [(1, 0, [1.0, 1.0])], "doc_id long, tok_idx long, embedding array<float>"
    )
    chunks = spark.createDataFrame(
        [(1, 0, 0, 1), (1, 1, 5, 7)],  # second span beyond the token table
        "doc_id long, chunk_index long, token_start long, token_end long",
    )
    out = {r.chunk_index: r for r in pool_token_spans(chunks, tokens).collect()}
    assert out[0].n_tokens == 1
    assert out[1].n_tokens == 0 and out[1].embedding is None  # visible, not dropped


def test_span_mapping_column_float_parity(spark):
    # cs=29, dl=100, seq=100: divide-first truncates to 28; multiply-first
    # would give 29 — the column algebra must match the reference order
    df = spark.createDataFrame(
        [(1, 100, 29, 40)], "doc_id long, doc_len long, char_start long, char_end long"
    )
    r = map_spans_to_tokens(df, seq_len=F.lit(100)).collect()[0]
    assert r.token_start == map_span_to_tokens(29, 40, 100, 100)[0] == 28
