"""PDF layout parsing: reading-order reconstruction + ruby folding."""

from __future__ import annotations

import json

import pytest

from docling_japanese_books_spark.extraction.pdf import (
    decode_pdf_real,
    parse_pdf_layout,
    parse_pdf_udf,
    reconstruct_reading_order,
)


def _ir(pages) -> bytes:
    return json.dumps({"pages": pages}).encode("utf-8")


def test_horizontal_reading_order():
    # scattered spans, expect rows top->bottom then left->right
    spans = [
        {"x": 300, "y": 100, "text": "right1"},
        {"x": 100, "y": 102, "text": "left1"},
        {"x": 100, "y": 300, "text": "left2"},
        {"x": 300, "y": 298, "text": "right2"},
    ]
    out = parse_pdf_layout(_ir([{"spans": spans}]))
    assert out["text"] == "left1\nright1\nleft2\nright2"
    assert out["status"] == "ok" and out["n_pages"] == 1 and out["n_spans"] == 4


def test_vertical_japanese_columns_right_to_left():
    # two vertical columns: rightmost read first, top-to-bottom
    spans = [
        {"x": 500, "y": 100, "text": "一行目", "vertical": True},
        {"x": 500, "y": 300, "text": "二行目", "vertical": True},
        {"x": 300, "y": 100, "text": "三行目", "vertical": True},
        {"x": 300, "y": 300, "text": "四行目", "vertical": True},
    ]
    out = parse_pdf_layout(_ir([{"spans": spans}]))
    assert out["text"] == "一行目\n二行目\n三行目\n四行目"


def test_ruby_folded_as_reading():
    spans = [{"x": 0, "y": 0, "text": "漢字", "ruby": "かんじ"}]
    out = parse_pdf_layout(_ir([{"spans": spans}]))
    assert out["text"] == "漢字(かんじ)"


def test_mixed_orientation_and_multipage():
    pages = [
        {"spans": [{"x": 0, "y": 0, "text": "h1"},
                   {"x": 900, "y": 0, "text": "縦", "vertical": True}]},
        {"spans": [{"x": 0, "y": 0, "text": "page2"}]},
    ]
    out = parse_pdf_layout(_ir(pages))
    assert out["text"] == "h1\n縦\n\npage2"
    assert out["n_pages"] == 2


def test_error_isolation():
    assert parse_pdf_layout(None)["status"] == "empty"
    assert parse_pdf_layout(b"")["status"] == "empty"
    assert parse_pdf_layout(b"\xff\xfe")["status"] == "decode_error"
    assert parse_pdf_layout(b"not json")["status"] == "decode_error"
    assert parse_pdf_layout(b"{}")["status"] == "no_content"


def test_real_decode_works_without_pypdf():
    # decode_pdf_real falls back to the pure-Python minimal decoder when
    # pypdf is absent: real PDF bytes decode either way, and malformed
    # bytes raise ValueError (mapped to decode_error by parse_pdf_bytes)
    from docling_japanese_books_spark.extraction.pdf_bytes import text_to_pdf

    ir = decode_pdf_real(text_to_pdf("real decode path"))
    assert [s["text"] for s in ir["pages"][0]["spans"]] == ["real decode path"]
    with pytest.raises(ValueError):
        decode_pdf_real(b"%PDF-1.4")


def test_spark_udf_roundtrip(spark):
    rows = [
        (1, _ir([{"spans": [{"x": 0, "y": 0, "text": "hello"}]}])),
        (2, b"broken"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in df.select("doc_id", parse_pdf_udf("payload").alias("e"))
           .select("doc_id", "e.*").collect()}
    assert out[1].text == "hello" and out[1].status == "ok"
    assert out[2].status == "decode_error"
    assert out[3].status == "empty"


def test_column_tolerance_groups_jitter():
    # y jitter within tolerance stays one row
    spans = [
        {"x": 100, "y": 100, "text": "a"},
        {"x": 200, "y": 110, "text": "b"},  # +10 within 20 tolerance
        {"x": 150, "y": 180, "text": "c"},
    ]
    assert reconstruct_reading_order({"pages": [{"spans": spans}]}) == "a\nb\nc"
