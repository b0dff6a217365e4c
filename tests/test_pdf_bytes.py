"""Real PDF byte streams: pure-Python writer + decoder (extraction/pdf_bytes).

The writer emits standards-valid PDFs (xref offsets, FlateDecode streams,
UTF-16BE strings); the decoder is exercised both on writer output and on
hand-built PDFs using features the writer never emits (literal strings with
escapes, TJ arrays, T*/TL, uncompressed streams) so the two are not merely
inverses of each other."""

from __future__ import annotations

import zlib

import pytest

from docling_japanese_books_spark.extraction.pdf import (
    parse_pdf_bytes,
    reconstruct_reading_order,
)
from docling_japanese_books_spark.extraction.pdf_bytes import (
    decode_pdf_minimal,
    text_to_pdf,
)


def _flatten(s: str) -> str:
    return s.replace("\n\n", " ").replace("\n", " ")


def test_writer_decoder_roundtrip_multipage():
    text = " ".join(f"word{i}" for i in range(100))
    pdf = text_to_pdf(text, words_per_line=8, lines_per_page=5)
    assert pdf.startswith(b"%PDF-1.4") and pdf.rstrip().endswith(b"%%EOF")
    ir = decode_pdf_minimal(pdf)
    assert len(ir["pages"]) == 3  # ceil(13 lines / 5)
    assert sum(len(p["spans"]) for p in ir["pages"]) == 13
    assert _flatten(reconstruct_reading_order(ir)) == text


def test_writer_decoder_roundtrip_cjk():
    jp = "吾輩は猫である 名前はまだ無い 薙刀体操法 テスト"
    ir = decode_pdf_minimal(text_to_pdf(jp, words_per_line=2))
    assert _flatten(reconstruct_reading_order(ir)) == jp


def test_ideographic_space_span_survives():
    """A span consisting of U+3000 (ideographic space — plausible CJK
    content) must survive decoding: the decoder strips ASCII whitespace
    only. Python str.strip() would silently drop the span while the
    roundtrip oracle's ASCII-\\s normalization keeps the 'word', breaking
    text_match and the n_spans prediction."""
    pdf = text_to_pdf("あ 　 い", words_per_line=1)  # one word per line
    ir = decode_pdf_minimal(pdf)
    texts = [s["text"] for p in ir["pages"] for s in p["spans"]]
    assert texts == ["あ", "　", "い"]
    assert _flatten(reconstruct_reading_order(ir)) == "あ 　 い"


def test_writer_xref_offsets_are_exact():
    pdf = text_to_pdf("a b c")
    # every xref entry must point at "N 0 obj"
    xref_at = pdf.rfind(b"xref")
    lines = pdf[xref_at:].split(b"\n")
    entries = [l for l in lines if l.endswith(b" n ")]
    for num, entry in enumerate(entries, start=1):
        off = int(entry.split(b" ")[0])
        assert pdf[off:].startswith(f"{num} 0 obj".encode()), f"object {num}"


def _manual_pdf(content: bytes, compress: bool = False) -> bytes:
    """Hand-built single-page PDF exercising decoder-only features."""
    if compress:
        stream = zlib.compress(content)
        filt = b" /Filter /FlateDecode"
    else:
        stream, filt = content, b""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>",
        b"<< /Length " + str(len(stream)).encode() + filt + b" >>\nstream\n"
        + stream + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    for num, body in enumerate(objs, start=1):
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    out += b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    return bytes(out)


def test_literal_strings_escapes_and_tj_arrays():
    content = (
        b"BT /F1 12 Tf 2 TL 1 0 0 1 72 700 Tm "
        b"(first \\(escaped\\) line \\134 \\101) Tj "
        b"0 -30 Td [(kerned) -120 ( array)] TJ "
        b"30 TL (shown via quote) ' "
        b"ET"
    )
    ir = decode_pdf_minimal(_manual_pdf(content))
    texts = [s["text"] for s in ir["pages"][0]["spans"]]
    assert texts == ["first (escaped) line \\ A", "kerned array", "shown via quote"]
    # positions: Tm sets (72,-700); Td advances; ' uses TL
    ys = [s["y"] for s in ir["pages"][0]["spans"]]
    assert ys == [-700.0, -670.0, -640.0]


def test_uncompressed_stream_and_tstar():
    content = b"BT 20 TL 1 0 0 1 10 100 Tm (one) Tj T* (two) Tj ET"
    ir = decode_pdf_minimal(_manual_pdf(content, compress=False))
    spans = ir["pages"][0]["spans"]
    assert [s["text"] for s in spans] == ["one", "two"]
    assert spans[1]["y"] - spans[0]["y"] == 20.0  # T* descends by TL


def test_max_pages_truncation():
    text = " ".join(f"w{i}" for i in range(64))
    pdf = text_to_pdf(text, words_per_line=8, lines_per_page=2)  # 4 pages
    ir = decode_pdf_minimal(pdf, max_pages=2)
    assert ir["truncated"] and len(ir["pages"]) == 2
    full = decode_pdf_minimal(pdf)
    assert not full["truncated"] and len(full["pages"]) == 4


def test_rejects_out_of_subset_input():
    with pytest.raises(ValueError):
        decode_pdf_minimal(b"not a pdf at all")
    enc = _manual_pdf(b"BT (x) Tj ET").replace(
        b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R"
    )
    with pytest.raises(ValueError):
        decode_pdf_minimal(enc)


def test_parse_pdf_bytes_isolation():
    ok = parse_pdf_bytes(text_to_pdf("hello real pdf"))
    assert ok["status"] == "ok" and ok["text"] == "hello real pdf"
    bad = parse_pdf_bytes(b"%PDF-1.4 garbage")
    assert bad["status"] == "decode_error" and bad["text"] == ""
    assert parse_pdf_bytes(None)["status"] == "empty"
    assert parse_pdf_bytes(b"")["status"] == "empty"


def test_parse_pdf_bytes_udf_spark(spark):
    from pyspark.sql import functions as F

    from docling_japanese_books_spark.extraction.pdf import parse_pdf_bytes_udf

    rows = [
        (1, text_to_pdf("spark reads real pdf bytes")),
        (2, b"corrupt"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, pdf binary")
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id", parse_pdf_bytes_udf(F.col("pdf")).alias("e")
        ).select("doc_id", "e.*").collect()
    }
    assert out[1].status == "ok" and out[1].text == "spark reads real pdf bytes"
    assert out[2].status == "decode_error"
    assert out[3].status == "empty"


def test_vertical_pdf_reading_order_and_ruby():
    """North rule: vertical Japanese reading order + furigana on REAL
    bytes. Columns come back right-to-left (original order), ruby runs
    fold as base(reading), and the Identity-V font drives detection."""
    from docling_japanese_books_spark.extraction.pdf_bytes import (
        columns_to_vertical_pdf,
    )

    cols = [("吾輩は猫である", "わがはい"), ("名前はまだ無い", None), ("薙刀体操法", "なぎなた")]
    ir = decode_pdf_minimal(columns_to_vertical_pdf(cols))
    spans = ir["pages"][0]["spans"]
    assert all(s["vertical"] for s in spans)
    assert [s.get("ruby") for s in spans] == ["わがはい", None, "なぎなた"]
    assert reconstruct_reading_order(ir) == (
        "吾輩は猫である(わがはい)\n名前はまだ無い\n薙刀体操法(なぎなた)"
    )
    # horizontal writer output must NOT be flagged vertical
    ir_h = decode_pdf_minimal(text_to_pdf("plain text"))
    assert not any(s.get("vertical") for s in ir_h["pages"][0]["spans"])


def test_vertical_pdf_multipage_and_column_spacing():
    from docling_japanese_books_spark.extraction.pdf_bytes import (
        columns_to_vertical_pdf,
    )

    cols = [(f"col{i}", None) for i in range(30)]
    ir = decode_pdf_minimal(columns_to_vertical_pdf(cols, cols_per_page=12))
    assert len(ir["pages"]) == 3
    flat = reconstruct_reading_order(ir).replace("\n\n", "\n").split("\n")
    assert flat == [f"col{i}" for i in range(30)]  # strict tategaki order


# --- review-pass regression tests -------------------------------------------


def test_indirect_length_falls_back_to_endstream():
    """`/Length 5 0 R` stores the byte count in object 5 — the leading 5
    is an object number, NOT a length; misreading it truncated streams."""
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (full text survives) Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>",
        b"<< /Length 5 0 R >>\nstream\n" + content + b"\nendstream",
        str(len(content)).encode(),
    ]
    out = bytearray(b"%PDF-1.4\n")
    for num, body in enumerate(objs, start=1):
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    out += b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    ir = decode_pdf_minimal(bytes(out))
    assert [s["text"] for s in ir["pages"][0]["spans"]] == ["full text survives"]


def test_backslash_before_non_octal_digit():
    """Per spec, a backslash before 8/9 is dropped (not an octal escape):
    '(a \\8 b)' means 'a 8 b'. int(..., 8) on '8' used to reject the doc."""
    ir = decode_pdf_minimal(_manual_pdf(b"BT (a \\8 b \\9) Tj ET"))
    assert [s["text"] for s in ir["pages"][0]["spans"]] == ["a 8 b 9"]


def test_simple_font_hex_strings_stay_single_byte():
    """An even-length ASCII hex string in a simple-font page is 1-byte
    codes — decoding it as UTF-16BE yields CJK garbage. Only CID (Type0 /
    Identity-H/V) pages use 2-byte hex codes."""
    ir = decode_pdf_minimal(_manual_pdf(b"BT <48656C6C6F21> Tj ET"))
    assert [s["text"] for s in ir["pages"][0]["spans"]] == ["Hello!"]


def test_stream_containing_endobj_bytes_not_truncated():
    """Stream data may contain the byte sequence 'endobj' (e.g. a PDF
    about PDF syntax): the sequential object scan must jump over the
    declared stream extent instead of truncating at the first match."""
    content = b"BT (mentions endobj and 9 0 obj inside) Tj ET"
    ir = decode_pdf_minimal(_manual_pdf(content))
    assert [s["text"] for s in ir["pages"][0]["spans"]] == [
        "mentions endobj and 9 0 obj inside"
    ]


def test_mixed_vertical_horizontal_document():
    """A horizontal page with INHERITED resources in a document that also
    contains an Identity-V font must NOT be flagged vertical: vertical
    detection resolves the page's own resource scope (own dict or /Parent
    chain), never the whole document."""
    import zlib as _z

    from docling_japanese_books_spark.extraction.pdf_bytes import (
        _page_is_vertical,
        _objects,
    )

    vert = b"BT /F1 12 Tf 1 0 0 1 500 100 Tm <30423044> Tj ET"  # vertical page
    horiz = b"BT /F1 12 Tf 1 0 0 1 72 100 Tm (left) Tj 100 0 Td (right) Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        # page tree carries the INHERITED (horizontal) font resources
        b"<< /Type /Pages /Kids [5 0 R 6 0 R] /Count 2"
        b" /Resources << /Font << /F1 4 0 R >> >> >>",
        b"<< /Type /Font /Subtype /Type0 /Encoding /Identity-V >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 7 0 R"
        b" /Resources << /Font << /F1 3 0 R >> >> >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 8 0 R >>",
        b"<< /Length " + str(len(_z.compress(vert))).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + _z.compress(vert) + b"\nendstream",
        b"<< /Length " + str(len(_z.compress(horiz))).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + _z.compress(horiz) + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    for num, body in enumerate(objs, start=1):
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    out += b"trailer\n<< /Size 9 /Root 1 0 R >>\n%%EOF\n"
    payload = bytes(out)
    parsed = _objects(payload)
    assert _page_is_vertical(parsed[5], parsed) is True
    assert _page_is_vertical(parsed[6], parsed) is False
    ir = decode_pdf_minimal(payload)
    assert all(s.get("vertical") for s in ir["pages"][0]["spans"])
    assert not any(s.get("vertical") for s in ir["pages"][1]["spans"])
    # horizontal page keeps left-to-right order ("left" precedes "right")
    assert reconstruct_reading_order(ir).splitlines()[-2:] == ["left", "right"]
    assert [s["text"] for s in ir["pages"][1]["spans"]] == ["left", "right"]
