"""Spec-derived EXTERNAL fixtures for the PDF decoder.

The roundtrip queries prove `text_to_pdf` -> `decode_pdf_minimal` is
self-consistent; these fixtures break that closed loop with hand-assembled
byte streams following PUBLIC-SPEC conventions our writer never emits
(PDF 32000-1:2008): intermediate page-tree nodes, content split across a
/Contents array, indirect /Length, ASCIIHexDecode + filter chains, a PDF
1.5 cross-reference STREAM, CRLF EOLs, real xref offsets, and an
Identity-V vertical file laid out with another writer's conventions
(no-BOM hex strings, scrambled emission order, Td-relative moves).

Reference behavior: /root/reference processes real third-party PDFs via
Docling (processor.py:285-319); its own test_docs/*.pdf are git-LFS
pointers in-sandbox, so these fixtures stand in for foreign producers.
"""

from __future__ import annotations

import zlib

from docling_japanese_books_spark.extraction.pdf import (
    parse_pdf_bytes,
    reconstruct_reading_order,
)
from docling_japanese_books_spark.extraction.pdf_bytes import decode_pdf_minimal


def _utf16_hex(s: str) -> bytes:
    """Hex string WITHOUT a BOM (many writers omit it for Identity fonts)."""
    return b"<" + s.encode("utf-16-be").hex().encode("ascii") + b">"


def _assemble(objs: dict, ver: bytes = b"1.5") -> bytes:
    """Assemble numbered objects (emitted in dict order, which callers
    scramble on purpose) into a full PDF with CRLF EOLs and a REAL xref
    table — offsets exact, 20-byte entries per spec."""
    out = bytearray(b"%PDF-" + ver + b"\r\n")
    offsets = {}
    for num, body in objs.items():
        offsets[num] = len(out)
        out += f"{num} 0 obj\r\n".encode() + body + b"\r\nendobj\r\n"
    xref_at = len(out)
    maxn = max(objs)
    out += f"xref\r\n0 {maxn + 1}\r\n".encode()
    out += b"0000000000 65535 f\r\n"
    for num in range(1, maxn + 1):
        if num in offsets:
            out += f"{offsets[num]:010d} 00000 n\r\n".encode()
        else:
            out += b"0000000000 65535 f\r\n"
    out += (
        b"trailer\r\n<< /Size "
        + str(maxn + 1).encode()
        + b" /Root 1 0 R >>\r\nstartxref\r\n"
        + str(xref_at).encode()
        + b"\r\n%%EOF\r\n"
    )
    return bytes(out)


def _hex_encode_stream(data: bytes) -> bytes:
    """ASCIIHexDecode payload with the whitespace + EOD marker the spec
    allows (decoder must ignore whitespace and stop at '>')."""
    hx = data.hex().encode("ascii").upper()
    chunks = [hx[i : i + 16] for i in range(0, len(hx), 16)]
    return b"\r\n".join(chunks) + b" >"


def test_foreign_horizontal_document():
    """Three pages under an INTERMEDIATE /Pages node, scrambled object
    order, indirect /Length, nested + unbalanced-escaped parens, octal
    escapes, a /Contents array mixing FlateDecode and ASCIIHexDecode
    streams — none of which our writer produces."""
    content_a = b"BT /F1 10 Tf 1 0 0 1 50 700 Tm (Hello (nested) paren) Tj ET"
    content_b = (
        b"BT 14 TL /F1 10 Tf 1 0 0 1 50 700 Tm "
        b"(line A\\) unbalanced \\() Tj T* (\\110\\151 octal, 50\\% kept) Tj ET"
    )
    part_one = b"BT /F1 10 Tf 1 0 0 1 40 700 Tm (part one) Tj"
    part_two = b"0 -14 Td (part two) Tj ET"
    flate_one = zlib.compress(part_one)
    hex_two = _hex_encode_stream(part_two)
    res = b"/Resources << /Font << /F1 11 0 R >> >>"
    objs = {
        # scrambled emission order: pages before tree, font last
        5: b"<< /Type /Page /Parent 3 0 R /MediaBox [0 0 612 792] "
        + res
        + b" /Contents 7 0 R >>",
        7: b"<< /Length 12 0 R >>\r\nstream\r\n" + content_a + b"\r\nendstream",
        12: str(len(content_a)).encode(),
        6: b"<< /Type /Page /Parent 3 0 R /MediaBox [0 0 612 792] "
        + res
        + b" /Contents 8 0 R >>",
        8: b"<< /Length "
        + str(len(content_b)).encode()
        + b" >>\r\nstream\r\n"
        + content_b
        + b"\r\nendstream",
        4: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 595 842] "
        + res
        + b" /Contents [9 0 R 10 0 R] >>",
        9: b"<< /Length "
        + str(len(flate_one)).encode()
        + b" /Filter /FlateDecode >>\r\nstream\r\n"
        + flate_one
        + b"\r\nendstream",
        10: b"<< /Filter /ASCIIHexDecode /Length "
        + str(len(hex_two)).encode()
        + b" >>\r\nstream\r\n"
        + hex_two
        + b"\r\nendstream",
        3: b"<< /Type /Pages /Parent 2 0 R /Kids [5 0 R 6 0 R] /Count 2 >>",
        2: b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 3 >>",
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        11: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    ir = decode_pdf_minimal(_assemble(objs))
    assert len(ir["pages"]) == 3  # tree order: 5, 6 (via node 3), then 4
    assert [s["text"] for s in ir["pages"][0]["spans"]] == ["Hello (nested) paren"]
    assert [s["text"] for s in ir["pages"][1]["spans"]] == [
        "line A) unbalanced (",
        "Hi octal, 50% kept",
    ]
    p3 = ir["pages"][2]["spans"]
    assert [s["text"] for s in p3] == ["part one", "part two"]
    assert p3[1]["y"] - p3[0]["y"] == 14.0  # Td advance across the stream split
    assert ir["pages"][2]["width"] == 595.0  # A4 MediaBox honored
    # and the whole thing flows through the production UDF entry point
    out = parse_pdf_bytes(_assemble(objs))
    assert out["status"] == "ok" and out["n_pages"] == 3


def test_filter_chain_asciihex_then_flate():
    """/Filter [ /ASCIIHexDecode /FlateDecode ]: filters apply in array
    order when decoding (hex first, then inflate) per spec §7.4."""
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (chained filters) Tj ET"
    payload = _hex_encode_stream(zlib.compress(content))
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>",
        4: b"<< /Filter [ /ASCIIHexDecode /FlateDecode ] /Length "
        + str(len(payload)).encode()
        + b" >>\r\nstream\r\n"
        + payload
        + b"\r\nendstream",
    }
    ir = decode_pdf_minimal(_assemble(objs))
    assert [s["text"] for s in ir["pages"][0]["spans"]] == ["chained filters"]


def test_unknown_filter_rejected_not_misread():
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Filter /DCTDecode /Length 4 >>\r\nstream\r\nabcd\r\nendstream",
    }
    import pytest

    with pytest.raises(ValueError, match="DCTDecode"):
        decode_pdf_minimal(_assemble(objs))


def test_xref_stream_document():
    """PDF 1.5 cross-reference STREAM: a /Type /XRef object whose binary
    flate payload deliberately contains '99 0 obj'/'endobj' byte sequences.
    The direct-/Length cursor must jump over it (no phantom objects, no
    truncation) and the page must still decode."""
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (survives xref stream) Tj ET"
    stream = zlib.compress(content)
    # adversarial xref-stream payload: object-header lookalikes inside
    xref_payload = zlib.compress(
        b"\x00" * 7 + b"99 0 obj" + b"\x01\x02" + b"endobj" + b"stream" + b"\x00" * 9
    )
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>",
        4: b"<< /Length "
        + str(len(stream)).encode()
        + b" /Filter /FlateDecode >>\r\nstream\r\n"
        + stream
        + b"\r\nendstream",
        5: b"<< /Type /XRef /Size 6 /W [1 2 1] /Root 1 0 R /Filter /FlateDecode"
        b" /Length "
        + str(len(xref_payload)).encode()
        + b" >>\r\nstream\r\n"
        + xref_payload
        + b"\r\nendstream",
    }
    ir = decode_pdf_minimal(_assemble(objs))
    assert len(ir["pages"]) == 1
    assert [s["text"] for s in ir["pages"][0]["spans"]] == ["survives xref stream"]


def test_foreign_vertical_identity_v():
    """Identity-V tategaki from ANOTHER writer's conventions: hex strings
    without a BOM, ruby runs emitted before/after their base columns in
    scrambled file order, a ruby y-offset, and an explicit Type0 +
    DescendantFonts chain. Reading order must still come out right-to-left
    with ruby folded as base(reading)."""
    content = (
        b"BT /F1 12 Tf "
        # column 2 first (middle of the page)
        + b"1 0 0 1 460 740 Tm " + _utf16_hex("第二列") + b" Tj "
        # ruby for column 1 BEFORE its base, smaller font, y slightly lower
        + b"/F1 5 Tf 1 0 0 1 510 720 Tm " + _utf16_hex("いちばん") + b" Tj "
        # column 1 (rightmost = read first)
        + b"/F1 12 Tf 1 0 0 1 500 740 Tm " + _utf16_hex("第一列") + b" Tj "
        # column 3 (leftmost = read last)
        + b"1 0 0 1 420 740 Tm " + _utf16_hex("第三列") + b" Tj "
        + b"ET"
    )
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 595 842] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        4: b"<< /Length "
        + str(len(content)).encode()
        + b" >>\r\nstream\r\n"
        + content
        + b"\r\nendstream",
        5: b"<< /Type /Font /Subtype /Type0 /BaseFont /NotoSerifCJK "
        b"/Encoding /Identity-V /DescendantFonts [6 0 R] >>",
        6: b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /NotoSerifCJK >>",
    }
    ir = decode_pdf_minimal(_assemble(objs))
    spans = ir["pages"][0]["spans"]
    assert all(s["vertical"] for s in spans)
    by_text = {s["text"]: s.get("ruby") for s in spans}
    assert by_text == {"第一列": "いちばん", "第二列": None, "第三列": None}
    assert reconstruct_reading_order(ir) == "第一列(いちばん)\n第二列\n第三列"
