"""Charset sniffing (extraction/charset.py): the Japanese-web decode
problem — Shift_JIS / EUC-JP / ISO-2022-JP pages must extract, garbage
must stay an honest decode_error."""

from __future__ import annotations

import pytest

from docling_japanese_books_spark.extraction.charset import (
    declared_charset,
    sniff_and_decode,
)
from docling_japanese_books_spark.extraction.html import extract_main_content

JP = "吾輩は猫である。名前はまだ無い。東京タワーと富士山。"
PAGE = f"<html><body><p>{JP} これは充分に長い本文の段落です。</p></body></html>"


def test_utf8_and_boms():
    assert sniff_and_decode(PAGE.encode("utf-8")) == (PAGE, "utf-8")
    text, enc = sniff_and_decode(b"\xef\xbb\xbf" + PAGE.encode("utf-8"))
    assert (text, enc) == (PAGE, "utf-8")
    text, enc = sniff_and_decode(b"\xff\xfe" + PAGE.encode("utf-16-le"))
    assert (text, enc) == (PAGE, "utf-16-le")
    text, enc = sniff_and_decode(b"\xfe\xff" + PAGE.encode("utf-16-be"))
    assert (text, enc) == (PAGE, "utf-16-be")


def test_legacy_jp_encodings_sniffed_without_declaration():
    for codec, expect in (
        ("shift_jis", "shift_jis"),
        ("euc_jp", "euc_jp"),
        ("iso2022_jp", "iso2022_jp"),
    ):
        text, enc = sniff_and_decode(PAGE.encode(codec))
        assert text == PAGE, codec
        assert enc == expect


def test_meta_declaration_wins():
    html = (
        '<html><head><meta charset="Shift_JIS"></head><body><p>'
        + JP
        + "</p></body></html>"
    )
    text, enc = sniff_and_decode(html.encode("shift_jis"))
    assert enc == "shift_jis" and JP in text
    html2 = (
        '<html><head><meta http-equiv="Content-Type" '
        'content="text/html; charset=EUC-JP"></head><body><p>'
        + JP
        + "</p></body></html>"
    )
    text, enc = sniff_and_decode(html2.encode("euc_jp"))
    assert enc == "euc_jp" and JP in text
    # declared single-byte codecs are honored (the only path to cp1252)
    latin = '<meta charset="windows-1252"><p>caf\xe9 r\xe9sum\xe9</p>'
    text, enc = sniff_and_decode(latin.encode("cp1252"))
    assert enc == "cp1252" and "café résumé" in text


def test_lying_declaration_falls_through_to_detection():
    html = '<meta charset="utf-8"><p>' + JP + "</p>"
    text, enc = sniff_and_decode(html.encode("shift_jis"))
    assert enc == "shift_jis" and JP in text


def test_garbage_still_decode_error():
    with pytest.raises(UnicodeDecodeError):
        sniff_and_decode(b"<p>broken \xff\xfe page</p>")
    out = extract_main_content(b"<p>broken \xff\xfe page</p>")
    assert out["status"] == "decode_error" and out["encoding"] is None


def test_extract_main_content_reports_encoding():
    page = (
        "<html><body><p>"
        + JP * 3
        + " これは抽出されるべき充分に長い本文の段落であり、ナビゲーションではありません。"
        + "</p></body></html>"
    )
    for codec in ("utf-8", "shift_jis", "euc_jp", "iso2022_jp"):
        out = extract_main_content(page.encode(codec))
        assert out["status"] == "ok", codec
        assert out["encoding"] == codec.replace("utf-8", "utf-8")
        assert JP.split("。")[0] in out["text"], codec


def test_declared_charset_labels():
    assert declared_charset(b'<meta charset="SJIS">') == "shift_jis"
    assert declared_charset(b'<meta charset="x-euc-jp">') == "euc_jp"
    assert declared_charset(b'<META CHARSET="UTF8">') == "utf-8"
    assert declared_charset(b"<p>no declaration</p>") is None
    # declaration outside the first 1024 bytes is ignored (policy)
    far = b" " * 1100 + b'<meta charset="shift_jis">'
    assert declared_charset(far) is None
