"""Property-based tests (hypothesis) — invariants the golden fixtures can't
enumerate: arbitrary unicode inputs, any max_chunk_length."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from docling_japanese_books_spark.extraction.html import extract_main_content
from docling_japanese_books_spark.extraction.pdf import parse_pdf_layout
from docling_japanese_books_spark.operators.chunking import (
    simple_sentence_chunker,
    simple_traditional_chunking,
    word_chunker,
)
from docling_japanese_books_spark.operators.normalize import normalize_cjk

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@settings(max_examples=200, deadline=None)
@given(doc=text_strategy, max_len=st.integers(min_value=1, max_value=200))
def test_c1_invariants(doc, max_len):
    chunks, spans = simple_sentence_chunker(doc, max_len)
    assert len(chunks) == len(spans)
    for c in chunks:
        assert c == c.strip() and c != ""
    for start, end in spans:
        assert 0 <= start <= len(doc)
    if spans:
        assert spans[-1][1] == len(doc)


@settings(max_examples=200, deadline=None)
@given(doc=text_strategy, max_len=st.integers(min_value=1, max_value=200))
def test_c3_never_empty_chunks(doc, max_len):
    for c in simple_traditional_chunking(doc, max_len):
        assert isinstance(c, str) and c.strip()


@settings(max_examples=200, deadline=None)
@given(doc=text_strategy, max_len=st.integers(min_value=1, max_value=200))
def test_word_chunker_spans_slice_exactly(doc, max_len):
    chunks, spans = word_chunker(doc, max_len)
    # the defining invariant: spans slice the original to the chunk bytes
    for c, (s, e) in zip(chunks, spans):
        assert doc[s:e] == c
    # every non-whitespace char (regex \s semantics) is inside some span
    import re

    covered = sum(e - s for s, e in spans)
    assert covered >= len(re.sub(r"\s", "", doc))


@settings(max_examples=100, deadline=None)
@given(payload=st.binary(max_size=300))
def test_extractors_never_raise(payload):
    out = extract_main_content(payload)
    assert out["status"] in {"ok", "empty", "no_content", "decode_error", "parse_error"}
    pdf = parse_pdf_layout(payload)
    assert pdf["status"] in {"ok", "empty", "no_content", "decode_error", "parse_error"}


@settings(max_examples=200, deadline=None)
@given(s=text_strategy)
def test_normalize_cjk_idempotent(s):
    once = normalize_cjk(s)
    assert normalize_cjk(once) == once
