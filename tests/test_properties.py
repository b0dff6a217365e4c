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


@settings(max_examples=200, deadline=None)
@given(
    doc_len=st.integers(min_value=1, max_value=10_000),
    seq_len=st.integers(min_value=1, max_value=512),
    cs=st.integers(min_value=0, max_value=10_000),
    width=st.integers(min_value=1, max_value=500),
)
def test_span_mapping_invariants(doc_len, seq_len, cs, width):
    from docling_japanese_books_spark.operators.late_chunking import (
        map_span_to_tokens,
    )

    cs = min(cs, doc_len - 1) if doc_len > 0 else 0
    ce = min(cs + width, doc_len)
    ts, te = map_span_to_tokens(cs, ce, doc_len, seq_len)
    assert 0 <= ts < te <= seq_len  # non-empty, in bounds
    # monotone: a later span never maps to an earlier start
    ts2, _ = map_span_to_tokens(min(cs + 1, doc_len), ce, doc_len, seq_len)
    assert ts2 >= ts


@settings(max_examples=100, deadline=None)
@given(doc=text_strategy, max_len=st.integers(min_value=1, max_value=200))
def test_late_chunk_document_invariants(doc, max_len):
    from docling_japanese_books_spark.operators.late_chunking import (
        late_chunk_document,
    )

    recs = late_chunk_document(doc, max_chunk_length=max_len, token_chars=8, dim=8)
    for r in recs:
        assert r["token_end"] > r["token_start"] >= 0
        assert len(r["embedding"]) == 8
        assert all(v == v for v in r["embedding"])  # no NaN
    assert [r["chunk_index"] for r in recs] == list(range(len(recs)))


@settings(max_examples=100, deadline=None)
@given(s=text_strategy)
def test_simhash_deterministic_and_bounded(s):
    from docling_japanese_books_spark.operators.dedup import (
        _simhash64,
        _token_hashes,
    )

    a, b = _simhash64(s), _simhash64(s)
    assert a == b  # pure function of text
    assert -(1 << 63) <= a < (1 << 63)  # fits BIGINT
    h = _token_hashes(s)
    assert list(h) == list(_token_hashes(s))  # hashes deterministic too
    if s and all(ord(c) < 128 for c in s):
        # on pure-ASCII input the tokenizer agrees with str.split()
        assert len(h) == len(s.split())


@settings(max_examples=100, deadline=None)
@given(
    body=st.lists(
        st.text(alphabet=st.characters(min_codepoint=0x61, max_codepoint=0x7A),
                min_size=1, max_size=20),
        min_size=0, max_size=8,
    ),
    max_len=st.integers(min_value=1, max_value=100),
)
def test_structural_chunker_invariants(body, max_len):
    from docling_japanese_books_spark.operators.structure import (
        hierarchical_structure_chunks,
    )

    html = "<h1>T</h1>" + "".join(f"<p>{b}</p>" for b in body)
    chunks = hierarchical_structure_chunks(html, max_chunk_length=max_len)
    # every body word survives, in order, exactly once
    assert " ".join(c["body"] for c in chunks).split() == [w for b in body for w in b.split()]
    for c in chunks:
        assert c["heading_path"] == "T"
        assert c["text"].startswith("T\n\n")
        assert c["body"]


# --- real PDF bytes roundtrip ----------------------------------------------

# words: non-empty, no whitespace (the writer's wrap contract splits on a
# single space), any other unicode including CJK
_word = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Zs", "Zl", "Zp", "Cc"),
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=100, deadline=None)
@given(
    words=st.lists(_word, min_size=1, max_size=120),
    wpl=st.integers(min_value=1, max_value=10),
    lpp=st.integers(min_value=1, max_value=6),
)
def test_pdf_bytes_roundtrip_property(words, wpl, lpp):
    """Any space-joined word sequence survives write-as-real-PDF ->
    pure-Python decode -> reading-order reconstruction, byte-identically,
    for every wrap geometry."""
    from docling_japanese_books_spark.extraction.pdf import (
        reconstruct_reading_order,
    )
    from docling_japanese_books_spark.extraction.pdf_bytes import (
        decode_pdf_minimal,
        text_to_pdf,
    )

    text = " ".join(words)
    ir = decode_pdf_minimal(text_to_pdf(text, words_per_line=wpl, lines_per_page=lpp))
    rec = reconstruct_reading_order(ir).replace("\n\n", " ").replace("\n", " ")
    assert rec == text
