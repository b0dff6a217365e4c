"""Word-boundary fallback chunker (our C7-spirit addition) invariants."""

from docling_japanese_books_spark.operators.chunking import word_chunker


def test_basic_packing():
    doc = "aa bb cc dd ee"
    chunks, spans = word_chunker(doc, 5)
    assert chunks == ["aa bb", "cc dd", "ee"]
    assert spans == [(0, 5), (6, 11), (12, 14)]
    for c, (s, e) in zip(chunks, spans):
        assert doc[s:e] == c  # spans slice back to the exact chunk bytes


def test_empty_and_whitespace():
    assert word_chunker("", 10) == ([], [])
    assert word_chunker("   \n\t  ", 10) == ([], [])


def test_oversized_token_is_own_chunk():
    doc = "x " + "y" * 50 + " z"
    chunks, spans = word_chunker(doc, 10)
    assert "y" * 50 in chunks
    for c, (s, e) in zip(chunks, spans):
        assert doc[s:e] == c


def test_single_chunk_when_short():
    doc = "hello world"
    chunks, spans = word_chunker(doc, 100)
    assert chunks == ["hello world"]
    assert spans == [(0, 11)]
