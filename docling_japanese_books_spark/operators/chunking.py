"""Chunking operators (reference §2.4): exact semantic ports + Spark wrappers.

The reference implements three distinct sentence-packing chunkers whose
outputs our golden fixtures pin byte-for-byte:

- C1 ``simple_sentence_chunker`` — reference ``late_chunking.py:73-136``:
  split on ``[。！？]+``; greedy-pack stripped sentences into chunks of at
  most ``max_chunk_length`` chars; spans tracked with a running ``char_pos``
  and a parallel ``re.search`` over the original document; last span ends at
  ``len(document)``.
- C2 ``enhanced_chunk_document`` — reference ``enhanced_chunking.py:112-174``:
  split on four alternated capture-group patterns; skip punctuation-only
  fragments; join accumulated sentences with a single space; span accounting
  via ``char_pos += len(sentence) + 1``.
- C3 ``simple_traditional_chunking`` — reference
  ``embedding_evaluation.py:640-665``: split on ``[。！？]+``; re-append a
  ``。`` to every accumulated sentence; no spans.

These are deliberately *algorithm-identical* reimplementations (including the
reference's quirks — e.g. C1's span drift when a stripped sentence disagrees
with the running ``re.search``), because the correctness contract is
byte-identical chunk text per document. The Spark side wraps them in
Arrow-batched pandas UDFs returning ``array<struct<text,start,end>>`` and
explodes to one row per chunk — per-document work is irreducibly sequential,
but batching keeps the Python boundary amortized (no per-row UDF calls).
"""

from __future__ import annotations

import re
from typing import List, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Pure-Python cores (used by the pandas UDFs AND directly by pytest goldens)
# ---------------------------------------------------------------------------

_SENTENCE_ENDINGS = re.compile(r"[。！？]+")

# C2's alternated patterns, each in its own capture group (re.split then
# interleaves the separator groups into the result, exactly as the reference's
# "|".join(f"({p})") does — reference enhanced_chunking.py:118-134).
_ENHANCED_PATTERNS = [
    r"[。！？]+",
    r"[\.!?]+",
    r"」[。！？]*",
    r"』[。！？]*",
]
_ENHANCED_COMBINED = re.compile("|".join(f"({p})" for p in _ENHANCED_PATTERNS))
_ENHANCED_SKIP = {"", "。", "！", "？", ".", "!", "?", "」", "』"}


def simple_sentence_chunker(
    document: str, max_chunk_length: int = 500
) -> Tuple[List[str], List[Tuple[int, int]]]:
    """C1: sentence chunking with char spans (ref late_chunking.py:73-136)."""
    sentences = _SENTENCE_ENDINGS.split(document)

    chunks: List[str] = []
    spans: List[Tuple[int, int]] = []
    current_chunk = ""
    chunk_start = 0
    char_pos = 0

    for sentence in sentences:
        sentence = sentence.strip()
        if not sentence:
            continue

        match = _SENTENCE_ENDINGS.search(document, char_pos)
        if match:
            full_sentence = document[char_pos : match.end()].strip()
            next_char_pos = match.end()
        else:
            full_sentence = sentence
            next_char_pos = char_pos + len(sentence)

        if len(current_chunk) + len(full_sentence) > max_chunk_length and current_chunk:
            chunks.append(current_chunk.strip())
            spans.append((chunk_start, char_pos))
            current_chunk = full_sentence
            chunk_start = char_pos
        else:
            current_chunk += full_sentence

        char_pos = next_char_pos

    if current_chunk.strip():
        chunks.append(current_chunk.strip())
        spans.append((chunk_start, len(document)))

    return chunks, spans


def enhanced_chunk_document(
    document: str, max_chunk_length: int = 500
) -> Tuple[List[str], List[Tuple[int, int]]]:
    """C2: multi-pattern chunking (ref enhanced_chunking.py:112-174)."""
    chunks: List[str] = []
    spans: List[Tuple[int, int]] = []
    current_chunk = ""
    chunk_start = 0
    char_pos = 0

    sentences = _ENHANCED_COMBINED.split(document)

    for sentence in sentences:
        if not sentence or sentence.strip() in _ENHANCED_SKIP:
            continue

        sentence = sentence.strip()

        if len(current_chunk) + len(sentence) > max_chunk_length and current_chunk:
            chunks.append(current_chunk.strip())
            spans.append((chunk_start, char_pos))
            current_chunk = sentence
            chunk_start = char_pos
        else:
            if current_chunk:
                current_chunk += " " + sentence
            else:
                current_chunk = sentence

        char_pos += len(sentence) + 1

    if current_chunk.strip():
        chunks.append(current_chunk.strip())
        spans.append((chunk_start, len(document)))

    return chunks, spans


def simple_traditional_chunking(document: str, max_length: int = 500) -> List[str]:
    """C3: traditional chunking, 。 re-append (ref embedding_evaluation.py:640-665)."""
    sentences = _SENTENCE_ENDINGS.split(document)
    chunks: List[str] = []
    current_chunk = ""

    for sentence in sentences:
        sentence = sentence.strip()
        if not sentence:
            continue

        if len(current_chunk) + len(sentence) > max_length and current_chunk:
            chunks.append(current_chunk.strip())
            current_chunk = sentence
        else:
            current_chunk += sentence + "。"

    if current_chunk.strip():
        chunks.append(current_chunk.strip())

    return chunks


# ---------------------------------------------------------------------------
# Spark wrappers
# ---------------------------------------------------------------------------

CHUNK_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("text", T.StringType(), False),
            T.StructField("start", T.LongType(), True),
            T.StructField("end", T.LongType(), True),
        ]
    )
)

def word_chunker(
    document: str, max_chunk_length: int = 500
) -> Tuple[List[str], List[Tuple[int, int]]]:
    """Fallback chunker for terminator-less text (our addition, in the spirit
    of the reference's strategy-fallback chain C7, vector_db.py:71-129):
    greedy-pack whitespace tokens into chunks of <= max_chunk_length chars,
    spans over the original string. A single token longer than the limit
    becomes its own chunk (never split mid-token)."""
    chunks: List[str] = []
    spans: List[Tuple[int, int]] = []
    start = None
    end = 0
    for m in re.finditer(r"\S+", document):
        if start is None:
            start, end = m.start(), m.end()
        elif m.end() - start > max_chunk_length:
            chunks.append(document[start:end])
            spans.append((start, end))
            start, end = m.start(), m.end()
        else:
            end = m.end()
    if start is not None:
        chunks.append(document[start:end])
        spans.append((start, end))
    return chunks, spans


_CHUNKERS = {
    "simple": simple_sentence_chunker,
    "enhanced": enhanced_chunk_document,
    "words": word_chunker,
}


def chunk_udf(method: str = "simple", max_chunk_length: int = 500):
    """Arrow-batched pandas UDF: text -> array<struct<text,start,end>>.

    ``method``: 'simple' (C1), 'enhanced' (C2), or 'traditional' (C3, spans
    are null).
    """
    if method == "traditional":

        @F.pandas_udf(CHUNK_STRUCT)
        def _chunk(texts: pd.Series) -> pd.Series:
            return texts.map(
                lambda t: [
                    (c, None, None)
                    for c in simple_traditional_chunking(t or "", max_chunk_length)
                ]
            )

        return _chunk

    core = _CHUNKERS[method]

    @F.pandas_udf(CHUNK_STRUCT)
    def _chunk(texts: pd.Series) -> pd.Series:
        def one(t: str):
            chunks, spans = core(t or "", max_chunk_length)
            return [(c, s[0], s[1]) for c, s in zip(chunks, spans)]

        return texts.map(one)

    return _chunk


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    method: str = "simple",
    max_chunk_length: int = 500,
) -> DataFrame:
    """Explode a documents DataFrame into one row per chunk.

    Output: (id_col, chunk_index, text, start, end). ``posexplode`` supplies
    the 0-based ``chunk_index`` exactly like the reference's ``enumerate``
    over chunk lists (ref processor.py:464-478).

    Uses ``posexplode_outer`` + a post-explode null filter instead of plain
    ``posexplode``: the non-outer variant makes Catalyst inject a
    ``size(udf(...)) > 0`` pre-filter that duplicates the Python UDF into a
    second ArrowEvalPython stage — doubling extraction cost. The outer
    explode evaluates the UDF exactly once; empty docs are dropped by a
    cheap codegen'd IS NOT NULL afterwards.
    """
    udf = chunk_udf(method, max_chunk_length)
    return (
        docs.select(id_col, udf(F.col(text_col)).alias("chunks"))
        .select(id_col, F.posexplode_outer("chunks").alias("chunk_index", "chunk"))
        .filter(F.col("chunk").isNotNull())
        .select(
            id_col,
            "chunk_index",
            F.col("chunk.text").alias("text"),
            F.col("chunk.start").alias("start"),
            F.col("chunk.end").alias("end"),
        )
    )


GRANULARITIES = [("SMALL", 200), ("MEDIUM", 500), ("LARGE", 1000)]


def hierarchical_chunking(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """C5: multi-granularity chunking (ref enhanced_chunking.py:268-297).

    Runs the chunker at sizes 200/500/1000, tags text ``[SMALL-i] ...`` etc.,
    unions all — expressed as three UDF projections + unionByName so Catalyst
    sees a single scan-reuse plan.
    """
    parts = []
    for name, size in GRANULARITIES:
        chunked = chunk_documents(docs, text_col, id_col, "simple", size)
        parts.append(
            chunked.select(
                id_col,
                F.lit(name.lower()).alias("granularity"),
                "chunk_index",
                F.concat(
                    F.lit(f"[{name}-"),
                    F.col("chunk_index").cast("string"),
                    F.lit("] "),
                    F.col("text"),
                ).alias("text"),
                "start",
                "end",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def chunks_per_book(
    chars_per_book: Column, chunk_size: int = 500, overlap_ratio: float = 0.1
) -> Column:
    """C6: chunk-count estimator (ref quantization_analysis.py:188-198)."""
    effective = chunk_size * (1.0 - overlap_ratio)
    return F.ceil(chars_per_book / F.lit(effective)).cast("long")
