"""Byte-identical chunker parity vs reference-behavior goldens (C1/C2/C3).

Goldens in fixtures/chunker_goldens.json were produced by executing the
reference's own pure functions (see gen_goldens.py). Every chunk string and
span must match exactly.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from docling_japanese_books_spark.operators.chunking import (
    enhanced_chunk_document,
    simple_sentence_chunker,
    simple_traditional_chunking,
)

FIXTURES = json.loads(
    (Path(__file__).parent / "fixtures" / "chunker_goldens.json").read_text()
)
INPUTS = FIXTURES["inputs"]
GOLDENS = FIXTURES["goldens"]


@pytest.mark.parametrize(
    "case", GOLDENS, ids=[f"{g['input']}-{g['max_len']}" for g in GOLDENS]
)
def test_c1_simple_sentence_chunker(case):
    doc = INPUTS[case["input"]]
    chunks, spans = simple_sentence_chunker(doc, case["max_len"])
    assert chunks == case["c1_chunks"]
    assert [list(s) for s in spans] == case["c1_spans"]


@pytest.mark.parametrize(
    "case", GOLDENS, ids=[f"{g['input']}-{g['max_len']}" for g in GOLDENS]
)
def test_c2_enhanced_chunker(case):
    doc = INPUTS[case["input"]]
    chunks, spans = enhanced_chunk_document(doc, case["max_len"])
    assert chunks == case["c2_chunks"]
    assert [list(s) for s in spans] == case["c2_spans"]


@pytest.mark.parametrize(
    "case", GOLDENS, ids=[f"{g['input']}-{g['max_len']}" for g in GOLDENS]
)
def test_c3_traditional_chunker(case):
    doc = INPUTS[case["input"]]
    assert simple_traditional_chunking(doc, case["max_len"]) == case["c3_chunks"]


def test_c1_invariants():
    doc = INPUTS["jp_sample"]
    chunks, spans = simple_sentence_chunker(doc, 500)
    assert len(chunks) == len(spans)
    assert all(isinstance(c, str) and c for c in chunks)
    assert spans[-1][1] == len(doc)
    assert all(len(c) > 0 for c in chunks)
