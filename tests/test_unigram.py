"""Unigram-LM tokenizer (operators/unigram.py): hand-computed EM lattice,
Viterbi determinism, CJK behavior, and the distributed train/encode path."""

from __future__ import annotations

import math

import pytest

from docling_japanese_books_spark.operators.unigram import (
    UNK,
    em_step,
    learn_unigram,
    seed_vocab,
    viterbi_word,
)


def test_seed_vocab_substring_counts():
    probs = seed_vocab([("ab", 4), ("a", 2), ("b", 2)], seed_size=10,
                       max_piece_len=2)
    # substring counts: a=6, b=6, ab=4, total 16
    assert probs["a"] == pytest.approx(6 / 16)
    assert probs["b"] == pytest.approx(6 / 16)
    assert probs["ab"] == pytest.approx(4 / 16)


def test_em_step_matches_hand_computed_forward_backward():
    counts = [("ab", 4), ("a", 2), ("b", 2)]
    probs = {"a": 0.375, "b": 0.375, "ab": 0.25}
    new = em_step(counts, probs, max_piece_len=2)
    # word "ab": Z = p(ab) + p(a)p(b) = 0.390625
    #   P([ab]) = .25/.390625 = 0.64, P([a,b]) = 0.36
    # expected: ab = 4*.64 = 2.56; a = 4*.36 + 2 = 3.44; b = 3.44; Z=9.44
    assert new["ab"] == pytest.approx(2.56 / 9.44)
    assert new["a"] == pytest.approx(3.44 / 9.44)
    assert new["b"] == pytest.approx(3.44 / 9.44)


def test_viterbi_prefers_whole_piece_when_likelier():
    lp = {k: math.log(v) for k, v in
          {"a": 0.3, "b": 0.3, "ab": 0.25}.items()}
    # log p(ab) = -1.386 > log p(a)+log p(b) = -2.41
    assert viterbi_word("ab", lp, 2) == ["ab"]
    # and the reverse when the pieces are likelier together
    lp2 = {k: math.log(v) for k, v in
           {"a": 0.6, "b": 0.6, "ab": 0.1}.items()}
    assert viterbi_word("ab", lp2, 2) == ["a", "b"]


def test_viterbi_unknown_chars_emit_unk():
    lp = {"a": math.log(0.5), "b": math.log(0.5)}
    assert viterbi_word("axb", lp, 2) == ["a", UNK, "b"]
    assert viterbi_word("", lp, 2) == []


def test_viterbi_concat_property():
    import random

    rng = random.Random(7)
    vocab = ["a", "b", "c", "ab", "bc", "abc", "ca"]
    lp = {p: math.log((i + 1) / 40.0) for i, p in enumerate(vocab)}
    for _ in range(100):
        w = "".join(rng.choice("abc") for _ in range(rng.randint(1, 12)))
        segs = viterbi_word(w, lp, 3)
        assert "".join(segs) == w  # all chars known: exact cover


def test_learn_unigram_keeps_frequent_multichar_and_prunes():
    counts = [("tokyo", 50), ("kyoto", 40), ("to", 30), ("a", 5)]
    model = learn_unigram(counts, vocab_size=12, max_piece_len=4,
                          em_iters=2)
    assert all(len(p) == 1 for p in model) is False  # multi-char survived
    assert "to" in model  # appears in every word, highest expected count
    n_multi = sum(1 for p in model if len(p) > 1)
    n_chars = sum(1 for p in model if len(p) == 1)
    assert n_multi <= max(0, 12 - n_chars)  # pruned to target
    # every single character of the corpus survives pruning
    assert {"t", "o", "k", "y", "a"} <= set(model)


def test_unigram_japanese_multichar_pieces(spark):
    from pyspark.sql import functions as F

    from docling_japanese_books_spark.operators.unigram import (
        encode_corpus_unigram,
        train_unigram,
    )

    # CJK runs have no whitespace: the lattice must learn 日本語 as a unit
    rows = [(i, ("日本語の文章です " * 3) + f"end{i}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = train_unigram(docs, vocab_size=40, max_piece_len=4, em_iters=2)
    assert any(len(p) > 1 and "日" in p for p in model)
    out = encode_corpus_unigram(docs, model).orderBy("doc_id").collect()
    assert out[0].n_tokens == len(out[0].tokens)
    joined = "".join(out[0].tokens)
    assert "日本語" in joined  # pieces reassemble the CJK text
    # deterministic across partitionings
    out2 = (
        encode_corpus_unigram(docs.repartition(7), model)
        .orderBy("doc_id")
        .collect()
    )
    assert [r.tokens for r in out] == [r.tokens for r in out2]


def test_viterbi_matches_bruteforce_enumeration():
    """Viterbi must find the max-probability segmentation among ALL
    segmentations — cross-checked by exhaustive enumeration on short
    words over a fixed vocabulary."""
    import math

    vocab = {"a": 0.25, "b": 0.2, "c": 0.1, "ab": 0.15, "bc": 0.12,
             "abc": 0.08, "ca": 0.06, "aa": 0.04}
    lp = {k: math.log(v) for k, v in vocab.items()}

    def all_segmentations(w):
        if not w:
            yield []
            return
        for i in range(1, len(w) + 1):
            piece = w[:i]
            if piece in vocab:
                for rest in all_segmentations(w[i:]):
                    yield [piece] + rest

    import random

    rng = random.Random(11)
    for _ in range(200):
        w = "".join(rng.choice("abc") for _ in range(rng.randint(1, 7)))
        segs = list(all_segmentations(w))
        got = viterbi_word(w, lp, max_piece_len=3)
        best = max(sum(lp[p] for p in s) for s in segs)  # never empty:
        # every single char is in the vocabulary
        assert "".join(got) == w
        assert abs(sum(lp[p] for p in got) - best) < 1e-12
