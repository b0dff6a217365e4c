"""Real BPE (operators/bpe.py): the published algorithm's worked example,
encode invariants, the distributed word-count step, and the Spark path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_japanese_books_spark.operators.bpe import (
    EOW,
    bpe_encode_udf,
    bpe_word,
    encode_corpus,
    learn_merges,
    train_bpe,
    word_counts,
)

# the Sennrich et al. (2016) worked vocabulary
SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_learn_merges_sennrich_example():
    """Hand-derived first merges on the paper's vocabulary:
    ('e','s') at freq 9 (lex tiebreak over ('s','t</w>')), then
    ('es','t</w>') at 9, then ('l','o') at 7."""
    merges = learn_merges(SENNRICH, 3)
    assert merges == [("e", "s"), ("es", "t" + EOW), ("l", "o")]


def test_bpe_word_encoding_and_invariants():
    merges = learn_merges(SENNRICH, 10)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    for word in ("low", "lower", "newest", "widest", "lowest", "news"):
        toks = bpe_word(word, ranks)
        # tokens always reassemble the word exactly (with the EOW marker)
        assert "".join(toks) == word + EOW
    # more merges never increase the token count
    prev = None
    for k in (0, 2, 4, 8):
        ranks_k = {tuple(m): i for i, m in enumerate(merges[:k])}
        n = len(bpe_word("newest", ranks_k))
        if prev is not None:
            assert n <= prev
        prev = n
    # a fully merged frequent word collapses to one token
    assert bpe_word("newest", ranks) == ["newest" + EOW]


def test_word_counts_distributed_matches_local(spark):
    texts = ["the cat sat", "the cat", "THE dog  ran", ""]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = word_counts(df, max_words=10)
    import collections

    exp = collections.Counter(
        w for t in texts for w in t.lower().split()
    )
    assert dict(got) == dict(exp)
    # ordering: count desc, then word asc (deterministic truncation)
    assert got[0] == ("the", 3)
    assert got == sorted(got, key=lambda kv: (-kv[1], kv[0]))


def test_encode_corpus_spark_path(spark):
    docs = spark.createDataFrame(
        [(1, "newest widest low"), (2, ""), (3, "low low low")],
        "doc_id long, text string",
    )
    merges = learn_merges(SENNRICH, 10)
    out = {r.doc_id: r for r in encode_corpus(docs, merges).collect()}
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    exp1 = [
        t for w in "newest widest low".split() for t in bpe_word(w, ranks)
    ]
    assert out[1].tokens == exp1 and out[1].n_tokens == len(exp1)
    assert out[2].n_tokens == 0 and out[2].tokens == []
    assert out[3].tokens == bpe_word("low", ranks) * 3

    # one Arrow stage, no shuffle (the 100 TB map shape)
    plan = (
        encode_corpus(docs, merges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan


def test_train_bpe_end_to_end(spark):
    rows = [(w + " ") * n for w, n in SENNRICH]
    df = spark.createDataFrame([(1, " ".join(rows))], "doc_id long, text string")
    merges = train_bpe(df, n_merges=3)
    assert merges == [("e", "s"), ("es", "t" + EOW), ("l", "o")]


def test_unicode_words():
    merges = learn_merges([("日本語", 5), ("日本", 3)], 4)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    toks = bpe_word("日本語", ranks)
    assert "".join(toks) == "日本語" + EOW
