"""Learned quality classifier (operators/quality_clf.py): feature
determinism, training separability on held-out text, and the Spark
scoring path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from docling_japanese_books_spark.operators.quality_clf import (
    hash_features,
    quality_score_udf,
    scramble_words,
    self_supervised_model,
    train_quality_classifier,
)

FLUENT = [
    "the quick brown fox jumps over the lazy dog near the quiet river",
    "a spark pipeline reads the table and writes the cleaned corpus out",
    "training data quality improves when duplicated documents are removed",
    "the parser extracts main content from each page of the crawl",
    "every bucket records its lineage in the manifest after the wave",
    "language models learn better from fluent and diverse documents",
    # held-out docs RECOMBINE training bigrams (generalization carrier:
    # unigrams cancel between a doc and its scramble, bigrams decide)
    "the quick brown fox reads the table and writes the cleaned corpus",
    "training data quality improves when the parser extracts main content",
]


def test_features_deterministic_and_normalized():
    a = hash_features("the quick brown fox")
    b = hash_features("the quick brown fox")
    assert a == b and len(a) > 0
    assert abs(sum(v * v for v in a.values()) - 1.0) < 1e-9
    assert hash_features("") == {}
    # bigram sensitivity: same words, different order -> different features
    assert hash_features("alpha beta") != hash_features("beta alpha")


def test_scramble_deterministic_changes_order_not_vocab():
    t = FLUENT[0]
    s1, s2 = scramble_words(t, seed=3), scramble_words(t, seed=3)
    assert s1 == s2 and s1 != t
    assert sorted(s1.split()) == sorted(t.split())


def test_classifier_separates_heldout_fluent_from_scrambled():
    train_pos = FLUENT[:6]
    train_neg = [scramble_words(t, seed=i) for i, t in enumerate(train_pos)]
    w, b = train_quality_classifier(train_pos, train_neg, dim=1 << 14)
    # determinism
    w2, b2 = train_quality_classifier(train_pos, train_neg, dim=1 << 14)
    assert np.array_equal(w, w2) and b == b2

    def score(t):
        f = hash_features(t, 1 << 14)
        z = b + sum(w[k] * v for k, v in f.items())
        return 1.0 / (1.0 + np.exp(-z))

    # held-out fluent docs outscore their scrambled twins
    for i, t in enumerate(FLUENT[6:]):
        assert score(t) > score(scramble_words(t, seed=100 + i))
    # training pairs are cleanly separated
    for t, n in zip(train_pos, train_neg):
        assert score(t) > 0.5 > score(n)


def test_spark_scoring_path(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w, b = self_supervised_model(docs, sample_size=60, dim=1 << 14)
    sample = docs.orderBy("doc_id").limit(20).select(
        "doc_id",
        F.col("text"),
    )
    scored = sample.select(
        "doc_id",
        quality_score_udf(w, b, 1 << 14)(F.col("text")).alias("p"),
    )
    rows = {r.doc_id: r.p for r in scored.collect()}
    assert all(0.0 <= p <= 1.0 for p in rows.values())
    # the corpus's own (training-distribution) docs score as fluent
    assert sum(p > 0.5 for p in rows.values()) >= 15

    # scrambled twins of the same docs score lower on average
    from docling_japanese_books_spark.operators.quality_clf import scramble_words

    texts = [r.text for r in sample.collect()]
    scr = spark.createDataFrame(
        [(i, scramble_words(t, seed=i)) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    scr_rows = [
        r.p
        for r in scr.select(
            quality_score_udf(w, b, 1 << 14)(F.col("text")).alias("p")
        ).collect()
    ]
    assert np.mean(list(rows.values())) > np.mean(scr_rows)
