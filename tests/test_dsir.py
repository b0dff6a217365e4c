"""DSIR importance resampling (operators/dsir.py): feature hashing,
model log-probabilities, importance weights, and Gumbel-top-k selection
— each replayed exactly by an independent Python reference."""

from __future__ import annotations

import hashlib
import math
import re

from pyspark.sql import functions as F

from docling_japanese_books_spark.operators.dsir import (
    dsir_select,
    dsir_weights,
    gumbel_noise,
    hashed_ngram_buckets,
    ngram_logprob_model,
)

B = 101  # small bucket table so collisions actually occur in tests


def _bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % B


def _grams(text: str) -> list[str]:
    words = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
    return words + [f"{a} {b}" for a, b in zip(words, words[1:])]


def _model(texts: list[str]) -> dict[int, float]:
    counts: dict[int, int] = {}
    total = 0
    for t in texts:
        for g in _grams(t):
            counts[_bucket(g)] = counts.get(_bucket(g), 0) + 1
            total += 1
    return {
        b: math.log((counts.get(b, 0) + 1) / (total + B)) for b in range(B)
    }


def _docs(spark, texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return spark.createDataFrame(
        list(zip(ids, texts)), "doc_id long, text string"
    )


def test_hashed_ngram_buckets_matches_python(spark):
    texts = [
        "The quick brown fox",
        "quick-brown?fox  jumps",
        "one",
        "",
        "   ",
    ]
    got = (
        _docs(spark, texts)
        .select("doc_id", hashed_ngram_buckets(F.col("text"), B).alias("g"))
        .collect()
    )
    for r in got:
        assert r.g == [_bucket(g) for g in _grams(texts[r.doc_id])], r.doc_id
    # n tokens -> n + (n-1) grams; empty/blank -> no grams
    assert len(got[0].g) == 4 + 3
    assert got[3].g == [] and got[4].g == []


def test_ngram_logprob_model_matches_python(spark):
    texts = ["spark spark duckdb", "spark oracle"]
    want = _model(texts)
    rows = ngram_logprob_model(_docs(spark, texts), buckets=B).collect()
    assert len(rows) == B  # full bucket range, seen or not
    for r in rows:
        assert abs(r.logp - want[r.bucket]) < 1e-12, r.bucket


def test_dsir_weights_match_python(spark):
    target_texts = ["alpha beta gamma", "alpha beta beta"]
    raw_texts = [
        "alpha beta gamma delta",   # target-like
        "zip zap zorp quux",        # junk
        "alpha alpha alpha",        # partial overlap
        "",                         # no tokens -> weight 0
    ]
    lt = _model(target_texts)
    lr = _model(raw_texts)
    want = {
        i: sum(lt[_bucket(g)] - lr[_bucket(g)] for g in _grams(t))
        for i, t in enumerate(raw_texts)
    }
    raw = _docs(spark, raw_texts)
    tm = ngram_logprob_model(_docs(spark, target_texts), buckets=B)
    rm = ngram_logprob_model(raw, buckets=B)
    got = {
        r.doc_id: r.log_weight
        for r in dsir_weights(raw, tm, rm, buckets=B).collect()
    }
    assert set(got) == set(want)
    for i in want:
        assert abs(got[i] - want[i]) < 1e-9, (i, got[i], want[i])
    assert got[3] == 0.0


def test_gumbel_noise_matches_python(spark):
    ids = [0, 7, 12345]
    got = {
        r.doc_id: r.g
        for r in _docs(spark, ["x"] * 3, ids=ids)
        .select("doc_id", gumbel_noise(F.col("doc_id")).alias("g"))
        .collect()
    }
    for i in ids:
        u = (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1_000_000 + 0.5) / 1e6
        assert abs(got[i] - (-math.log(-math.log(u)))) < 1e-12


def test_dsir_select_prefers_target_like_docs(spark):
    """Plant 5 target-like docs among 45 junk docs with weights far
    apart (>> Gumbel noise scale); Gumbel-top-5 must pick exactly the
    planted ones, and identically on a second run."""
    # the target model needs enough mass that its add-one floor sits
    # BELOW the raw model's rare-gram probability (with a tiny target
    # corpus, smoothing hands junk grams a positive weight — faithful
    # DSIR behavior); 50 repeats puts target-like docs ~+100 nats and
    # junk ~-15, far beyond the Gumbel draw's ~[-2, +14] range
    target_texts = ["data selection for language models " * 50]
    raw_texts = [
        "data selection for language models via importance " * 5
        for _ in range(5)
    ] + [
        (f"junk{j} filler{j} noise{j} tokens{j} here{j} " * 5)
        for j in range(45)
    ]
    raw = _docs(spark, raw_texts)
    tm = ngram_logprob_model(_docs(spark, target_texts), buckets=B)
    rm = ngram_logprob_model(raw, buckets=B)
    scored = dsir_weights(raw, tm, rm, buckets=B)
    got1 = sorted(r.doc_id for r in dsir_select(scored, 5).collect())
    got2 = sorted(r.doc_id for r in dsir_select(scored, 5).collect())
    assert got1 == [0, 1, 2, 3, 4]
    assert got1 == got2


def test_dsir_plan_stays_jvm_side(spark):
    """No Python in any stage; both model joins broadcast; the corpus
    shuffles only on the id (the weight groupBy)."""
    raw = _docs(spark, ["alpha beta"] * 8)
    tm = ngram_logprob_model(_docs(spark, ["alpha"]), buckets=B)
    rm = ngram_logprob_model(raw, buckets=B)
    plan = (
        dsir_weights(raw, tm, rm, buckets=B)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
