"""Distributed Bloom filter (operators/bloom.py): bit-exact replication
of the md5 double-hashing construction in Python, the no-false-negative
contract, the theoretical false-positive rate, and merge algebra."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from docling_japanese_books_spark.operators.bloom import (
    bloom_build,
    bloom_merge,
    bloom_parameters,
    bloom_probe,
)

M, K = 1 << 14, 5


def _positions_py(key, m=M, k=K):
    d = hashlib.md5(str(key).encode()).hexdigest()
    h1 = int(d[0:15], 16) % m
    h2 = (int(d[16:31], 16) % m) | 1
    return [(h1 + i * h2) % m for i in range(k)]


def _bitmap_py(keys, m=M, k=K):
    words: dict[int, int] = {}
    for key in keys:
        for p in _positions_py(key, m, k):
            words[p // 64] = words.get(p // 64, 0) | (1 << (p % 64))
    # Spark's long is signed: wrap bit 63 the same way
    return {w: b - (1 << 64) if b >= (1 << 63) else b for w, b in words.items()}


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "url string")


def test_build_is_bit_exact_vs_python(spark):
    keys = [f"https://h{i}.example/p{i}" for i in range(300)]
    got = {
        r.word: r.bits
        for r in bloom_build(_keys_df(spark, keys), m_bits=M, k_hashes=K).collect()
    }
    assert got == _bitmap_py(keys)


def test_no_false_negatives(spark):
    keys = [f"u{i}" for i in range(2000)]
    df = _keys_df(spark, keys)
    filt = bloom_build(df, m_bits=M, k_hashes=K)
    out = bloom_probe(df, filt, m_bits=M, k_hashes=K)
    assert out.filter(~F.col("maybe_seen")).count() == 0


def test_false_positive_rate_near_theory(spark):
    n = 2000
    m, k = bloom_parameters(n, fpr=0.01)
    inserted = _keys_df(spark, [f"in{i}" for i in range(n)])
    fresh = _keys_df(spark, [f"out{i}" for i in range(n)])
    filt = bloom_build(inserted, m_bits=m, k_hashes=k)
    fp = (
        bloom_probe(fresh, filt, m_bits=m, k_hashes=k)
        .filter(F.col("maybe_seen"))
        .count()
    )
    assert fp / n < 0.03, (fp, m, k)


def test_merge_equals_build_of_union(spark):
    a = [f"a{i}" for i in range(150)]
    b = [f"b{i}" for i in range(150)] + a[:50]  # overlap on purpose
    fa = bloom_build(_keys_df(spark, a), m_bits=M, k_hashes=K)
    fb = bloom_build(_keys_df(spark, b), m_bits=M, k_hashes=K)
    merged = {r.word: r.bits for r in bloom_merge(fa, fb).collect()}
    direct = {
        r.word: r.bits
        for r in bloom_build(
            _keys_df(spark, a + b), m_bits=M, k_hashes=K
        ).collect()
    }
    assert merged == direct


def test_bloom_parameters_standard_sizing(spark):
    m, k = bloom_parameters(1_000_000, 0.01)
    assert 9_500_000 < m < 9_700_000  # ~9.59 bits/key at 1%
    assert k == 7
    m2, _ = bloom_parameters(1_000_000, 0.001)
    assert m2 > m  # rarer fp costs more bits
    assert bloom_parameters(0, 0.01) == (64, 1)


def test_plan_stays_jvm_side_and_partial_aggregable(spark):
    df = _keys_df(spark, [f"u{i}" for i in range(64)])
    filt = bloom_build(df, m_bits=M, k_hashes=K)
    plan = filt._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # the bit_or groupBy must map-side combine (partial aggregate)
    assert "partial_bit_or" in plan or "partial_" in plan, plan
    probe_plan = (
        bloom_probe(df, filt, m_bits=M, k_hashes=K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in probe_plan and "BatchEvalPython" not in probe_plan
