"""Product quantization (operators/quantize.py PQ section): exactness in
the codebook-covers-corpus degenerate case, reconstruction-error
monotonicity, ADC top-k vs exact L2, and null isolation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from docling_japanese_books_spark.operators.quantize import (
    pq_decode,
    pq_encode_udf,
    topk_pq_adc,
    train_pq_codebooks,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _vectors(emb, limit=64):
    rows = emb.orderBy("vec_id").limit(limit).collect()
    return (
        np.array([r.embedding for r in rows], dtype=np.float64),
        [r.vec_id for r in rows],
    )


def test_exact_when_codebook_covers_corpus(spark, emb):
    """k >= distinct subvectors -> encoding is lossless and ADC equals
    true squared L2, so PQ top-k == exact top-k."""
    x, ids = _vectors(emb, 40)
    books = train_pq_codebooks(x, m=8, k=64, n_iters=2)
    corpus = emb.filter(F.col("vec_id").isin(ids))
    codes_df = corpus.select(
        "vec_id", pq_encode_udf(books)(F.col("embedding")).alias("codes")
    )
    codes = {r.vec_id: r.codes for r in codes_df.collect()}
    recon = pq_decode(np.array([codes[i] for i in ids]), books)
    assert np.allclose(recon, x, atol=1e-6)  # lossless

    queries = emb.filter(F.col("vec_id").isin(ids[:3])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = topk_pq_adc(queries, codes_df, books, k=4).collect()
    # exact reference: squared L2 ascending, ties by id
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.adc_dist))
    for qid, rows in by_q.items():
        qv = x[ids.index(qid)]
        d = ((x - qv) ** 2).sum(axis=1)
        exact = sorted(zip(np.round(d, 6), ids))[:4]
        rows.sort()
        assert [(v, dist) for _, v, dist in rows] == [
            (v, dist) for dist, v in exact
        ]


def test_reconstruction_error_shrinks_with_k(emb):
    x, _ = _vectors(emb, 60)
    errs = []
    for k in (2, 8, 32):
        books = train_pq_codebooks(x, m=8, k=k, n_iters=4)
        codes = np.zeros((len(x), 8), dtype=np.int64)
        for s in range(8):
            sub = x[:, s * 8 : (s + 1) * 8]
            d = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = d.argmin(axis=1)
        errs.append(((pq_decode(codes, books) - x) ** 2).mean())
    assert errs[0] > errs[1] > errs[2] >= 0  # more centroids, less error


def test_training_deterministic(emb):
    x, _ = _vectors(emb, 30)
    a = train_pq_codebooks(x, m=4, k=8, n_iters=3)
    b = train_pq_codebooks(x, m=4, k=8, n_iters=3)
    assert np.array_equal(a, b)
    with pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(x, m=7)


def test_null_embeddings_isolated(spark, emb):
    x, ids = _vectors(emb, 20)
    books = train_pq_codebooks(x, m=8, k=16, n_iters=2)
    bad = spark.createDataFrame(
        [(9001, None)], "vec_id long, embedding array<float>"
    )
    corpus = (
        emb.select("vec_id", "embedding")
        .filter(F.col("vec_id").isin(ids))
        .unionByName(bad)
    )
    codes_df = corpus.select(
        "vec_id", pq_encode_udf(books)(F.col("embedding")).alias("codes")
    )
    rows = {r.vec_id: r.codes for r in codes_df.collect()}
    assert rows[9001] is None and rows[ids[0]] is not None
    queries = emb.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = topk_pq_adc(queries, codes_df, books, k=3).collect()
    assert out and all(r.vec_id != 9001 for r in out)


def test_compression_ratio():
    """The point of PQ: m one-byte codes vs dim float32s."""
    dim, m = 64, 8
    assert (dim * 4) / m == 32  # 32x smaller at the documented config
