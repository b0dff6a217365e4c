"""Late-chunking queries (reference flagship: ``late_chunking.py``).

``late_chunking_pooling`` drives the DECLARATIVE span-mapping + pooling
operators against the fixture ``embeddings`` table as the token-embedding
source, so a DuckDB oracle can verify the whole pipeline arithmetic
end-to-end. ``late_chunking_stub`` runs the real text path (C1/word chunker
+ stub token embedder inside one shuffle-free mapInPandas).
``late_vs_traditional`` reproduces the reference's headline comparison
(``late_chunking.py:301-330`` compare_with_traditional): adjacent-chunk
cosine of span-pooled vs chunk-text embeddings, as improvement %.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import array_sum, cosine
from ..operators.chunking import chunk_documents
from ..operators.embedding import embed_udf
from ..operators.late_chunking import (
    late_chunk,
    map_spans_to_tokens,
    pool_token_spans,
)
from .relational import query, r6, t, tfan

_SEQ = 16  # tokens per document in the fixture-token harness
_CW = 120  # chunk width (chars) for the arithmetic chunk spans


@query(
    "late_chunking_pooling",
    f"""
    WITH d AS (
      SELECT doc_id, CAST(length(text) AS BIGINT) AS doc_len
      FROM documents WHERE length(text) > 0),
    ch AS (
      SELECT doc_id, doc_len, chunk_index,
             chunk_index * {_CW} AS char_start,
             least(doc_len, (chunk_index + 1) * {_CW}) AS char_end
      FROM (SELECT doc_id, doc_len,
                   unnest(range(0, CAST(ceil(doc_len / {_CW}.0) AS BIGINT)))
                     AS chunk_index
            FROM d)),
    mapped AS (
      -- divide FIRST, then multiply: float-parity with the reference's
      -- int((char_start / doc_length) * seq_len) truncation
      SELECT doc_id, chunk_index,
             greatest(0, CAST(floor(char_start * 1.0 / doc_len * {_SEQ}) AS BIGINT))
               AS token_start,
             least({_SEQ}, greatest(
               greatest(0, CAST(floor(char_start * 1.0 / doc_len * {_SEQ}) AS BIGINT)) + 1,
               CAST(floor(char_end * 1.0 / doc_len * {_SEQ}) AS BIGINT)))
               AS token_end
      FROM ch),
    tok AS (
      SELECT d.doc_id, tt.tok_idx,
             (d.doc_id * 31 + tt.tok_idx) % (SELECT count(*) FROM embeddings)
               AS vec_id
      FROM d CROSS JOIN
           (SELECT unnest(range(0, {_SEQ})) AS tok_idx) tt),
    elem AS (
      SELECT tok.doc_id, tok.tok_idx,
             unnest(e.embedding) AS v,
             generate_subscripts(e.embedding, 1) AS dpos
      FROM tok JOIN embeddings e USING (vec_id)),
    per_dim AS (
      SELECT m.doc_id, m.chunk_index, m.token_start, m.token_end, el.dpos,
             avg(el.v) AS pv, count(DISTINCT el.tok_idx) AS nt
      FROM mapped m
      JOIN elem el ON el.doc_id = m.doc_id
        AND el.tok_idx >= m.token_start AND el.tok_idx < m.token_end
      GROUP BY 1, 2, 3, 4, 5)
    SELECT doc_id, chunk_index, token_start, token_end,
           max(nt) AS n_tokens,
           round(avg(pv), 6) + 0.0 AS pooled_mean,  -- +0.0 folds -0.0 to 0.0
           round(max(CASE WHEN dpos = 1 THEN pv END), 6) + 0.0 AS pooled_first
    FROM per_dim
    GROUP BY doc_id, chunk_index, token_start, token_end
    """,
)
def late_chunking_pooling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-pooled late chunking, oracle-checked end-to-end: fixed-width
    chunk spans -> the reference's proportional char->token mapping
    (late_chunking.py:252-256) -> mean pooling over a token-embedding table
    (fixture ``embeddings`` rows assigned by (doc_id*31+tok_idx) mod N)."""
    docs = (
        tfan(spark, sf_dir, "documents")
        .select("doc_id", F.length("text").cast("long").alias("doc_len"))
        .filter(F.col("doc_len") > 0)
    )
    emb = t(spark, sf_dir, "embeddings")
    n_emb = emb.agg(F.count("*").alias("_n_emb"))

    tokens = (
        docs.crossJoin(F.broadcast(n_emb))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0).cast("long"), F.lit(_SEQ - 1).cast("long"))).alias(
                "tok_idx"
            ),
            "_n_emb",
        )
        .withColumn(
            "vec_id", F.pmod(F.col("doc_id") * 31 + F.col("tok_idx"), F.col("_n_emb"))
        )
        .join(emb.select("vec_id", "embedding"), "vec_id")
        .select("doc_id", "tok_idx", "embedding")
    )

    chunks = (
        docs.select(
            "doc_id",
            "doc_len",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    (F.ceil(F.col("doc_len") / F.lit(float(_CW))) - 1).cast("long"),
                )
            ).alias("chunk_index"),
        )
        .withColumn("char_start", F.col("chunk_index") * _CW)
        .withColumn(
            "char_end", F.least(F.col("doc_len"), (F.col("chunk_index") + 1) * _CW)
        )
    )
    mapped = map_spans_to_tokens(chunks, seq_len=F.lit(_SEQ))
    pooled = pool_token_spans(mapped, tokens)
    return pooled.select(
        "doc_id",
        "chunk_index",
        "token_start",
        "token_end",
        "n_tokens",
        (
            r6(array_sum(F.col("embedding")) / F.size("embedding"))
            + F.lit(0.0)  # folds IEEE -0.0 to 0.0, mirroring the oracle
        ).alias("pooled_mean"),
        (r6(F.element_at("embedding", 1)) + F.lit(0.0)).alias("pooled_first"),
    )


@query("late_chunking_stub")
def late_chunking_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real late-chunking text path (S11): word chunker (fixtures lack
    sentence terminators) + fixed-window stub token embedder, one
    shuffle-free mapInPandas. Rows-only — pooled vectors are pinned by
    tests/test_late_chunking.py goldens; the digest keeps columns hashable."""
    lc = late_chunk(
        tfan(spark, sf_dir, "documents"),
        method="words",
        max_chunk_length=200,
        token_chars=16,
    )
    return lc.select(
        "doc_id",
        "chunk_index",
        "char_start",
        "char_end",
        "token_start",
        "token_end",
        r6(array_sum(F.col("embedding"))).alias("emb_sum"),
        "chunking_method",
    )


@query("late_vs_traditional")
def late_vs_traditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A7 over the flagship feature: context preservation (mean adjacent-
    chunk cosine) of late-chunked pooled embeddings vs traditional
    chunk-text embeddings, with improvement % (the reference's headline
    +199.7% metric, README.md:286-291, computed by
    embedding_evaluation.py's improvement formula). Rows-only: the stub
    embedder's numbers are pinned by pytest, not meaningful as quality."""
    docs = tfan(spark, sf_dir, "documents")
    w = Window.partitionBy("doc_id").orderBy("chunk_index")

    def adjacent_mean(chunked: DataFrame, score_name: str) -> DataFrame:
        nxt = chunked.withColumn("_nxt", F.lead("embedding").over(w)).filter(
            F.col("_nxt").isNotNull()
        )
        return (
            nxt.select(
                "doc_id",
                F.coalesce(cosine(F.col("embedding"), F.col("_nxt")), F.lit(0.0)).alias(
                    "_cos"
                ),
            )
            .groupBy("doc_id")
            .agg(F.avg("_cos").alias(score_name))
        )

    late = adjacent_mean(
        late_chunk(docs, method="words", max_chunk_length=200, token_chars=16),
        "late_score",
    )
    trad = adjacent_mean(
        chunk_documents(docs, method="words", max_chunk_length=200).withColumn(
            "embedding", embed_udf()(F.col("text"))
        ),
        "trad_score",
    )
    return late.join(trad, "doc_id").select(
        "doc_id",
        r6(F.col("late_score")).alias("late_score"),
        r6(F.col("trad_score")).alias("trad_score"),
        r6(
            F.when(
                F.abs(F.col("trad_score")) > 1e-12,
                (F.col("late_score") - F.col("trad_score"))
                / F.abs(F.col("trad_score"))
                * 100.0,
            ).otherwise(F.lit(0.0))
        ).alias("improvement_pct"),
    )


@query("chunk_by_model_strategy")
def chunk_by_model_strategy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 strategy map + fallback walk (ref vector_db.py:71-129): BGE-M3
    resolves to the late-chunking strategy; output digests the pooled
    vectors so all driver-facing columns stay hashable. Rows-only —
    the walk itself is pinned by tests/test_structure_strategy.py."""
    from ..operators.strategy import chunk_with_strategy

    docs = tfan(spark, sf_dir, "documents")
    out, used = chunk_with_strategy(docs, "BAAI/bge-m3", max_chunk_length=200)
    return out.select(
        "doc_id",
        "chunk_index",
        "chunking_method",
        "token_start",
        "token_end",
        r6(array_sum(F.col("embedding"))).alias("emb_sum"),
    )
