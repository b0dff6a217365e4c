"""Rows-only queries: chunkers, normalizer, embedding — operators whose
semantics a SQL oracle can't express (driver records rows-only checks;
byte-level parity is covered by the pytest golden fixtures instead)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.chunking import chunk_documents, hierarchical_chunking
from ..operators.embedding import embed_udf
from ..operators.normalize import normalize_cjk_udf
from .relational import query, r6, t, tfan
from ..functions.vectors import cosine


@query("chunk_simple")
def chunk_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 chunker over the documents table (ref late_chunking.py:73-136)."""
    # r8: fanned scan (tfan) — chunker UDF parallelizes (0.87 s -> 0.54 s
    # at sf1.0); same for the sibling chunk queries below.
    return chunk_documents(
        tfan(spark, sf_dir, "documents"), method="simple", max_chunk_length=500
    )


@query("chunk_enhanced")
def chunk_enhanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 enhanced chunker (ref enhanced_chunking.py:112-174)."""
    return chunk_documents(
        tfan(spark, sf_dir, "documents"), method="enhanced", max_chunk_length=500
    )


@query("chunk_traditional")
def chunk_traditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 traditional chunker (ref embedding_evaluation.py:640-665)."""
    return chunk_documents(
        tfan(spark, sf_dir, "documents"), method="traditional", max_chunk_length=500
    )


@query("chunk_words")
def chunk_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-boundary fallback chunker (C7 fallback-chain spirit) — the one
    that applies to terminator-less web text."""
    return chunk_documents(
        tfan(spark, sf_dir, "documents"), method="words", max_chunk_length=200
    )


@query("chunk_hierarchical")
def chunk_hierarchical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 multi-granularity chunking (ref enhanced_chunking.py:268-297)."""
    return hierarchical_chunking(tfan(spark, sf_dir, "documents"))


@query("normalize_cjk")
def normalize_cjk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 NFKC normalization (north rule). Rows-only: DuckDB lacks NFKC."""
    return tfan(spark, sf_dir, "documents").select(
        "doc_id", normalize_cjk_udf(F.col("text")).alias("norm_text")
    )


@query("doc_embed_stub")
def doc_embed_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic embedding stub over documents (§2.10 item 5).

    Driver-facing projection digests the vector (dim + xxhash64 of its JSON
    rendering) because the harness canonicalizer can't sort list cells; the
    array-returning ``embed_udf`` stays the internal operator surface."""
    emb = tfan(spark, sf_dir, "documents").select(
        "doc_id", embed_udf()(F.col("text")).alias("embedding")
    )
    return emb.select(
        "doc_id",
        F.size("embedding").alias("dim"),
        F.xxhash64(F.to_json("embedding")).alias("emb_digest"),
    )


@query("doc_context_preservation")
def doc_context_preservation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 end-to-end over real text: chunk (C1) -> embed (stub) -> mean
    consecutive-chunk cosine per document (ref embedding_evaluation.py:678-692).
    The flagship pipeline: scan -> pandas UDF -> explode -> pandas UDF ->
    window -> agg, one declarative plan."""
    from pyspark.sql import Window

    chunks = chunk_documents(
        tfan(spark, sf_dir, "documents"), method="words", max_chunk_length=200
    )
    chunks = chunks.withColumn("embedding", embed_udf()(F.col("text")))
    w = Window.partitionBy("doc_id").orderBy("chunk_index")
    return (
        chunks.withColumn("nxt", F.lead("embedding").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(
            "doc_id",
            F.coalesce(cosine(F.col("embedding"), F.col("nxt")), F.lit(0.0)).alias(
                "cos"
            ),
        )
        .groupBy("doc_id")
        .agg(
            r6(F.avg("cos")).alias("context_preservation"),
            (F.count("*") + 1).alias("n_chunks"),
        )
    )
