"""Dataset-assembly queries: deterministic splits, stratified sampling,
sequence packing — the corpus -> training-run operators (task brief;
absent from the reference, which embeds whole corpora)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import hash_split, pack_sequences, stratified_sample
from .relational import query, t

_B = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000000"


@query(
    "doc_hash_split",
    f"""
    SELECT doc_id,
           CASE WHEN {_B} < 980000 THEN 'train'
                WHEN {_B} < 990000 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def doc_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 98/1/1 train/val/test split: a pure function of the
    document id (md5-prefix bucket), so assignment is identical across
    runs, partitionings, and engines — the anti-contamination property
    randomSplit lacks. Oracle reproduces the bucket arithmetic exactly."""
    docs = t(spark, sf_dir, "documents").select("doc_id")
    return hash_split(docs)


@query(
    "doc_stratified_sample",
    f"""
    SELECT doc_id, CAST(doc_id % 3 AS VARCHAR) AS stratum
    FROM documents
    WHERE ({_B} < CASE CAST(doc_id % 3 AS VARCHAR)
                  WHEN '0' THEN 500000
                  WHEN '1' THEN 200000
                  ELSE 1000000 END)
    """,
)
def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum downsampling (0.5 / 0.2 / 1.0 across three
    synthetic strata): keep a row iff its id's hash bucket falls under the
    stratum's fraction — reproducible row-for-row, unlike sampleBy."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 3).cast("string").alias("stratum")
    )
    return stratified_sample(
        docs, {"0": 0.5, "1": 0.2, "2": 1.0}, stratum_col="stratum"
    )


@query("chunk_pack_sequences")
def chunk_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy fixed-budget sequence packing over word chunks (training-run
    assembly). Rows-only: the sequential first-fit packing is pinned by
    tests/test_sampling.py; digest columns keep the output hashable."""
    from ..operators.chunking import chunk_documents

    chunks = chunk_documents(
        t(spark, sf_dir, "documents"), method="words", max_chunk_length=120
    )
    packed = pack_sequences(chunks, budget=64)
    return packed.select(
        "doc_id",
        "seq_index",
        "n_tokens",
        "n_chunks",
        F.sha2("text", 256).alias("text_sha"),
    )
