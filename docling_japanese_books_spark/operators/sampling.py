"""Dataset-assembly operators for training pipelines: deterministic
splits, stratified sampling, and fixed-budget sequence packing.

None of these exist in the reference (it embeds whole corpora); they are
the standard operations between a curated corpus and a training run, built
Spark-first:

- ``hash_split``: train/val/test assignment as a PURE FUNCTION of the id
  (first 32 md5 bits of the id string, bucketed) — stable under reruns,
  repartitioning, and cluster size, unlike ``randomSplit`` which depends
  on partition layout. md5 is chosen because every engine reproduces it
  bit-for-bit (DuckDB-checkable); xxhash64 would be faster but is
  Spark-specific.
- ``stratified_sample``: per-stratum deterministic downsampling by the
  same hash trick (keep a row iff its hash bucket < fraction * buckets).
- ``pack_sequences``: greedy bin-packing of chunks into fixed-token
  training sequences, per document (so packing is embarrassingly parallel
  and reproducible; cross-document packing would need a global shuffle for
  marginal density gains).
"""

from __future__ import annotations

from typing import Dict, List

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BUCKETS = 1_000_000


def _hash_bucket(id_col: Column) -> Column:
    """Stable bucket in [0, 1e6): first 32 md5 bits of the id as a string
    (DuckDB mirror: CAST('0x' || substr(md5(id), 1, 8) AS BIGINT) % 1e6)."""
    h32 = F.conv(
        F.substring(F.md5(id_col.cast("string").cast("binary")), 1, 8), 16, 10
    ).cast("long")
    return h32 % _BUCKETS


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: Dict[str, float] = None,
    split_col: str = "split",
) -> DataFrame:
    """Adds a split label ('train'/'val'/'test' by default, 98/1/1).

    Assignment is id-deterministic: the same document lands in the same
    split on every run, any cluster, any partitioning — the property that
    keeps eval sets uncontaminated across pipeline re-executions."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    bucket = _hash_bucket(F.col(id_col))
    expr = None
    acc = 0.0
    for name, w in weights.items():
        acc += w / total
        cond = bucket < int(round(acc * _BUCKETS))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    # float rounding can leave the last boundary a hair short of _BUCKETS
    last = list(weights)[-1]
    return df.withColumn(split_col, expr.otherwise(F.lit(last)))


def stratified_sample(
    df: DataFrame,
    fractions: Dict[str, float],
    stratum_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its id's hash
    bucket falls under the stratum's fraction. Unlike ``sampleBy`` the
    result is reproducible row-for-row across runs and engines."""
    bucket = _hash_bucket(F.col(id_col))
    keep = None
    for stratum, frac in fractions.items():
        cond = (F.col(stratum_col) == stratum) & (
            bucket < int(round(frac * _BUCKETS))
        )
        keep = cond if keep is None else keep | cond
    return df.filter(keep)


PACKED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("seq_index", T.IntegerType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("n_tokens", T.IntegerType(), True),
        T.StructField("n_chunks", T.IntegerType(), True),
    ]
)


def pack_chunks(
    texts: List[str], token_counts: List[int], budget: int
) -> List[dict]:
    """Greedy first-fit packing of ordered chunks into <= budget-token
    sequences; an oversized single chunk becomes its own sequence (never
    split — span integrity beats density)."""
    seqs: List[dict] = []
    cur_texts: List[str] = []
    cur_tokens = 0
    for text, n in zip(texts, token_counts):
        if cur_texts and cur_tokens + n > budget:
            seqs.append(
                dict(
                    seq_index=len(seqs),
                    text="\n\n".join(cur_texts),
                    n_tokens=cur_tokens,
                    n_chunks=len(cur_texts),
                )
            )
            cur_texts, cur_tokens = [], 0
        cur_texts.append(text)
        cur_tokens += n
    if cur_texts:
        seqs.append(
            dict(
                seq_index=len(seqs),
                text="\n\n".join(cur_texts),
                n_tokens=cur_tokens,
                n_chunks=len(cur_texts),
            )
        )
    return seqs


def pack_sequences(
    chunks: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    order_col: str = "chunk_index",
    text_col: str = "text",
) -> DataFrame:
    """Chunks -> fixed-budget training sequences, packed per document with
    ``applyInPandas`` (each doc's chunks are already co-located after the
    group shuffle; packing is sequential within a doc by design — order
    matters). Token counts are whitespace tokens; swap a tokenizer UDF in
    upstream for BPE budgets."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        texts = [t or "" for t in pdf[text_col]]
        counts = [len(t.split()) for t in texts]
        seqs = pack_chunks(texts, counts, budget)
        did = pdf[id_col].iloc[0] if len(pdf) else None
        return pd.DataFrame(
            [
                (did, s["seq_index"], s["text"], s["n_tokens"], s["n_chunks"])
                for s in seqs
            ],
            columns=["doc_id", "seq_index", "text", "n_tokens", "n_chunks"],
        )

    return chunks.groupBy(id_col).applyInPandas(pack, PACKED_SCHEMA)
