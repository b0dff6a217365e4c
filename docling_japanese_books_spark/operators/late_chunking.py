"""S11/late-chunking: span-pooled chunk embeddings (the reference's headline
feature, claimed +199.7% avg JP query-matching quality).

Reference flow (``late_chunking.py:138-213`` token embeddings,
``:244-269`` char->token mapping + pooling, ``:271-301`` process_document):

1. chunk the document with char spans (C1 ``simple_sentence_chunker``,
   ``late_chunking.py:73-136``);
2. embed the ENTIRE document at token level (one vector per token,
   full-document context — ``document_to_token_embeddings``);
3. map each chunk's char span to a token span PROPORTIONALLY
   (``late_chunking.py:252-256``): ``token_start = int(char_start /
   doc_length * seq_len)``, ``token_end = min(seq_len, max(token_start + 1,
   int(char_end / doc_length * seq_len)))``;
4. mean- (or max-) pool the token vectors inside the span into the chunk
   embedding (``late_chunking.py:260-268``).

Per the north rule the correctness invariant is text, not model weights, so
the deterministic stand-in for the model's token embedder is fixed-width
character windows run through the hash-projection stub
(``operators/embedding.py``) — same shapes, same span math, zero RNG.

Two Spark surfaces:

- ``late_chunk(docs)``: the REAL text path as one Arrow-batched
  ``mapInPandas`` — chunker, token windows, span mapping, and pooling are
  all per-document local, so the operator is shuffle-free and scales
  embarrassingly (the exact shape a 100 TB embed pass needs).
- ``map_spans_to_tokens`` + ``pool_token_spans``: the span-mapping
  arithmetic and pooling as DECLARATIVE column algebra over any
  (doc, tok_idx, embedding) token table — this is the piece a SQL oracle
  can check end-to-end, and the composition point for a real token-embedding
  service writing a tokens table.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .chunking import _CHUNKERS  # simple / enhanced / words — single registry
from .embedding import DEFAULT_DIM, embed_text


# ---------------------------------------------------------------------------
# pure-Python core (pytest goldens + the pandas UDF share this)
# ---------------------------------------------------------------------------


def map_span_to_tokens(
    char_start: int, char_end: int, doc_length: int, seq_len: int
) -> Tuple[int, int]:
    """Proportional char->token span mapping, exactly the reference's
    arithmetic (late_chunking.py:252-256): truncating division, then clamp
    to [0, seq_len] with a guaranteed non-empty span."""
    token_start = int((char_start / doc_length) * seq_len)
    token_end = int((char_end / doc_length) * seq_len)
    token_start = max(0, token_start)
    token_end = min(seq_len, max(token_start + 1, token_end))
    return token_start, token_end


def late_chunk_document(
    document: str,
    max_chunk_length: int = 500,
    token_chars: int = 16,
    dim: int = DEFAULT_DIM,
    pooling: str = "mean",
    method: str = "simple",
) -> List[dict]:
    """Late-chunk one document with the stub token embedder.

    Tokens are fixed-width ``token_chars``-character windows; token i's
    vector is ``embed_text(document[i*w:(i+1)*w])``. Returns one record per
    chunk: chunk_index, text, char span, token span, pooled embedding."""
    if pooling not in ("mean", "max"):
        raise ValueError(f"Unsupported pooling strategy: {pooling}")
    doc_length = len(document)
    if doc_length == 0:
        return []
    chunks, spans = _CHUNKERS[method](document, max_chunk_length)
    if not chunks:
        return []
    seq_len = max(1, math.ceil(doc_length / token_chars))
    token_vecs = np.stack(
        [
            embed_text(document[i * token_chars : (i + 1) * token_chars], dim)
            for i in range(seq_len)
        ]
    )
    out = []
    for idx, (text, (cs, ce)) in enumerate(zip(chunks, spans)):
        ts, te = map_span_to_tokens(cs, ce, doc_length, seq_len)
        window = token_vecs[ts:te]
        pooled = window.mean(axis=0) if pooling == "mean" else window.max(axis=0)
        out.append(
            dict(
                chunk_index=idx,
                text=text,
                char_start=cs,
                char_end=ce,
                token_start=ts,
                token_end=te,
                embedding=pooled.astype(np.float32).tolist(),
            )
        )
    return out


# ---------------------------------------------------------------------------
# Spark surface 1: shuffle-free mapInPandas over documents
# ---------------------------------------------------------------------------


def late_chunk(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_chunk_length: int = 500,
    token_chars: int = 16,
    dim: int = DEFAULT_DIM,
    pooling: str = "mean",
    method: str = "simple",
) -> DataFrame:
    """Documents -> one row per late chunk with its span-pooled embedding.

    Plan shape: scan -> mapInPandas (Arrow batches) — per-document work
    only, NO shuffle; at cluster scale this is a pure map stage that
    parallelizes to any executor count. ``chunking_method`` is tagged
    'late' for the sink variant (S11, ref vector_db.py chunking_method)."""
    id_field = docs.schema[id_col]
    schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType, True),
            T.StructField("chunk_index", T.IntegerType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("char_start", T.LongType(), True),
            T.StructField("char_end", T.LongType(), True),
            T.StructField("token_start", T.LongType(), True),
            T.StructField("token_end", T.LongType(), True),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
            T.StructField("chunking_method", T.StringType(), True),
        ]
    )
    cols = [f.name for f in schema.fields]

    def op(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                for rec in late_chunk_document(
                    text or "",
                    max_chunk_length=max_chunk_length,
                    token_chars=token_chars,
                    dim=dim,
                    pooling=pooling,
                    method=method,
                ):
                    rows.append(
                        (
                            did,
                            rec["chunk_index"],
                            rec["text"],
                            rec["char_start"],
                            rec["char_end"],
                            rec["token_start"],
                            rec["token_end"],
                            rec["embedding"],
                            "late",
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, text_col).mapInPandas(op, schema)


# ---------------------------------------------------------------------------
# Spark surface 2: declarative span mapping + pooling over a token table
# ---------------------------------------------------------------------------


def token_span_cols(
    char_start: Column, char_end: Column, doc_length: Column, seq_len: Column
) -> Tuple[Column, Column]:
    """The reference's proportional mapping as column algebra (floor ==
    int() truncation for non-negative operands).

    Operation ORDER matters for float parity with the Python/reference
    arithmetic: int((cs / dl) * seq) divides FIRST — e.g. cs=29, dl=100,
    seq=100 gives int(28.999...) = 28, while floor(cs * seq / dl) = 29.
    The column expression (and the SQL oracles) must divide first too."""
    ts = F.greatest(
        F.lit(0), F.floor((char_start / doc_length) * seq_len)
    ).cast("long")
    te = F.least(
        seq_len.cast("long"),
        F.greatest(
            ts + 1, F.floor((char_end / doc_length) * seq_len).cast("long")
        ),
    )
    return ts, te


def map_spans_to_tokens(
    chunks: DataFrame,
    seq_len: Column,
    doc_length_col: str = "doc_len",
    char_start_col: str = "char_start",
    char_end_col: str = "char_end",
) -> DataFrame:
    """Adds token_start/token_end to a chunk-span frame."""
    ts, te = token_span_cols(
        F.col(char_start_col),
        F.col(char_end_col),
        F.col(doc_length_col),
        seq_len,
    )
    return chunks.withColumn("token_start", ts).withColumn("token_end", te)


def pool_token_spans(
    chunks: DataFrame,
    tokens: DataFrame,
    id_col: str = "doc_id",
    tok_idx_col: str = "tok_idx",
    vec_col: str = "embedding",
    pooling: str = "mean",
) -> DataFrame:
    """Pool token vectors into chunk embeddings, fully declaratively.

    chunks: (id, chunk_index, token_start, token_end [, ...])
    tokens: (id, tok_idx, embedding)

    Plan: equi-join on the doc id with a range predicate on tok_idx, then
    posexplode the vector and aggregate per (id, chunk, dim) — both
    shuffles key on well-distributed compound keys, and the join's
    fan-out is bounded by tokens-per-chunk (spans are near-disjoint by
    construction). Output: (id, chunk_index, token_start, token_end,
    n_tokens, embedding)."""
    agg = F.avg if pooling == "mean" else F.max
    c = chunks.select(
        F.col(id_col), "chunk_index", "token_start", "token_end"
    ).alias("c")
    tk = tokens.alias("t")
    joined = c.join(
        tk,
        (F.col(f"c.{id_col}") == F.col(f"t.{id_col}"))
        & (F.col(f"t.{tok_idx_col}") >= F.col("c.token_start"))
        & (F.col(f"t.{tok_idx_col}") < F.col("c.token_end")),
    ).select(
        F.col(f"c.{id_col}").alias(id_col),
        "chunk_index",
        "token_start",
        "token_end",
        F.col(f"t.{tok_idx_col}").alias("_tok"),
        F.posexplode(F.col(f"t.{vec_col}")).alias("_d", "_v"),
    )
    per_dim = joined.groupBy(
        id_col, "chunk_index", "token_start", "token_end", "_d"
    ).agg(
        agg("_v").alias("_pv"),
        F.count_distinct("_tok").alias("_nt"),
    )
    pooled = per_dim.groupBy(id_col, "chunk_index", "token_start", "token_end").agg(
        F.max("_nt").alias("n_tokens"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("_d", "_pv"))), lambda s: s["_pv"]
        ).alias("embedding"),
    )
    # left-join back so a chunk whose span matched NO tokens (e.g. the
    # embedding service emitted fewer tokens than the assumed seq_len) is
    # still present — visibly, with n_tokens=0 and a null vector — instead
    # of silently disappearing from the output
    keys = [id_col, "chunk_index", "token_start", "token_end"]
    return (
        c.join(pooled, keys, "left")
        .select(
            *keys,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "embedding",
        )
    )
