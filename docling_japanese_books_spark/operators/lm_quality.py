"""Character-LM quality scoring — the CCNet-style perplexity filter.

The heuristic quality score (textstats.quality_score) is rule-based;
production corpus pipelines (CCNet, RefinedWeb, FineWeb) additionally
rank documents by perplexity under a language model trained on trusted
text. A real KenLM needs model artifacts this container doesn't ship, so
the same statistical machinery is built from the corpus itself: an
add-one-smoothed character TRIGRAM model trained on a trusted/benchmark
sample, scoring each document by cross-entropy

    H(doc) = -avg_i ln( (count(c_{i-2} c_{i-1} c_i) + 1)
                        / (count(c_{i-2} c_{i-1}) + V) )

(lower = more like the trusted sample; mojibake, binary spew, and
keyword-stuffing score high). Deterministic, dependency-free, and — the
point for this repo — fully ORACLE-CHECKABLE, because both training and
scoring are plain relational algebra.

Two execution paths, same numbers (the late_chunking prod/oracle-twin
pattern):

- ``lm_quality_score``: declarative — per-char trigram explode +
  broadcast joins against the (tiny) count tables + per-doc avg. The
  oracle replays it in SQL.
- ``lm_quality_score_arrow``: production — the count tables ride into an
  Arrow-batched pandas UDF as plain dicts (KBs), one vectorized pass per
  document, no row explosion: at 100 TB the declarative twin's
  explode-by-length blowup is real, the UDF path is the hot one.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

V = 256  # smoothing vocabulary size (fixed, documented constant)


def _trigrams(col: Column) -> Column:
    """Every trigram occurrence (with multiplicity, unlike the dedup
    helper's distinct shingles); empty for texts shorter than 3 chars."""
    n = F.length(col)
    return F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2), lambda i: col.substr(i, F.lit(3))
        ),
    ).otherwise(F.array().cast("array<string>"))


def train_trigram_counts(
    trusted: DataFrame, text_col: str = "text"
) -> Tuple[DataFrame, DataFrame]:
    """(trigram counts, bigram-prefix counts) from the trusted sample —
    two small aggregates (the sample is bounded by construction)."""
    grams = trusted.select(
        F.explode(_trigrams(F.col(text_col))).alias("gram")
    )
    tri = grams.groupBy("gram").agg(F.count("*").alias("n3"))
    bi = (
        tri.groupBy(F.substring("gram", 1, 2).alias("prefix"))
        .agg(F.sum("n3").alias("n2"))
    )
    return tri, bi


def lm_quality_score(
    docs: DataFrame,
    tri: DataFrame,
    bi: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Declarative scoring: (id_col, lm_score) with lm_score = trigram
    cross-entropy (0.0 for docs shorter than 3 chars)."""
    grams = docs.select(
        F.col(id_col), F.explode(_trigrams(F.col(text_col))).alias("gram")
    )
    scored = (
        grams.join(F.broadcast(tri), "gram", "left")
        .withColumn("prefix", F.substring("gram", 1, 2))
        .join(F.broadcast(bi), "prefix", "left")
        .withColumn(
            "_logp",
            F.log(
                (F.coalesce(F.col("n3"), F.lit(0)) + 1).cast("double")
                / (F.coalesce(F.col("n2"), F.lit(0)) + V).cast("double")
            ),
        )
        .groupBy(id_col)
        .agg((-F.avg("_logp")).alias("lm_score"))
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .withColumn("lm_score", F.coalesce(F.col("lm_score"), F.lit(0.0)))
    )


def lm_quality_score_arrow(
    docs: DataFrame,
    tri: DataFrame,
    bi: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Production scoring path: identical numbers, one Arrow-batched pass,
    no per-char row explosion. The count tables collect to plain dicts
    (bounded: the trusted sample's distinct trigrams) and ride the UDF
    closure."""
    tri_map = {r["gram"]: int(r["n3"]) for r in tri.collect()}
    bi_map = {r["prefix"]: int(r["n2"]) for r in bi.collect()}

    @F.pandas_udf(T.DoubleType())
    def score(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            if not text or len(text) < 3:
                out.append(0.0)
                continue
            logps = [
                math.log(
                    (tri_map.get(text[i : i + 3], 0) + 1)
                    / (bi_map.get(text[i : i + 2], 0) + V)
                )
                for i in range(len(text) - 2)
            ]
            out.append(-sum(logps) / len(logps))
        return pd.Series(out, dtype="float64")

    return docs.select(F.col(id_col), score(F.col(text_col)).alias("lm_score"))
