"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"): pick
raw-corpus documents whose hashed-n-gram distribution looks like a
TARGET corpus (the published recipe behind "select web text that looks
like Wikipedia/books"), by importance weight

    log w(x) = sum_{g in grams(x)} [ log p_target(h(g)) - log p_raw(h(g)) ]

over unigram+bigram features hashed into a fixed bucket table, then
Gumbel-top-k resampling on the weights.

Spark-first shape, no Python anywhere:

- **Features** are pure column algebra: lowercase -> split on
  non-alphanumerics -> bigrams via ``zip_with`` -> md5-prefix bucket per
  gram (the same engine-portable hash the sampling/mixing operators
  use). Hashing collapses the unbounded vocabulary to ``buckets`` ids —
  the paper's trick that makes the model a FIXED-SIZE table instead of
  a corpus-sized vocabulary.
- **Models** are one grouped count over the exploded grams plus add-one
  smoothing against the full bucket range (``spark.range(buckets)``),
  so every bucket — seen or not — has a finite log-probability and the
  weight join never misses. A model is <= ``buckets`` rows: broadcast
  side by construction, whatever the corpus size.
- **Weights** are one explode + two broadcast joins + one groupBy(id)
  sum — a single corpus shuffle, partial-aggregable.
- **Selection** perturbs each weight with deterministic Gumbel noise
  (the id's md5 bucket mapped to (0,1), g = -ln(-ln(u))) and takes the
  top k: Gumbel-top-k IS sampling-without-replacement proportional to
  softmax(weights) (Gumbel-max trick), but reproducible row-for-row
  across runs/engines because the "randomness" is a hash. Top-k is a
  TakeOrdered (per-partition heads + one k-row merge), never a full
  sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import _hash_bucket

_BUCKETS_F = 1_000_000.0  # _hash_bucket's modulus, as a float


def _gram_bucket(gram: Column, buckets: int) -> Column:
    """Engine-portable bucket of one gram string: first 32 md5 bits mod
    ``buckets`` (DuckDB mirror: CAST('0x' || substr(md5(g),1,8) AS
    BIGINT) % buckets)."""
    return (
        F.conv(F.substring(F.md5(gram.cast("binary")), 1, 8), 16, 10).cast(
            "long"
        )
        % buckets
    )


def hashed_ngram_buckets(
    text: Column, buckets: int = 10_000
) -> Column:
    """array<long> of hashed unigram+bigram bucket ids for one text —
    one bucket per gram INSTANCE (a bag, not a set: DSIR weights count
    multiplicity). Tokens are maximal runs of letters/digits in the
    lowercased text; a text with n tokens yields n + (n-1) grams."""
    words = F.filter(
        F.split(F.lower(text), r"[^\p{L}\p{N}]+"), lambda w: w != ""
    )
    # zip_with pads the shorter side with nulls, so the last pair is
    # (word_n, null) -> null bigram; drop it before hashing
    bigrams = F.filter(
        F.zip_with(
            words,
            F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        lambda g: g.isNotNull(),
    )
    grams = F.concat(words, bigrams)
    return F.transform(grams, lambda g: _gram_bucket(g, buckets))


def ngram_logprob_model(
    corpus: DataFrame,
    text_col: str = "text",
    buckets: int = 10_000,
) -> DataFrame:
    """(bucket, logp): add-one-smoothed log-probability of every hash
    bucket under the corpus' unigram+bigram bag —
    ``ln((count + 1) / (total + buckets))``. Always exactly ``buckets``
    rows (unseen buckets carry the smoothed floor), so downstream joins
    are total functions and the frame broadcasts."""
    spark = corpus.sparkSession
    grams = corpus.select(
        F.explode(
            hashed_ngram_buckets(F.col(text_col), buckets)
        ).alias("bucket")
    )
    counts = grams.groupBy("bucket").agg(F.count("*").alias("_c"))
    total = counts.agg(
        F.coalesce(F.sum("_c"), F.lit(0)).cast("double").alias("_n")
    )
    return (
        spark.range(buckets)
        .select(F.col("id").alias("bucket"))
        # counts is <= buckets rows post-aggregation — broadcast it
        # explicitly (fresh-aggregate stats otherwise read unknown and
        # the pre-AQE plan falls back to a sort-merge join)
        .join(F.broadcast(counts), "bucket", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            F.log(
                (F.coalesce(F.col("_c"), F.lit(0)).cast("double") + 1.0)
                / (F.col("_n") + float(buckets))
            ).alias("logp"),
        )
    )


def dsir_weights(
    raw: DataFrame,
    target_model: DataFrame,
    raw_model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
) -> DataFrame:
    """(id_col, log_weight): the DSIR importance log-weight of every raw
    document — sum over its gram instances of
    ``logp_target(bucket) - logp_raw(bucket)``. Documents with no
    tokens weigh 0. One explode + two broadcast model joins + one
    groupBy(id) — the corpus shuffles once, on the id."""
    per_gram = raw.select(
        F.col(id_col),
        F.explode_outer(
            hashed_ngram_buckets(F.col(text_col), buckets)
        ).alias("bucket"),
    )
    t = F.broadcast(
        target_model.select(
            "bucket", F.col("logp").alias("_lt")
        )
    )
    r = F.broadcast(
        raw_model.select("bucket", F.col("logp").alias("_lr"))
    )
    return (
        per_gram.join(t, "bucket", "left")
        .join(r, "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.coalesce(
                F.sum(F.col("_lt") - F.col("_lr")), F.lit(0.0)
            ).alias("log_weight")
        )
    )


def gumbel_noise(id_col: Column) -> Column:
    """Deterministic standard-Gumbel draw per id: u = (md5 bucket of the
    id + 0.5) / 1e6 in (0,1), g = -ln(-ln(u)). A hash, not an RNG — the
    same id draws the same noise on any run, partitioning, or engine."""
    u = (_hash_bucket(id_col).cast("double") + 0.5) / F.lit(_BUCKETS_F)
    return -F.log(-F.log(u))


def dsir_select(
    scored: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
) -> DataFrame:
    """Gumbel-top-k resampling over DSIR weights: keep the k rows with
    the largest ``log_weight + gumbel(id)`` — equivalent to sampling k
    documents without replacement with probability proportional to
    exp(log_weight) (the Gumbel-max trick), but fully deterministic.
    Ties on the key break by id so the result is a set, not an order.
    The limit is a TakeOrdered: per-partition top-k then one k-row
    merge — no global sort of the corpus."""
    key = (F.col(weight_col) + gumbel_noise(F.col(id_col))).alias("_key")
    return (
        scored.select("*", key)
        .orderBy(F.desc("_key"), F.asc(id_col))
        .limit(k)
        .drop("_key")
    )
