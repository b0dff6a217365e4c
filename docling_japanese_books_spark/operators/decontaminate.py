"""Benchmark decontamination — flag corpus documents that leak evaluation
data (the GPT-3/PaLM-style exact n-gram overlap rule).

Training corpora must not contain benchmark text: the standard check
flags any document sharing at least one word n-gram (13 in the published
recipes; parameterized here) with a benchmark/heldout set. This is a
distinct op from dedup: the comparison is corpus x BENCHMARK (tiny),
never corpus x corpus.

Scale shape: the benchmark side is eval sets — thousands of documents,
megabytes — so its distinct n-gram set broadcasts, and the corpus side
is a map-only pass (tokenize -> n-grams -> broadcast-hash probe, no
shuffle of corpus data at all; the only exchange is the final distinct
over hit doc-ids, which is bounded by the contamination rate). Word
n-grams are pure column algebra (split/slice/array_join), no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_ngrams(col: Column, n: int) -> Column:
    """All word ``n``-grams (lowercased, ASCII-whitespace tokenized) as an
    array of space-joined strings; empty when the text has < n tokens."""
    toks = F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")
    cnt = F.size(toks) - F.lit(n - 1)
    # sequence(1, 0) would generate a DESCENDING [1, 0] — guard short docs
    return F.when(
        cnt >= 1,
        F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def flag_contaminated(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``docs`` + a ``contaminated`` boolean: true iff the document shares
    at least one word n-gram with any ``benchmark`` row's text.

    Idempotent on re-runs: a pre-existing ``contaminated`` column (e.g. a
    previously flagged corpus) is dropped and recomputed — otherwise the
    post-join column reference would be ambiguous."""
    docs = docs.drop("contaminated")
    # deliberately NOT distinct: the trailing distinct over hit doc-ids
    # already dedups, and skipping it keeps the whole gram stream free of
    # hash exchanges (the benchmark-side distinct was the only shuffle)
    bench_grams = benchmark.select(
        F.explode(word_ngrams(F.col(text_col), n)).alias("_gram")
    )
    doc_grams = docs.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("_gram")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "_gram")
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return (
        docs.join(hits, id_col, "left")
        .withColumn("contaminated", F.coalesce(F.col("contaminated"), F.lit(False)))
    )
