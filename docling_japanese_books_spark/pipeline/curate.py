"""Training-corpus curation: the end-to-end post-extraction pass that turns
raw extracted pages into an LLM-training-ready corpus.

    extracted pages
      -> NFKC normalization (X12)
      -> language id + quality scoring (textstats)
      -> quality gate
      -> exact dedup (sha256 of normalized text, lowest url wins)
      -> near-dup removal (MinHash LSH, keep lexicographically-first url)
      -> curated corpus + per-stage survival report

Every stage is a DataFrame transform; the report is a tiny aggregate over
stage tags, so the whole thing is one job with two shuffles (the two dedup
key exchanges) regardless of corpus size.
"""

from __future__ import annotations

from dataclasses import dataclass


from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import minhash_lsh_candidates
from ..operators.normalize import normalize_cjk_udf
from ..operators.textstats import lang_id, quality_score


@dataclass
class CurationReport:
    rows_in: int
    rows_quality_pass: int
    rows_after_exact_dedup: int
    rows_after_near_dedup: int


def curate_corpus(
    extracted: DataFrame,
    min_quality: float = 0.3,
    min_chars: int = 50,
    near_dup_threshold: float = 0.85,
    url_col: str = "url",
    text_col: str = "text",
) -> tuple[DataFrame, CurationReport]:
    """Returns (curated corpus, survival report). Deterministic: survivors
    of each dedup stage are the minimum-url member of every duplicate set."""
    rows_in = extracted.count()

    normalized = extracted.withColumn(text_col, normalize_cjk_udf(F.col(text_col)))
    scored = normalized.withColumn("lang_guess", lang_id(F.col(text_col))).withColumn(
        "quality", quality_score(F.col(text_col))
    )
    gated = scored.filter(
        (F.col("quality") >= min_quality) & (F.length(text_col) >= min_chars)
    )
    rows_quality = gated.count()

    # exact dedup: hash in the projection, min(url) per hash survives
    hashed = gated.withColumn("_h", F.sha2(F.col(text_col), 256))
    keepers = hashed.groupBy("_h").agg(F.min(url_col).alias(url_col))
    exact = hashed.join(keepers, [url_col], "left_semi").drop("_h")
    rows_exact = exact.count()

    # near-dup: LSH candidate pairs above threshold; drop the larger url of
    # each pair (transitive chains collapse to the smallest member greedily)
    pairs = minhash_lsh_candidates(
        exact, text_col=text_col, id_col=url_col, threshold=near_dup_threshold
    )
    losers = pairs.select(F.col("id_b").alias(url_col)).distinct()
    curated = exact.join(losers, [url_col], "left_anti")
    rows_near = curated.count()

    report = CurationReport(
        rows_in=rows_in,
        rows_quality_pass=rows_quality,
        rows_after_exact_dedup=rows_exact,
        rows_after_near_dedup=rows_near,
    )
    return curated, report
