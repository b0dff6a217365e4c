"""URL-level corpus filtering — the stage-0 gate of every published
webtext pipeline (RefinedWeb §3.1 "URL filtering", FineWeb, CCNet all
filter on the URL BEFORE fetching or parsing a byte of HTML, because a
URL verdict costs nanoseconds and removes whole hosts of adult/spam/
malware content the text-level filters would otherwise pay to parse).

Three published rule families, all pure column algebra (whole-stage
codegen, zero UDFs, zero shuffles on the corpus side):

- **Domain blocklist** (UT1-style): a curated list of registrable
  domains; a page is blocked when the eTLD+1 of its host — or the host
  itself, for entries that name a specific subdomain — appears in the
  list. Matching is two broadcast LEFT joins (host key, eTLD+1 key)
  against the list: the UT1 adult list is ~4M short strings (tens of
  MB), comfortably broadcastable; past the broadcast threshold Spark
  degrades the same plan to a shuffle equi-join with no code change.
- **Blocked subwords** (RefinedWeb's word-in-URL hard rule): literal
  fragments whose presence anywhere in the URL blocks the page
  (e.g. a tracker path segment). One codegen'd case-insensitive
  ``contains`` chain — bounded by the (small, curated) fragment list.
- **Soft-word score** (RefinedWeb's weighted soft-banned words): each
  listed word found in the URL as a delimited token contributes its
  weight; the page is blocked when the total reaches the threshold.
  "Delimited token" = the word bounded by non-alphanumerics or string
  edges, so ``bet`` fires in ``/bet/odds`` and ``?q=bet`` but not in
  ``alphabet``.

The verdict frame keeps every input row (filtering is the caller's one
extra predicate) so curation reports can count per-rule hits — the same
report-friendly shape as textstats.gopher_rules.
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.urls import etld1_of, host_of


def _soft_word_pattern(word: str) -> str:
    """Delimited-token regex for one soft word — identical semantics in
    Java regex (Spark) and RE2 (DuckDB): no lookarounds, no \\b (which
    the two engines define differently around non-ASCII)."""
    return f"(^|[^a-z0-9]){re.escape(word.lower())}([^a-z0-9]|$)"


def soft_word_score(
    url: Column, soft_words: Mapping[str, float]
) -> Column:
    """Sum of weights of soft words present in ``lower(url)`` as
    delimited tokens. Pure codegen (one rlike per listed word)."""
    lower = F.lower(url)
    score = F.lit(0.0)
    for word, weight in sorted(soft_words.items()):
        score = score + F.when(
            lower.rlike(_soft_word_pattern(word)), F.lit(float(weight))
        ).otherwise(F.lit(0.0))
    return score


def url_filter_verdicts(
    pages: DataFrame,
    blocked_domains: DataFrame | Iterable[str] = (),
    blocked_subwords: Iterable[str] = (),
    soft_words: Mapping[str, float] | None = None,
    soft_threshold: float = 2.0,
    url_col: str = "url",
) -> DataFrame:
    """Per-row URL verdicts: input columns + ``host``, ``etld1``,
    ``domain_blocked``, ``subword_blocked``, ``soft_score`` (6-dp
    rounded), ``keep``.

    ``keep`` is true iff no rule fired: the domain (by host or eTLD+1)
    is not listed, no blocked subword occurs in the URL, and the soft
    score stays below ``soft_threshold``.

    ``blocked_domains`` may be a one-column DataFrame (column
    ``domain``) or any iterable of strings; entries are matched
    lowercase against BOTH the full host and its registrable domain, so
    a list row ``tracker.example`` blocks ``a.b.tracker.example`` while
    ``metrics.site.example`` blocks only that subdomain.
    """
    spark = pages.sparkSession
    if not isinstance(blocked_domains, DataFrame):
        rows = [(d.lower(),) for d in sorted(set(blocked_domains))]
        blocked_domains = spark.createDataFrame(rows, "domain string") if rows else None
    url = F.col(url_col)
    out = pages.withColumn("host", host_of(url)).withColumn(
        "etld1", etld1_of(F.col("host"))
    )
    if blocked_domains is not None:
        bl = F.broadcast(
            blocked_domains.select(F.lower("domain").alias("domain")).distinct()
        )
        host_hit = bl.withColumn("_host_hit", F.lit(True))
        etld_hit = bl.withColumn("_etld_hit", F.lit(True))
        out = (
            out.join(
                host_hit, out["host"] == host_hit["domain"], "left"
            )
            .drop("domain")
            .join(etld_hit, out["etld1"] == etld_hit["domain"], "left")
            .drop("domain")
            .withColumn(
                "domain_blocked",
                F.coalesce(F.col("_host_hit"), F.lit(False))
                | F.coalesce(F.col("_etld_hit"), F.lit(False)),
            )
            .drop("_host_hit", "_etld_hit")
        )
    else:
        out = out.withColumn("domain_blocked", F.lit(False))
    subwords = sorted({w.lower() for w in blocked_subwords})
    if subwords:
        lower = F.lower(url)
        hit = F.lit(False)
        for w in subwords:
            hit = hit | lower.contains(w)
        out = out.withColumn("subword_blocked", hit)
    else:
        out = out.withColumn("subword_blocked", F.lit(False))
    score = (
        soft_word_score(url, soft_words) if soft_words else F.lit(0.0)
    )
    out = out.withColumn("soft_score", F.round(score, 6))
    return out.withColumn(
        "keep",
        ~F.col("domain_blocked")
        & ~F.col("subword_blocked")
        & (F.col("soft_score") < F.lit(float(soft_threshold))),
    )
