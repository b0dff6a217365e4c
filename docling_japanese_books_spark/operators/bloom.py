"""Distributed Bloom-filter membership — the crawl-scale "have we seen
this URL / paragraph?" primitive (Dolma's dedup runs exactly this shape
at trillion-token scale: a Bloom filter answers set membership in O(1)
bits per key where an exact join would shuffle the full key set every
increment).

The filter is a DATAFRAME, not a driver object: ``(word, bits)`` rows
where ``word`` indexes a 64-bit lane of the bit array and ``bits`` is
the OR of its set bits. That makes it

- **buildable in one aggregation**: keys -> k bit positions (pure
  column algebra) -> groupBy(word) with a ``bit_or`` — partial-
  aggregable, map-side combined, no driver bottleneck. (Spark's
  built-in ``df.stat.bloomFilter`` collects a JVM sketch to the
  driver — fine for megabytes, wrong for a frontier table that wants
  the filter AS data, mergeable and persistable.)
- **mergeable**: union two filters and ``bit_or`` again (idempotent —
  a Bloom filter is a fixed-width OR-monoid), so incremental crawls
  fold yesterday's filter with today's batch.
- **portable and deterministic**: positions come from the md5-prefix
  double-hashing construction (Kirsch-Mitzenmacher: ``pos_i = (h1 +
  i * h2) mod m`` gives k independent-enough probes from two hashes),
  so any engine — or the Python reference in the tests — reproduces
  the exact bit pattern.

Contract: NO false negatives ever (an inserted key always probes
true); false positives at the standard ``(1 - e^{-kn/m})^k`` rate —
callers that need exactness confirm probe-hits with an equi-join
against the (much smaller) hit subset, which is the textbook two-tier
design.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_parameters(n_items: int, fpr: float = 0.01) -> tuple[int, int]:
    """Optimal (m_bits, k_hashes) for ``n_items`` at ``fpr``:
    m = -n ln p / (ln 2)^2, k = (m/n) ln 2 — the standard sizing."""
    if n_items <= 0:
        return 64, 1
    m = int(math.ceil(-n_items * math.log(fpr) / (math.log(2) ** 2)))
    m = max(64, m)
    k = max(1, int(round(m / n_items * math.log(2))))
    return m, k


def _positions(key: Column, m_bits: int, k_hashes: int) -> Column:
    """array<long> of the key's ``k`` bit positions in ``[0, m)``.

    h1/h2 are 60-bit md5 slices (15 hex chars each — Spark's ``conv``
    feeds a signed-long cast, so a full 64-bit slice could overflow to
    null); h2 is forced odd so a zero stride can never collapse all k
    probes onto one bit. Reductions happen before the ``i * h2``
    multiply, keeping every intermediate under 2^63 for any sane m."""
    digest = F.md5(key.cast("string").cast("binary"))
    h1 = F.conv(F.substring(digest, 1, 15), 16, 10).cast("long") % m_bits
    h2 = (
        F.conv(F.substring(digest, 17, 15), 16, 10).cast("long") % m_bits
    ).bitwiseOR(F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), F.lit(k_hashes - 1)),
        lambda i: (h1 + i.cast("long") * h2) % m_bits,
    )


def bloom_build(
    keys: DataFrame,
    key_col: str = "url",
    m_bits: int = 1 << 20,
    k_hashes: int = 7,
) -> DataFrame:
    """Build the filter: ``(word, bits)`` rows, one per NON-ZERO 64-bit
    lane (sparse — an underfilled filter costs rows proportional to set
    bits, not to m). One explode + one bit_or groupBy."""
    pos = keys.select(
        F.explode(_positions(F.col(key_col), m_bits, k_hashes)).alias("_p")
    )
    return (
        pos.select(
            (F.col("_p") / 64).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_p % 64 AS INT))").alias(
                "_bit"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("_bit").alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR two filters built with the SAME (m, k): the union's filter,
    exactly (bit-identical to building from the unioned keys)."""
    return (
        a.unionByName(b)
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str = "url",
    m_bits: int = 1 << 20,
    k_hashes: int = 7,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Membership verdict per input row: ``out_col`` true iff ALL k of
    the key's bits are set — possibly-seen (false positives at the
    configured rate), false = definitely-never-seen (no false
    negatives).

    Shape: explode the k probe positions, LEFT join the filter on the
    word lane, count satisfied probes per row, compare to k. The join
    key is ``word`` — broadcastable while the filter is sparse/small,
    an ordinary equi-shuffle when a full-web filter outgrows that; the
    probe side is k rows per key either way."""
    probe = df.select(
        key_col,
        F.posexplode(_positions(F.col(key_col), m_bits, k_hashes)).alias(
            "_i", "_p"
        ),
    ).select(
        key_col,
        "_i",
        (F.col("_p") / 64).cast("long").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_p % 64 AS INT))").alias(
            "_bit"
        ),
    )
    hits = (
        probe.join(bloom, "word", "left")
        .groupBy(key_col)
        .agg(
            F.sum(
                F.when(
                    F.col("bits").bitwiseAND(F.col("_bit")) != 0, 1
                ).otherwise(0)
            ).alias("_hits")
        )
    )
    return df.join(hits, key_col, "left").withColumn(
        out_col, F.coalesce(F.col("_hits") == k_hashes, F.lit(False))
    ).drop("_hits")
