"""Domain-temperature mixing — the multilingual/multi-source sampling rule.

Training-data pipelines rarely feed the crawl distribution raw: the
published recipe (multilingual BERT's exponent-smoothed language sampling,
reused by XLM-R, mT5, and the Pile's per-source epochs) samples source
``d`` with probability proportional to ``p_d ** alpha`` where ``p_d`` is
the source's corpus share — ``alpha = 1`` keeps the natural distribution,
``alpha -> 0`` flattens it, pulling up low-resource domains. This module
turns that rule into a deterministic Spark filter:

- ``temperature_mix_plan``: one grouped count over the corpus (the only
  full pass, map-side combined) -> per-domain ``(domain, n_docs, weight,
  keep_prob)`` where ``weight = n_docs**alpha / sum_d n_docs**alpha`` and
  ``keep_prob = min(1, target_total * weight / n_docs)``. The plan frame
  has one row per domain — KBs even for the whole web's eTLD+1 set.
- ``temperature_mix``: keep a row iff its id's md5 bucket (the
  ``sampling._hash_bucket`` trick — pure function of the id, identical
  across runs, partitionings, and engines) falls under its domain's
  ``keep_prob``. The plan joins back as a BROADCAST; no shuffle of the
  corpus, no randomness, reproducible row-for-row.

``alpha = 0.5`` (the mBERT exponent) routes through ``sqrt``, which IEEE
requires exactly rounded — bit-identical across engines, hence
oracle-checkable; other exponents use ``pow`` (correct, but last-ulp
parity across libm versions is not guaranteed — the oracle query pins the
sqrt case).

Expected kept total = sum_d n_docs * keep_prob ~= target_total when no
domain saturates at keep_prob = 1; saturated (boosted-beyond-natural-size)
domains contribute only their full size, so the realized total
undershoots the target rather than oversampling tiny domains — callers
wanting exact totals re-run with a scaled target or upsample explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import _BUCKETS, _hash_bucket


def temperature_mix_plan(
    df: DataFrame,
    domain_col: str,
    alpha: float = 0.5,
    target_total: float = 1_000_000.0,
) -> DataFrame:
    """Per-domain sampling plan: (domain_col, n_docs, weight, keep_prob)."""
    counts = df.groupBy(domain_col).agg(F.count("*").alias("n_docs"))
    n = F.col("n_docs").cast("double")
    smoothed = F.sqrt(n) if alpha == 0.5 else F.pow(n, F.lit(float(alpha)))
    w = counts.withColumn("_sm", smoothed)
    return (
        w.crossJoin(F.broadcast(w.agg(F.sum("_sm").alias("_z"))))
        .withColumn("weight", F.col("_sm") / F.col("_z"))
        .withColumn(
            "keep_prob",
            F.least(
                F.lit(1.0),
                F.lit(float(target_total)) * F.col("weight") / n,
            ),
        )
        .select(domain_col, "n_docs", "weight", "keep_prob")
    )


def temperature_mix(
    df: DataFrame,
    domain_col: str,
    alpha: float = 0.5,
    target_total: float = 1_000_000.0,
    id_col: str = "doc_id",
    plan: DataFrame = None,
) -> DataFrame:
    """Filter ``df`` to the temperature-mixed sample: deterministic
    per-domain downsampling under the plan's keep_prob (pass ``plan`` to
    reuse a precomputed/persisted plan frame). Adds no columns.

    CONTRACT (r8, ADVICE): the plan attaches by INNER join on
    ``domain_col`` — rows whose domain is absent from a caller-supplied
    plan, and rows with a NULL domain, are DROPPED (equivalent to
    keep_prob 0). Callers reusing a stale/partial plan must ensure it
    covers every live domain (``plan.join(df, domain_col, 'right_anti')``
    is the coverage check); the default in-function plan is computed from
    ``df`` itself and always covers."""
    if plan is None:
        plan = temperature_mix_plan(df, domain_col, alpha, target_total)
    thr = F.floor(F.col("keep_prob") * _BUCKETS).cast("long")
    keep = plan.select(domain_col, thr.alias("_thr"))
    return (
        df.join(F.broadcast(keep), domain_col)
        .filter(_hash_bucket(F.col(id_col)) < F.col("_thr"))
        .drop("_thr")
    )
