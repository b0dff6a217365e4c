"""Explicit skew salting (north rule: "explicit salting for skewed hosts").

Zipfian host distributions make any groupBy(host) shuffle dump the hot
host's rows into one reducer. Two-phase salted aggregation fixes it for
algebraic aggregates:

  phase 1: groupBy(key, salt = pmod(xxhash64(fine_col), n_salt)) — partial
           aggregates computed across n_salt reducers per key;
  phase 2: groupBy(key) — combine the n_salt partials.

AQE's skew handling covers *joins*; skewed *aggregations* of non-algebraic
shapes (collect_list etc.) and pre-AQE engines need this explicitly. For
purely algebraic aggs Spark's own partial aggregation already does map-side
combine — salting matters when upstream partitioning is key-clustered (e.g.
reading a table bucketed by host) so map-side combine can't help; we keep
the operator explicit so the pipeline can force it.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ALGEBRAIC = {"count", "sum", "min", "max"}


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: Dict[str, tuple],
    fine_col: str,
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    aggs: output_name -> (fn_name, input_col) with fn in
    {count, sum, min, max, avg}. avg decomposes into sum+count.
    fine_col: any column with per-row variety (url, id) — drives the salt.
    """
    salt = F.pmod(F.xxhash64(F.col(fine_col)), F.lit(n_salt)).alias("_salt")

    phase1_exprs = []
    phase2_exprs = []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            phase1_exprs.append(F.count(col).alias(f"_p_{name}"))
            phase2_exprs.append(F.sum(f"_p_{name}").alias(name))
        elif fn == "sum":
            phase1_exprs.append(F.sum(col).alias(f"_p_{name}"))
            phase2_exprs.append(F.sum(f"_p_{name}").alias(name))
        elif fn == "min":
            phase1_exprs.append(F.min(col).alias(f"_p_{name}"))
            phase2_exprs.append(F.min(f"_p_{name}").alias(name))
        elif fn == "max":
            phase1_exprs.append(F.max(col).alias(f"_p_{name}"))
            phase2_exprs.append(F.max(f"_p_{name}").alias(name))
        elif fn == "avg":
            phase1_exprs.append(F.sum(col).alias(f"_ps_{name}"))
            phase1_exprs.append(F.count(col).alias(f"_pc_{name}"))
            phase2_exprs.append(
                (F.sum(f"_ps_{name}") / F.sum(f"_pc_{name}")).alias(name)
            )
        else:
            raise ValueError(f"unsupported salted agg fn: {fn}")

    partial = df.withColumn("_salt", salt).groupBy(key, "_salt").agg(*phase1_exprs)
    return partial.groupBy(key).agg(*phase2_exprs)


def host_of(url: Column) -> Column:
    """host(url) — the skewed grouping key of the north-rule pipeline."""
    return F.regexp_extract(url, r"^[a-z]+://([^/]+)/", 1)
