"""Vector math as JVM-side column expressions (no Python in the hot path).

A2 cosine similarity (ref embedding_evaluation.py:433-445): dot/(‖a‖‖b‖),
0.0 if either norm is 0. Implemented with ``F.zip_with`` + ``F.aggregate``
so the whole expression stays inside whole-stage codegen — at 100 TB this is
the difference between a scan-speed job and a Python-bound one.

All math is done in DOUBLE regardless of the storage type (fixtures store
float32) so results are reproducible against external oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def array_sum(a: Column) -> Column:
    """Sum of an array column's elements, in double (the digest queries'
    standard hashable projection of a vector)."""
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two array columns, in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm
    (ref embedding_evaluation.py:439-443)."""
    na, nb = norm(a), norm(b)
    return F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(
        dot(a, b) / (na * nb)
    )


def improvement_pct(baseline: Column, score: Column) -> Column:
    """A7: (score-baseline)/baseline*100, 0 if baseline <= 0
    (ref embedding_evaluation.py:1008-1019)."""
    return F.when(baseline <= 0.0, F.lit(0.0)).otherwise(
        (score - baseline) / baseline * 100.0
    )
