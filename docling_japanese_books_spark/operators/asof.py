"""As-of (most-recent-prior) join — the time-series join Spark lacks.

For each left row, attach the LATEST right row of the same key whose
timestamp is <= the left timestamp (optionally within a tolerance). The
naive formulation is a range join (key equality + ts inequality), which
Catalyst executes as a per-key cross product — quadratic per key and
hopeless at 100 TB. The scalable shape is UNION + CARRY-FORWARD:

    tag left rows side=1, right rows side=0
    union on (key, ts, side, right payload)            -- no join at all
    window: partitionBy(key) orderBy(ts, side) rowsBetween(-inf, current)
    last(right payload, ignorenulls=True) over the window
    keep side=1 rows

One shuffle on the key (the window's), no range explosion, and ties at
equal ts resolve to "right first" so a right row AT the left timestamp is
visible (<= semantics, matching SQL ASOF JOIN). Right rows should be
unique per (key, ts) — pre-aggregate if not, or the carried value is the
last in (ts, side, input-order) which is nondeterministic across runs.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_micros(col: Column) -> Column:
    """Exact integer microseconds since epoch; the TIMESTAMP cast makes it
    work for TIMESTAMP_NTZ inputs too (session TZ applies). unix_timestamp
    would silently truncate fractional seconds — sub-second tolerances and
    sub-second intervals need microsecond arithmetic."""
    return F.unix_micros(col.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    value_cols: Optional[List[str]] = None,
    prefix: str = "asof_",
    tolerance_seconds: Optional[float] = None,
) -> DataFrame:
    """Left as-of join: every left row, plus ``{prefix}{ts}`` and
    ``{prefix}{col}`` for each right value column — null when no right row
    precedes it (or none within ``tolerance_seconds``)."""
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, ts)
    ]
    carried = [ts] + value_cols

    l = left.withColumn("_side", F.lit(1))
    r = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in carried],
    )
    # allowMissingColumns null-fills each side's absent columns: left rows
    # get null _r_* (typed from the right side), right rows null payloads
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in carried:
        unioned = unioned.withColumn(
            f"{prefix}{c}", F.last(f"_r_{c}", ignorenulls=True).over(w)
        )
    out = unioned.filter(F.col("_side") == 1).drop(
        "_side", *[f"_r_{c}" for c in carried]
    )
    if tolerance_seconds is not None:
        # materialize the predicate BEFORE nulling the columns it reads
        out = out.withColumn(
            "_within",
            (_epoch_micros(F.col(ts)) - _epoch_micros(F.col(f"{prefix}{ts}")))
            <= int(round(tolerance_seconds * 1_000_000)),
        )
        for c in carried:
            out = out.withColumn(
                f"{prefix}{c}", F.when(F.col("_within"), F.col(f"{prefix}{c}"))
            )
        out = out.drop("_within")
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_start: str = "start_ts",
    right_end: str = "end_ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join: left rows matched to every right interval
    [start, end) of the same key that contains their timestamp.

    A naive key-equality + range-predicate join degenerates to a per-key
    cross product. The scalable shape BUCKETIZES time: each right interval
    explodes to one row per ``bucket_seconds`` bucket it overlaps, each
    left row maps to exactly one bucket, and the join runs on
    (key, bucket) equality with the precise containment check as a cheap
    post-filter. Join fan-out is bounded by interval_length/bucket_seconds
    per interval — pick the bucket near the typical interval length.
    (This is the standard bucketed interval-join layout used by the
    interval-join operators of stream processors.)"""
    bucket_us = bucket_seconds * 1_000_000
    l_bucket = F.floor(_epoch_micros(F.col(left_ts)) / bucket_us)
    l = left.withColumn("_bucket", l_bucket.cast("long"))
    r_start = F.floor(_epoch_micros(F.col(right_start)) / bucket_us)
    # end is exclusive: the last contained instant is end - 1 microsecond,
    # so an interval ending exactly on a bucket boundary skips that bucket
    r_end = F.floor((_epoch_micros(F.col(right_end)) - 1) / bucket_us)
    # empty/inverted intervals produce no buckets (Spark's sequence would
    # otherwise DESCEND for end < start and fabricate matches); for valid
    # sub-bucket intervals r_end can still floor below r_start — clamp so
    # the sequence never descends
    r = right.filter(F.col(right_end) > F.col(right_start)).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                r_start.cast("long"),
                F.greatest(r_start, r_end).cast("long"),
            )
        ),
    )
    lh, rh = l.alias("l"), r.alias("r")
    return (
        lh.join(
            rh,
            (F.col(f"l.{on}") == F.col(f"r.{on}"))
            & (F.col("l._bucket") == F.col("r._bucket"))
            & (F.col(f"l.{left_ts}") >= F.col(f"r.{right_start}"))
            & (F.col(f"l.{left_ts}") < F.col(f"r.{right_end}")),
        )
        .drop(F.col("r._bucket"))
        .drop(F.col(f"r.{on}"))
        .drop(F.col("l._bucket"))
    )
