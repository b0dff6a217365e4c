"""Analytics patterns rounding out the inventory: sessionization, rollup,
quantiles, best-per-group (A11-shaped) — all oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .relational import query, r6, t


@query(
    "events_sessionization",
    """
    SELECT user_id, session_id, count(*) AS n_events,
           round(sum(value), 6) AS session_value
    FROM (
      SELECT user_id, value,
             CAST(sum(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_id
      FROM (
        SELECT user_id, ts, event_id, value,
               date_diff('second',
                         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                         ts) AS gap_s
        FROM events))
    GROUP BY user_id, session_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag-gap > 30 min starts a new session; session id =
    running count of session starts (one shuffle on user_id, two window
    passes over the same partitioning — Spark reuses the sort)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = t(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ in the fixtures — unix_timestamp (session TZ=UTC)
    # is the cast that works for both NTZ and LTZ
    secs = F.unix_timestamp(F.col("ts"))
    gapped = ev.withColumn("gap_s", secs - F.lag(secs).over(w))
    sessions = gapped.withColumn(
        "session_id",
        F.sum(
            F.when(F.col("gap_s").isNull() | (F.col("gap_s") > 1800), 1).otherwise(0)
        ).over(wrun),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"), r6(F.sum("value")).alias("session_value")
    )


@query(
    "orders_rollup",
    """
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL')   AS status,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP aggregate (priority -> status -> grand total)."""
    return (
        t(spark, sf_dir, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n",
            "total",
        )
    )


@query(
    "order_price_quantiles",
    """
    SELECT round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 6) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 6) AS p75,
           round(quantile_cont(o_totalprice, 0.95), 6) AS p95
    FROM orders
    """,
)
def order_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous quantiles (Spark `percentile` == duckdb
    quantile_cont). The 100 TB path swaps in percentile_approx — same plan
    shape, sketch-mergeable partials."""
    o = t(spark, sf_dir, "orders")
    return o.agg(
        *[
            r6(F.percentile("o_totalprice", F.lit(p))).alias(f"p{int(p * 100)}")
            for p in (0.25, 0.50, 0.75, 0.95)
        ]
    )


@query(
    "corpus_stats",
    """
    SELECT source,
           count(*)                                              AS num_books,
           CAST(round(avg(n_chars / 2000.0), 0) AS BIGINT)       AS avg_pages_per_book,
           CAST(round(avg(n_chars), 0) AS BIGINT)                AS avg_chars_per_book,
           CAST(round(avg(ceil(n_chars / 450.0)), 0) AS BIGINT)  AS avg_chunks_per_book
    FROM documents GROUP BY source
    """,
)
def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 PDF-corpus statistics (ref quantization_analysis.py:415-480):
    per-collection book count, mean pages/book (2000 chars/page), mean
    chars, mean chunks/book (450 effective chunk chars), rounded to ints
    exactly as the reference reports them."""
    docs = t(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("num_books"),
        F.round(F.avg(F.col("n_chars") / 2000.0), 0)
        .cast("bigint")
        .alias("avg_pages_per_book"),
        F.round(F.avg("n_chars"), 0).cast("bigint").alias("avg_chars_per_book"),
        F.round(F.avg(F.ceil(F.col("n_chars") / 450.0)), 0)
        .cast("bigint")
        .alias("avg_chunks_per_book"),
    )


@query(
    "best_doc_per_source",
    """
    SELECT source, doc_id, n_chars FROM (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM documents)
    WHERE rk = 1
    """,
)
def best_doc_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 best-per-model selection (ref embedding_evaluation.py:498-509):
    keep the max-score row per group. Round 6: argmax via a
    partial-aggregable max(struct) instead of a row_number window —
    `source` has FEW distinct values at corpus scale, so a window puts
    one source's entire document set into a single task, while the agg
    combines map-side and shuffles one row per (partition, source).
    Ties break to the LOWEST doc_id, encoded as the negated id inside
    the ordering struct (struct max = lexicographic)."""
    best = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.max(
                F.struct(
                    F.col("n_chars").alias("n"),
                    (-F.col("doc_id")).alias("negid"),
                )
            ).alias("_b")
        )
    )
    return best.select(
        "source",
        (-F.col("_b.negid")).alias("doc_id"),
        F.col("_b.n").alias("n_chars"),
    )


@query(
    "events_asof_join",
    """
    WITH l AS (
      SELECT event_id, user_id, ts FROM events WHERE event_id % 2 = 0),
    r AS (
      SELECT user_id, ts, max(value) AS value
      FROM events WHERE event_id % 2 = 1 GROUP BY 1, 2)
    SELECT l.event_id, l.user_id,
           strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS ts,
           strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS asof_ts,
           round(r.value, 6) AS asof_value
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): every even event gets the latest
    odd event of the same user at-or-before its timestamp. Implemented as
    union + carry-forward window (ONE shuffle, no range explosion) and
    verified against DuckDB's native ASOF LEFT JOIN."""
    from ..operators.asof import asof_join

    events = t(spark, sf_dir, "events")
    left = events.filter(F.col("event_id") % 2 == 0).select(
        "event_id", "user_id", "ts"
    )
    right = (
        events.filter(F.col("event_id") % 2 == 1)
        .groupBy("user_id", "ts")  # unique per (key, ts): deterministic carry
        .agg(F.max("value").alias("value"))
    )
    out = asof_join(left, right, on="user_id", ts="ts", value_cols=["value"])
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss").alias("asof_ts"),
        r6(F.col("asof_value")).alias("asof_value"),
    )


@query(
    "events_interval_join",
    """
    WITH l AS (
      SELECT event_id, user_id, ts FROM events WHERE event_id % 2 = 0),
    r AS (
      SELECT event_id AS interval_id, user_id, ts AS start_ts,
             ts + INTERVAL 30 MINUTE AS end_ts
      FROM events WHERE event_id % 2 = 1)
    SELECT l.event_id, l.user_id,
           strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS ts,
           r.interval_id
    FROM l JOIN r
      ON l.user_id = r.user_id
     AND l.ts >= r.start_ts AND l.ts < r.end_ts
    """,
)
def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join (operators/asof.py interval_join): even
    events matched to the 30-minute windows opened by odd events of the
    same user. Spark runs the BUCKETIZED layout (time buckets bound the
    fan-out; equi-join + containment post-filter); the oracle is DuckDB's
    plain range join — same rows, different physical strategy."""
    from ..operators.asof import interval_join

    events = t(spark, sf_dir, "events")
    left = events.filter(F.col("event_id") % 2 == 0).select(
        "event_id", "user_id", "ts"
    )
    right = events.filter(F.col("event_id") % 2 == 1).select(
        F.col("event_id").alias("interval_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
    )
    out = interval_join(left, right, on="user_id", bucket_seconds=1800)
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "interval_id",
    )
