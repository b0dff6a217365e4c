"""As-of join operator: <= semantics, ties, tolerance, nulls."""

from __future__ import annotations

from datetime import datetime

from docling_japanese_books_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-01 10:00:00")),
            (2, 7, _ts("2024-01-01 12:00:00")),
            (3, 7, _ts("2024-01-01 09:00:00")),  # before any right row
            (4, 8, _ts("2024-01-01 10:30:00")),  # other key
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (7, _ts("2024-01-01 09:30:00"), 1.0),
            (7, _ts("2024-01-01 11:00:00"), 2.0),
            (8, _ts("2024-01-01 10:30:00"), 9.0),  # tie: same ts as left
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {r.event_id: r for r in asof_join(left, right, on="user_id").collect()}
    assert out[1].asof_value == 1.0   # 09:30 is latest <= 10:00
    assert out[2].asof_value == 2.0   # 11:00 is latest <= 12:00
    assert out[3].asof_value is None  # nothing precedes 09:00
    assert out[4].asof_value == 9.0   # equal ts counts (<= semantics)
    assert out[1].asof_ts == _ts("2024-01-01 09:30:00")


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts("2024-01-01 10:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(7, _ts("2024-01-01 08:00:00"), 5.0)],
        "user_id long, ts timestamp, value double",
    )
    ok = asof_join(left, right, on="user_id", tolerance_seconds=3 * 3600).collect()[0]
    assert ok.asof_value == 5.0
    stale = asof_join(left, right, on="user_id", tolerance_seconds=3600).collect()[0]
    assert stale.asof_value is None and stale.asof_ts is None


def test_asof_join_keeps_left_columns_and_count(spark):
    left = spark.createDataFrame(
        [(i, 7, _ts(f"2024-01-01 10:00:{i:02d}"), f"p{i}") for i in range(10)],
        "event_id long, user_id long, ts timestamp, payload string",
    )
    right = spark.createDataFrame(
        [(7, _ts("2024-01-01 10:00:05"), 1.0)],
        "user_id long, ts timestamp, value double",
    )
    rows = asof_join(left, right, on="user_id").collect()
    assert len(rows) == 10  # left join: every left row survives
    assert all(r.payload == f"p{r.event_id}" for r in rows)
    assert sum(1 for r in rows if r.asof_value == 1.0) == 5  # ids 5..9


def test_interval_join_containment_and_buckets(spark):
    left = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-01 10:15:00")),  # inside A
            (2, 7, _ts("2024-01-01 11:00:00")),  # exactly at A's end: excluded
            (3, 7, _ts("2024-01-01 10:00:00")),  # exactly at A's start: included
            (4, 8, _ts("2024-01-01 10:15:00")),  # other key: no interval
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 7, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
            (101, 7, _ts("2024-01-01 10:10:00"), _ts("2024-01-01 10:20:00")),
            (102, 7, _ts("2024-01-01 12:00:00"), _ts("2024-01-01 12:00:00")),  # empty
        ],
        "interval_id long, user_id long, start_ts timestamp, end_ts timestamp",
    )
    from docling_japanese_books_spark.operators.asof import interval_join

    # tiny buckets force multi-bucket interval explosion
    out = interval_join(left, right, on="user_id", bucket_seconds=300)
    got = {(r.event_id, r.interval_id) for r in out.collect()}
    assert got == {(1, 100), (1, 101), (3, 100)}


def test_interval_join_subsecond_intervals(spark):
    """Sub-second intervals: valid (end > start) intervals shorter than a
    second must still match — second-truncating arithmetic would compute a
    descending bucket sequence and fabricate-then-drop everything."""
    from docling_japanese_books_spark.operators.asof import interval_join

    left = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-01 10:00:00.600")),  # inside [.5, .9)
            (2, 7, _ts("2024-01-01 10:00:00.900")),  # at exclusive end
            (3, 7, _ts("2024-01-01 10:00:00.500")),  # at inclusive start
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(200, 7, _ts("2024-01-01 10:00:00.500"), _ts("2024-01-01 10:00:00.900"))],
        "interval_id long, user_id long, start_ts timestamp, end_ts timestamp",
    )
    got = {
        (r.event_id, r.interval_id)
        for r in interval_join(left, right, on="user_id", bucket_seconds=3600).collect()
    }
    assert got == {(1, 200), (3, 200)}


def test_asof_join_subsecond_tolerance(spark):
    """Fractional-second tolerances must not be silently truncated: a right
    row 0.4 s earlier is within 0.5 s but outside 0.3 s."""
    left = spark.createDataFrame(
        [(1, 7, _ts("2024-01-01 10:00:00.900"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(7, _ts("2024-01-01 10:00:00.500"), 5.0)],
        "user_id long, ts timestamp, value double",
    )
    ok = asof_join(left, right, on="user_id", tolerance_seconds=0.5).collect()[0]
    assert ok.asof_value == 5.0
    stale = asof_join(left, right, on="user_id", tolerance_seconds=0.3).collect()[0]
    assert stale.asof_value is None
