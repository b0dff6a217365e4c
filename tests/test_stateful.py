"""applyInPandasWithState sessionization: state survives across
micro-batches; closed sessions emit exactly once."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pytest

from docling_japanese_books_spark.streaming.stateful import stateful_sessionize

SCHEMA = "user_id long, event_id long, ts timestamp, value double"
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _run_batch(spark, in_dir, ckpt, out_dir):
    """memory sink can't recover from a checkpoint; the file sink can —
    cross-batch state needs the SAME checkpoint across runs."""
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    sessions = stateful_sessionize(stream, gap_seconds=600)
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _read_sessions(spark, out_dir):
    try:
        return spark.read.parquet(out_dir).collect()
    except Exception:
        return []


@pytest.fixture()
def dirs():
    base = tempfile.mkdtemp(prefix="stateful_")
    yield base
    shutil.rmtree(base, ignore_errors=True)


def test_sessions_span_batches(spark, dirs):
    in_dir, ckpt = f"{dirs}/in", f"{dirs}/ckpt"

    # batch 1: user 1 has events 0s and 60s (same session, still open)
    b1 = [
        (1, 1, T0, 1.0),
        (1, 2, T0 + dt.timedelta(seconds=60), 2.0),
        (2, 3, T0, 5.0),
    ]
    out = f"{dirs}/out"
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)
    _run_batch(spark, in_dir, ckpt, out)
    assert len(_read_sessions(spark, out)) == 0  # nothing closed yet

    # batch 2: user 1 returns 2h later -> previous session closes;
    # user 2 event 30s later -> same session, stays open
    b2 = [
        (1, 4, T0 + dt.timedelta(hours=2), 3.0),
        (2, 5, T0 + dt.timedelta(seconds=30), 1.0),
    ]
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)
    _run_batch(spark, in_dir, ckpt, out)
    rows = _read_sessions(spark, out)
    assert len(rows) == 1
    s = rows[0]
    assert s.user_id == 1
    assert s.n_events == 2 and abs(s.sum_value - 3.0) < 1e-9
    assert s.session_start == T0
    assert s.session_end == T0 + dt.timedelta(seconds=60)

    # batch 3: user 1 again far later -> the 2h session (1 event) closes
    b3 = [(1, 6, T0 + dt.timedelta(hours=5), 7.0)]
    spark.createDataFrame(b3, SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)
    _run_batch(spark, in_dir, ckpt, out)
    rows = [r for r in _read_sessions(spark, out) if r.n_events == 1]
    assert len(rows) == 1
    assert abs(rows[0].sum_value - 3.0) < 1e-9


def test_multiple_sessions_in_one_batch(spark, dirs):
    in_dir, ckpt = f"{dirs}/in2", f"{dirs}/ckpt2"
    events = [
        (9, 1, T0, 1.0),
        (9, 2, T0 + dt.timedelta(seconds=30), 1.0),
        (9, 3, T0 + dt.timedelta(hours=1), 1.0),   # closes session 1
        (9, 4, T0 + dt.timedelta(hours=3), 1.0),   # closes session 2
    ]
    out2 = f"{dirs}/out2"
    spark.createDataFrame(events, SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)
    _run_batch(spark, in_dir, ckpt, out2)
    rows = sorted(_read_sessions(spark, out2), key=lambda r: r.session_start)
    assert len(rows) == 2
    assert rows[0].n_events == 2 and rows[1].n_events == 1
