"""Checkpoint-resume semantics: a killed run completes only pending buckets
on restart; reruns are idempotent (no double counting)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from docling_japanese_books_spark.extraction.pages import generate_pages
from docling_japanese_books_spark.pipeline.driver import (
    completed_buckets,
    read_manifest,
    run_extraction_pipeline,
)

N_PAGES = 400
N_BUCKETS = 8


@pytest.fixture()
def out_dir():
    d = tempfile.mkdtemp(prefix="pipe_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_kill_and_resume(spark, out_dir):
    pages = generate_pages(spark, N_PAGES, seed=42)

    # "killed" run: only 1 wave of 3 buckets completes
    r1 = run_extraction_pipeline(
        spark, pages, out_dir, run_id="r1", n_buckets=N_BUCKETS, wave_size=3, max_waves=1
    )
    assert len(r1.buckets_processed) == 3
    assert completed_buckets(spark, out_dir) == set(r1.buckets_processed)

    # resume: completes only the remaining buckets
    r2 = run_extraction_pipeline(
        spark, pages, out_dir, run_id="r2", n_buckets=N_BUCKETS, wave_size=3
    )
    assert set(r2.buckets_skipped) == set(r1.buckets_processed)
    assert sorted(r1.buckets_processed + r2.buckets_processed) == list(range(N_BUCKETS))

    # output complete, no duplicates
    data = spark.read.parquet(f"{out_dir}/data")
    assert data.count() == N_PAGES
    assert data.select("url").distinct().count() == N_PAGES

    # manifest: one row per bucket, lineage split across the two runs
    m = read_manifest(spark, out_dir)
    assert m.count() == N_BUCKETS
    runs = {r.run_id for r in m.select("run_id").distinct().collect()}
    assert runs == {"r1", "r2"}
    assert m.filter(F.col("rows_out") <= 0).count() == 0
    total = m.agg(F.sum("rows_out").alias("s")).collect()[0].s
    assert total == N_PAGES

    # rows_in must count the bucket's INPUT rows — extraction keeps every
    # page row here, so lineage requires rows_in == rows_out per bucket and
    # never rows_in < rows_out (kept/dropped accounting would be meaningless)
    assert m.filter(F.col("rows_in") < F.col("rows_out")).count() == 0
    total_in = m.agg(F.sum("rows_in").alias("s")).collect()[0].s
    assert total_in == N_PAGES


def test_single_input_pass_per_wave(spark, out_dir):
    """rows_in comes from Observation metrics on the write action — the
    wave must make exactly ONE pass over the input (a second column-pruned
    rescan per wave is an extra pass over the url column at 100 TB).

    Pin it with the Spark job count for one single-wave run: any
    reintroduced per-wave input action adds a job and trips the bound."""
    pages = generate_pages(spark, 100, seed=3)
    sc = spark.sparkContext
    sc.setJobGroup("wave_jobs", "single-wave pipeline run")
    try:
        run_extraction_pipeline(
            spark, pages, out_dir, run_id="j", n_buckets=2, wave_size=2
        )
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("wave_jobs")
    # measured: 5 jobs for one wave (write carrying the observation,
    # committed read + stats collect, manifest append, parquet footer job);
    # the pre-fix per-wave groupBy-count rescan measured 7
    assert len(jobs) <= 5, f"wave ran {len(jobs)} jobs — extra input pass?"
    # and the observation-supplied lineage is still exact
    m = read_manifest(spark, out_dir)
    assert m.agg(F.sum("rows_in").alias("s")).collect()[0].s == 100


def test_rerun_is_idempotent(spark, out_dir):
    pages = generate_pages(spark, 200, seed=7)
    run_extraction_pipeline(
        spark, pages, out_dir, run_id="a", n_buckets=4, wave_size=4
    )
    before = spark.read.parquet(f"{out_dir}/data").count()
    # second full run: everything skipped, data unchanged
    r = run_extraction_pipeline(
        spark, pages, out_dir, run_id="b", n_buckets=4, wave_size=4
    )
    assert r.buckets_processed == []
    assert spark.read.parquet(f"{out_dir}/data").count() == before


def test_empty_buckets_do_not_crash(spark, out_dir):
    """A wave whose buckets all have zero input rows is legal (n_buckets
    can exceed the distinct-url count): the Observation sum returns null
    for those buckets and rows_in must coalesce to 0, not TypeError."""
    pages = generate_pages(spark, 3, seed=5)  # 3 urls across 64 buckets
    r = run_extraction_pipeline(
        spark, pages, out_dir, run_id="e", n_buckets=64, wave_size=8
    )
    assert r.rows_out == 3
    m = read_manifest(spark, out_dir)
    assert m.count() == 64
    assert m.agg(F.sum("rows_in").alias("s")).collect()[0].s == 3
    assert m.filter("rows_in < 0").count() == 0


def test_pdf_corpus_pipeline(spark, out_dir):
    """Real PDF byte streams through the resumable pipeline: pages whose
    payload is genuine PDF bytes (writer in extraction/pdf_bytes) extract
    via the PDF extractor, resume correctly, and reproduce the source text
    byte-identically; corrupt payloads land as parse_failures, not crashes."""
    from pyspark.sql import Row

    from docling_japanese_books_spark.extraction.pdf_bytes import text_to_pdf
    from docling_japanese_books_spark.pipeline.driver import extract_pdf_pages

    ts = __import__("datetime").datetime(2024, 1, 1)
    rows = [
        Row(
            url=f"s3://corpus/doc{i}.pdf",
            warc_ts=ts,
            html=text_to_pdf(f"pdf document number {i} body text"),
            text="",
            lang="ja",
        )
        for i in range(60)
    ] + [Row(url="s3://corpus/bad.pdf", warc_ts=ts, html=b"corrupt", text="", lang="ja")]
    pages = spark.createDataFrame(rows)

    r1 = run_extraction_pipeline(
        spark, pages, out_dir, run_id="p1", n_buckets=4, wave_size=2,
        max_waves=1, extractor=extract_pdf_pages,
    )
    assert len(r1.buckets_processed) == 2
    r2 = run_extraction_pipeline(
        spark, pages, out_dir, run_id="p2", n_buckets=4, wave_size=2,
        extractor=extract_pdf_pages,
    )
    assert set(r2.buckets_skipped) == set(r1.buckets_processed)

    data = spark.read.parquet(f"{out_dir}/data")
    assert data.count() == 61
    ok = {r.url: r.text for r in data.filter("status = 'ok'").collect()}
    assert len(ok) == 60
    for i in range(60):
        assert ok[f"s3://corpus/doc{i}.pdf"] == f"pdf document number {i} body text"
    m = read_manifest(spark, out_dir)
    assert m.agg(F.sum("parse_failures").alias("s")).collect()[0].s == 1
    assert m.agg(F.sum("rows_in").alias("s")).collect()[0].s == 61


def test_versioned_snapshots_and_time_travel(spark, out_dir):
    """Iceberg-style semantics on plain parquet: versioned runs keep every
    snapshot's data immutable under (bucket, run_id) partitions, the
    manifest is the snapshot log, read_snapshot() serves the current state
    and as_of= time-travels to any earlier snapshot; a re-crawl
    (reprocess=) creates a new snapshot without destroying the old one."""
    from pyspark.sql import functions as F

    from docling_japanese_books_spark.pipeline.driver import (
        read_snapshot,
        snapshots,
    )

    pages_v1 = generate_pages(spark, 100, seed=11)
    r1 = run_extraction_pipeline(
        spark, pages_v1, out_dir, run_id="crawl1", n_buckets=4, wave_size=4,
        versioned=True,
    )
    assert r1.snapshot == 1

    # re-crawl: same urls, changed content (simulate with a marker suffix)
    pages_v2 = pages_v1.withColumn(
        "html", F.concat(F.col("html"), F.lit(b""))
    ).withColumn("lang", F.lit("xx"))
    r2 = run_extraction_pipeline(
        spark, pages_v2, out_dir, run_id="crawl2", n_buckets=4, wave_size=4,
        versioned=True, reprocess=range(4),
    )
    assert r2.snapshot == 2 and len(r2.buckets_processed) == 4

    cur = read_snapshot(spark, out_dir)
    old = read_snapshot(spark, out_dir, as_of=1)
    assert cur.count() == 100 and old.count() == 100
    # current state is crawl2, snapshot 1 still serves crawl1's data
    assert {r.run_id for r in cur.select("run_id").distinct().collect()} == {"crawl2"}
    assert {r.run_id for r in old.select("run_id").distinct().collect()} == {"crawl1"}
    assert cur.filter("lang = 'xx'").count() == 100
    assert old.filter("lang = 'xx'").count() == 0
    # both snapshots' data exist on disk simultaneously (immutability)
    raw = spark.read.parquet(f"{out_dir}/data")
    assert raw.count() == 200

    log = snapshots(spark, out_dir).collect()
    assert [(r.snapshot, r.run_id, r.buckets) for r in log] == [
        (1, "crawl1", 4),
        (2, "crawl2", 4),
    ]


def test_versioned_partial_recrawl_merges_snapshots(spark, out_dir):
    """Reprocessing a SUBSET of buckets: the current snapshot serves new
    data for redone buckets and the previous run's data for the rest."""
    from docling_japanese_books_spark.pipeline.driver import read_snapshot

    pages = generate_pages(spark, 100, seed=13)
    run_extraction_pipeline(
        spark, pages, out_dir, run_id="a", n_buckets=4, wave_size=4,
        versioned=True,
    )
    run_extraction_pipeline(
        spark, pages, out_dir, run_id="b", n_buckets=4, wave_size=4,
        versioned=True, reprocess=[1, 2],
    )
    cur = read_snapshot(spark, out_dir)
    assert cur.count() == 100  # no duplicates across snapshots
    by_run = {
        r.run_id: r.n
        for r in cur.groupBy("run_id").agg(F.count("*").alias("n")).collect()
    }
    assert set(by_run) == {"a", "b"}
    buckets_b = {
        r.bucket for r in cur.filter("run_id = 'b'").select("bucket").distinct().collect()
    }
    assert buckets_b == {1, 2}


def test_expire_snapshots(spark, out_dir):
    """Snapshot expiry bounds versioned storage: partitions no kept
    snapshot references are deleted, kept snapshots (including carried-
    forward buckets older than the watermark) stay byte-readable, and
    reads below the watermark raise instead of silently serving a
    partial table."""
    import pytest as _pytest

    from docling_japanese_books_spark.pipeline.driver import (
        expire_snapshots,
        read_snapshot,
    )

    pages = generate_pages(spark, 80, seed=17)
    run_extraction_pipeline(
        spark, pages, out_dir, run_id="s1", n_buckets=4, wave_size=4,
        versioned=True,
    )
    # s2 rewrites only buckets 0-1; buckets 2-3 stay owned by s1
    run_extraction_pipeline(
        spark, pages, out_dir, run_id="s2", n_buckets=4, wave_size=4,
        versioned=True, reprocess=[0, 1],
    )
    run_extraction_pipeline(
        spark, pages, out_dir, run_id="s3", n_buckets=4, wave_size=4,
        versioned=True, reprocess=[0],
    )

    deleted = expire_snapshots(spark, out_dir, keep_last=2)
    # kept snapshots {2,3}: at the watermark (2) buckets 0,1 are owned by
    # s2 and buckets 2,3 by s1 — so s1's bucket-0 and bucket-1 partitions
    # are dead (2 deletions), while s1's buckets 2,3 stay carried forward
    assert deleted == 2

    cur = read_snapshot(spark, out_dir)
    assert cur.count() == 80
    prev = read_snapshot(spark, out_dir, as_of=2)
    assert prev.count() == 80  # carried-forward s1 buckets still readable
    with _pytest.raises(ValueError, match="expired"):
        read_snapshot(spark, out_dir, as_of=1)
    # idempotent: nothing else to delete
    assert expire_snapshots(spark, out_dir, keep_last=2) == 0


def test_versioned_run_id_reuse_raises(spark, out_dir):
    """Rewriting a (bucket, run_id) partition an earlier snapshot references
    would silently corrupt time travel — reprocessing under an already-
    recorded run_id must raise, while resuming a KILLED run with the same
    run_id (pending buckets have no manifest entry) stays legal."""
    pages = generate_pages(spark, 100, seed=19)
    run_extraction_pipeline(
        spark, pages, out_dir, run_id="r", n_buckets=4, wave_size=4,
        versioned=True,
    )
    with pytest.raises(ValueError, match="corrupt time travel"):
        run_extraction_pipeline(
            spark, pages, out_dir, run_id="r", n_buckets=4, wave_size=4,
            versioned=True, reprocess=[0],
        )
    # the guard did not damage the table
    from docling_japanese_books_spark.pipeline.driver import read_snapshot

    assert read_snapshot(spark, out_dir).count() == 100


def test_versioned_killed_run_resumes_same_run_id(spark, out_dir):
    pages = generate_pages(spark, 100, seed=23)
    r1 = run_extraction_pipeline(
        spark, pages, out_dir, run_id="k", n_buckets=4, wave_size=2,
        max_waves=1, versioned=True,
    )
    assert len(r1.buckets_processed) == 2
    # resume under the SAME run_id: only pending buckets are written, no
    # recorded partition is rewritten, so the guard must not fire
    r2 = run_extraction_pipeline(
        spark, pages, out_dir, run_id="k", n_buckets=4, wave_size=2,
        versioned=True,
    )
    assert sorted(r1.buckets_processed + r2.buckets_processed) == [0, 1, 2, 3]
    from docling_japanese_books_spark.pipeline.driver import read_snapshot

    assert read_snapshot(spark, out_dir).count() == 100


def test_nonversioned_zero_row_reprocess_clears_stale_partition(spark, out_dir):
    """Dynamic partition overwrite only replaces partitions present in the
    new output: a redone bucket whose re-extraction yields ZERO rows must
    have its prior partition cleared explicitly, or the read-back counts a
    previous run's rows as this run's rows_out."""
    pages = generate_pages(spark, 100, seed=29)
    run_extraction_pipeline(
        spark, pages, out_dir, run_id="full", n_buckets=4, wave_size=4
    )
    # re-crawl where every page of bucket 2 vanished from the input
    pages2 = pages.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(4))
    ).filter("bucket <> 2").drop("bucket")
    r = run_extraction_pipeline(
        spark, pages2, out_dir, run_id="empty", n_buckets=4, wave_size=4,
        reprocess=[2],
    )
    assert r.buckets_processed == [2] and r.rows_out == 0
    data = spark.read.parquet(f"{out_dir}/data")
    assert data.filter("bucket = 2").count() == 0  # stale rows cleared
    m = read_manifest(spark, out_dir)
    last = m.filter("run_id = 'empty'").collect()
    assert len(last) == 1 and last[0].rows_out == 0 and last[0].rows_in == 0


def test_expiry_watermark_survives_interrupted_delete(spark, out_dir, monkeypatch):
    """The watermark is written BEFORE partitions are deleted: a crash
    mid-expiry must leave expired reads failing fast ('expired'), never
    silently serving a partial table from half-deleted partitions."""
    import shutil as _shutil

    from docling_japanese_books_spark.pipeline.driver import (
        expire_snapshots,
        read_snapshot,
    )

    pages = generate_pages(spark, 80, seed=31)
    for rid, redo in (("s1", None), ("s2", [0, 1]), ("s3", [0])):
        run_extraction_pipeline(
            spark, pages, out_dir, run_id=rid, n_buckets=4, wave_size=4,
            versioned=True, reprocess=redo,
        )

    real_rmtree = _shutil.rmtree

    def boom(path, *a, **kw):
        raise OSError("simulated crash during partition delete")

    monkeypatch.setattr(_shutil, "rmtree", boom)
    with pytest.raises(OSError, match="simulated crash"):
        expire_snapshots(spark, out_dir, keep_last=2)
    monkeypatch.setattr(_shutil, "rmtree", real_rmtree)

    # nothing was deleted, but the watermark already gates expired reads
    with pytest.raises(ValueError, match="expired"):
        read_snapshot(spark, out_dir, as_of=1)
    assert read_snapshot(spark, out_dir).count() == 80


def test_extraction_output_byte_identical(spark, out_dir):
    pages = generate_pages(spark, 200, seed=42)
    run_extraction_pipeline(
        spark, pages, out_dir, run_id="x", n_buckets=4, wave_size=4
    )
    data = spark.read.parquet(f"{out_dir}/data")
    joined = data.alias("o").join(
        pages.select("url", F.col("text").alias("expected")).alias("p"), "url"
    )
    assert joined.filter("text <> expected").count() == 0


def test_delete_where_new_snapshot_preserves_history(spark, out_dir):
    """Row-level DELETE (copy-on-write): matching rows vanish from the
    current snapshot, pre-delete time travel still serves them, and only
    affected buckets are rewritten."""
    from docling_japanese_books_spark.pipeline.driver import (
        delete_where,
        read_snapshot,
    )

    pages = generate_pages(spark, N_PAGES, seed=42)
    r1 = run_extraction_pipeline(
        spark, pages, out_dir, run_id="r1", n_buckets=N_BUCKETS, versioned=True
    )
    before = read_snapshot(spark, out_dir)
    n_before = before.count()
    victims = before.filter(F.col("status") != "ok")
    n_victims = victims.count()
    victim_buckets = {
        r.bucket for r in victims.select("bucket").distinct().collect()
    }
    assert 0 < n_victims < n_before  # corpus plants malformed pages

    d = delete_where(spark, out_dir, "status <> 'ok'", run_id="del1")
    assert d.rows_out == n_victims
    assert set(d.buckets_processed) == victim_buckets
    assert d.snapshot == r1.snapshot + 1

    after = read_snapshot(spark, out_dir)
    assert after.count() == n_before - n_victims
    assert after.filter(F.col("status") != "ok").count() == 0
    # unaffected buckets still ride their ORIGINAL run's partitions
    m = read_manifest(spark, out_dir)
    assert m.filter(
        (F.col("snapshot") == d.snapshot)
        & ~F.col("bucket").isin([int(b) for b in victim_buckets])
    ).count() == 0

    # time travel to the pre-delete snapshot is intact
    travel = read_snapshot(spark, out_dir, as_of=r1.snapshot)
    assert travel.count() == n_before
    assert travel.filter(F.col("status") != "ok").count() == n_victims


def test_delete_where_rerun_and_noop(spark, out_dir):
    from docling_japanese_books_spark.pipeline.driver import (
        delete_where,
        read_snapshot,
    )

    pages = generate_pages(spark, N_PAGES, seed=42)
    run_extraction_pipeline(
        spark, pages, out_dir, run_id="r1", n_buckets=N_BUCKETS, versioned=True
    )
    d1 = delete_where(spark, out_dir, "status <> 'ok'", run_id="del1")
    assert d1.rows_out > 0
    # committed delete: a rerun (fresh run_id) finds nothing and no-ops
    d2 = delete_where(spark, out_dir, "status <> 'ok'", run_id="del2")
    assert d2.rows_out == 0 and d2.buckets_processed == []
    assert d2.snapshot == d1.snapshot  # no empty snapshot appended
    # run_id reuse against committed buckets is rejected
    with pytest.raises(ValueError, match="already holds snapshot data"):
        delete_where(spark, out_dir, "status = 'ok'", run_id="del1")


def test_delete_where_kill_mid_delete_resumes_exactly_once(spark, out_dir):
    """Killed between the data write and the manifest append: readers see
    the PRE-delete table (orphan partitions are unreferenced); rerunning
    the delete with the same run_id commits exactly once."""
    from docling_japanese_books_spark.pipeline.driver import (
        delete_where,
        read_snapshot,
    )

    pages = generate_pages(spark, N_PAGES, seed=42)
    r1 = run_extraction_pipeline(
        spark, pages, out_dir, run_id="r1", n_buckets=N_BUCKETS, versioned=True
    )
    n_before = read_snapshot(spark, out_dir).count()
    n_victims = (
        read_snapshot(spark, out_dir).filter(F.col("status") != "ok").count()
    )

    with pytest.raises(RuntimeError, match="simulated kill"):
        delete_where(
            spark, out_dir, "status <> 'ok'", run_id="del1",
            _fail_before_manifest=True,
        )
    # half-written delete is invisible: current table unchanged
    assert read_snapshot(spark, out_dir).count() == n_before

    d = delete_where(spark, out_dir, "status <> 'ok'", run_id="del1")
    assert d.rows_out == n_victims
    assert read_snapshot(spark, out_dir).count() == n_before - n_victims
    # exactly one delete snapshot in the log
    m = read_manifest(spark, out_dir)
    snaps = {r.snapshot for r in m.select("snapshot").distinct().collect()}
    assert snaps == {r1.snapshot, d.snapshot}


def test_delete_where_full_bucket_deletion(spark, out_dir):
    """Deleting EVERY row of some bucket: the new snapshot serves zero rows
    for it (no phantom partition), and time travel still serves the old."""
    from docling_japanese_books_spark.pipeline.driver import (
        delete_where,
        read_snapshot,
    )

    pages = generate_pages(spark, N_PAGES, seed=42)
    r1 = run_extraction_pipeline(
        spark, pages, out_dir, run_id="r1", n_buckets=N_BUCKETS, versioned=True
    )
    before = read_snapshot(spark, out_dir)
    some_bucket = before.select("bucket").first().bucket
    n_in_bucket = before.filter(F.col("bucket") == some_bucket).count()

    d = delete_where(
        spark, out_dir, f"bucket = {some_bucket}", run_id="delb"
    )
    assert d.rows_out == n_in_bucket
    after = read_snapshot(spark, out_dir)
    assert after.filter(F.col("bucket") == some_bucket).count() == 0
    assert after.count() == before.count() - n_in_bucket
    travel = read_snapshot(spark, out_dir, as_of=r1.snapshot)
    assert travel.filter(F.col("bucket") == some_bucket).count() == n_in_bucket


def test_merge_into_upsert_new_snapshot(spark, out_dir):
    """MERGE (upsert): matched keys are replaced, new keys inserted, only
    the source rows' buckets are rewritten, and pre-merge time travel is
    intact."""
    from docling_japanese_books_spark.pipeline.driver import (
        merge_into,
        read_snapshot,
    )

    pages = generate_pages(spark, N_PAGES, seed=42)
    r1 = run_extraction_pipeline(
        spark, pages, out_dir, run_id="r1", n_buckets=N_BUCKETS, versioned=True
    )
    before = read_snapshot(spark, out_dir)
    n_before = before.count()
    existing = [r.url for r in before.select("url").limit(3).collect()]

    src_rows = [
        # update: existing keys get new text
        *[(u, "updated text", "ok") for u in existing],
        # insert: a brand-new key
        ("https://brand.new/page", "inserted text", "ok"),
    ]
    src = spark.createDataFrame(
        src_rows, "url string, text string, status string"
    ).select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit("en").alias("lang"),
        "text",
        "status",
        F.lit(1).cast("long").alias("blocks_kept"),
        F.lit(0).cast("long").alias("blocks_dropped"),
    )
    mr = merge_into(spark, out_dir, src, run_id="m1", key_col="url")
    assert mr.snapshot == r1.snapshot + 1

    after = read_snapshot(spark, out_dir)
    assert after.count() == n_before + 1  # 3 updates in place + 1 insert
    got = {
        r.url: r.text
        for r in after.filter(
            F.col("url").isin(existing + ["https://brand.new/page"])
        ).collect()
    }
    assert all(got[u] == "updated text" for u in existing)
    assert got["https://brand.new/page"] == "inserted text"
    # keys stay unique after the upsert
    assert after.select("url").distinct().count() == after.count()

    # time travel to pre-merge still serves the original text
    travel = read_snapshot(spark, out_dir, as_of=r1.snapshot)
    assert travel.count() == n_before
    old = {r.url: r.text for r in travel.filter(F.col("url").isin(existing)).collect()}
    assert all(old[u] != "updated text" for u in existing)


def test_merge_into_kill_and_resume(spark, out_dir):
    from docling_japanese_books_spark.pipeline.driver import (
        merge_into,
        read_snapshot,
    )

    pages = generate_pages(spark, N_PAGES, seed=42)
    run_extraction_pipeline(
        spark, pages, out_dir, run_id="r1", n_buckets=N_BUCKETS, versioned=True
    )
    n_before = read_snapshot(spark, out_dir).count()
    src = read_snapshot(spark, out_dir).limit(2).drop("run_id").withColumn(
        "text", F.lit("merged")
    )
    # force a concrete source (reading the table we're about to rewrite
    # mid-merge would race the dynamic overwrite)
    src = spark.createDataFrame(src.collect(), src.schema)

    with pytest.raises(RuntimeError, match="simulated kill"):
        merge_into(
            spark, out_dir, src, run_id="m1", _fail_before_manifest=True
        )
    assert read_snapshot(spark, out_dir).count() == n_before  # invisible

    mr = merge_into(spark, out_dir, src, run_id="m1")
    after = read_snapshot(spark, out_dir)
    assert after.count() == n_before  # pure update, no inserts
    assert after.filter(F.col("text") == "merged").count() == 2
    assert mr.rows_out > 0
    with pytest.raises(ValueError, match="already holds snapshot data"):
        merge_into(spark, out_dir, src, run_id="m1")


def test_compact_buckets_preserves_rows_and_history(spark, out_dir):
    """Compaction rewrites live buckets into fewer files as a new
    snapshot: row content identical, file count reduced, pre-compaction
    time travel intact, expiry can then reclaim the old layout."""
    import glob

    from docling_japanese_books_spark.pipeline.driver import (
        compact_buckets,
        read_snapshot,
    )

    pages = generate_pages(spark, N_PAGES, seed=42)
    # many small files per bucket: repartition the input wide
    r1 = run_extraction_pipeline(
        spark, pages.repartition(16), out_dir, run_id="r1",
        n_buckets=4, versioned=True,
    )
    before = read_snapshot(spark, out_dir)
    rows_before = sorted(
        (r.url, r.text) for r in before.select("url", "text").collect()
    )
    files_before = len(glob.glob(f"{out_dir}/data/bucket=*/run_id=r1/*.parquet"))
    assert files_before > 4  # genuinely fragmented

    c = compact_buckets(spark, out_dir, run_id="cmp1")
    assert c.snapshot == r1.snapshot + 1
    after = read_snapshot(spark, out_dir)
    rows_after = sorted(
        (r.url, r.text) for r in after.select("url", "text").collect()
    )
    assert rows_after == rows_before  # bit-identical content
    files_after = len(glob.glob(f"{out_dir}/data/bucket=*/run_id=cmp1/*.parquet"))
    assert files_after <= 4 < files_before  # ~one file per bucket

    travel = read_snapshot(spark, out_dir, as_of=r1.snapshot)
    assert travel.count() == before.count()

    # guards: run_id reuse and no-op on empty target set
    with pytest.raises(ValueError, match="already holds snapshot data"):
        compact_buckets(spark, out_dir, run_id="cmp1")
    noop = compact_buckets(spark, out_dir, run_id="cmp2", buckets=[999])
    assert noop.buckets_processed == [] and noop.snapshot == c.snapshot
