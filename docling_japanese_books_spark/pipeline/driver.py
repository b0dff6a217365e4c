"""Checkpoint-resumable extraction pipeline (north rule: "resumable from
checkpoint with per-partition lineage + metrics").

Spark batch has no built-in partition-level resume, so job structure supplies
it (SURVEY §4 item 2):

- every page is assigned a stable bucket = pmod(xxhash64(url), n_buckets) —
  pure function of the url, independent of input partitioning, cluster size,
  or row order;
- output parquet is partitioned by bucket; writes use dynamic partition
  overwrite, so re-processing a bucket atomically replaces exactly that
  bucket's directory — a killed run never double-counts;
- a ``_manifest`` parquet table records one row per *completed* bucket with
  lineage (run_id, source) and extraction metrics (rows in/out, blocks
  kept/dropped, parse failures, wall ms). On restart, completed buckets are
  skipped (anti-join of bucket ids against the manifest);
- buckets are processed in waves (several buckets per Spark job) so progress
  checkpoints land incrementally while jobs stay large enough to saturate
  executors.

At 100 TB / 1000 executors the same structure holds: n_buckets scales to
O(10k), wave_size to O(100); the extraction map itself is shuffle-free
(the only exchange is the write's partitionBy clustering).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("run_id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("rows_in", T.LongType(), False),
        T.StructField("rows_out", T.LongType(), False),
        T.StructField("blocks_kept", T.LongType(), False),
        T.StructField("blocks_dropped", T.LongType(), False),
        T.StructField("parse_failures", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
        # Iceberg-style snapshot log: one monotonically increasing id per
        # run; the latest entry per bucket defines the CURRENT table, and
        # `read_snapshot(as_of=...)` time-travels to any earlier state
        T.StructField("snapshot", T.LongType(), False),
    ]
)


@dataclass
class PipelineResult:
    buckets_processed: List[int]
    buckets_skipped: List[int]
    rows_out: int
    snapshot: int = 0


def _manifest_path(output_dir: str) -> str:
    return str(Path(output_dir) / "_manifest")


def _data_path(output_dir: str) -> str:
    return str(Path(output_dir) / "data")


def read_manifest(spark: SparkSession, output_dir: str) -> Optional[DataFrame]:
    path = _manifest_path(output_dir)
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def completed_buckets(spark: SparkSession, output_dir: str) -> set:
    m = read_manifest(spark, output_dir)
    if m is None:
        return set()
    return {
        r.bucket for r in m.filter(F.col("status") == "done").select("bucket").collect()
    }


def _extract_html(sub: DataFrame) -> DataFrame:
    """Default extractor: HTML boilerplate strip (north-rule hot path)."""
    from ..extraction.html import extract_pages

    return extract_pages(sub).select(
        "url",
        "warc_ts",
        "lang",
        "bucket",
        F.col("extracted.text").alias("text"),
        F.col("extracted.status").alias("status"),
        F.col("extracted.blocks_kept").alias("blocks_kept"),
        F.col("extracted.blocks_dropped").alias("blocks_dropped"),
    )


def extract_pdf_pages(sub: DataFrame, payload_col: str = "html") -> DataFrame:
    """PDF-corpus extractor for the resumable pipeline: decodes real PDF
    byte streams (extraction/pdf.parse_pdf_bytes_udf — pypdf when present,
    pure-Python fallback otherwise). Metric mapping into the shared
    manifest schema: blocks_kept = decoded spans, blocks_dropped = 0 (the
    PDF path has no boilerplate classifier; decode failures surface via
    status, counted as parse_failures)."""
    from ..extraction.pdf import parse_pdf_bytes_udf

    return sub.select(
        "url",
        "warc_ts",
        "lang",
        "bucket",
        parse_pdf_bytes_udf(F.col(payload_col)).alias("e"),
    ).select(
        "url",
        "warc_ts",
        "lang",
        "bucket",
        F.col("e.text").alias("text"),
        F.col("e.status").alias("status"),
        F.col("e.n_spans").cast("long").alias("blocks_kept"),
        F.lit(0).cast("long").alias("blocks_dropped"),
    )


def extract_office_pages(sub: DataFrame, payload_col: str = "html") -> DataFrame:
    """DOCX/PPTX-corpus extractor for the resumable pipeline (the formats
    the reference accepts at config.py:52-66 and converts at
    processor.py:285-319): one Arrow stage, per-row format sniffing
    (extraction/ooxml.parse_office_udf). blocks_kept = extracted
    paragraphs; decode failures surface via status like the PDF path."""
    from ..extraction.ooxml import parse_office_udf

    return sub.select(
        "url",
        "warc_ts",
        "lang",
        "bucket",
        parse_office_udf(F.col(payload_col)).alias("e"),
    ).select(
        "url",
        "warc_ts",
        "lang",
        "bucket",
        F.col("e.text").alias("text"),
        F.col("e.status").alias("status"),
        F.col("e.n_paragraphs").cast("long").alias("blocks_kept"),
        F.lit(0).cast("long").alias("blocks_dropped"),
    )


def run_extraction_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    output_dir: str,
    run_id: str,
    source: str = "pages",
    n_buckets: int = 32,
    wave_size: int = 8,
    max_waves: Optional[int] = None,
    extractor=None,
    versioned: bool = False,
    reprocess: Optional[Sequence[int]] = None,
) -> PipelineResult:
    """Extract main content for every page, resumable per bucket.

    ``extractor`` maps a bucketed pages frame to rows of
    (url, warc_ts, lang, bucket, text, status, blocks_kept, blocks_dropped)
    — default is the HTML boilerplate strip; pass ``extract_pdf_pages`` for
    a PDF corpus. ``max_waves`` exists for tests (simulate a killed run by
    stopping after N waves); production leaves it None.

    ``versioned=True`` gives the output Iceberg-style snapshot semantics on
    plain parquet: data is partitioned by (bucket, run_id) so dynamic
    overwrite replaces only THIS run's partitions and every earlier run's
    data stays immutable on disk; the manifest is the snapshot log (one
    monotonically increasing ``snapshot`` id per run, latest entry per
    bucket = current table). Read with ``read_snapshot`` (current or
    ``as_of=`` an earlier snapshot id). ``reprocess`` lists buckets to redo
    even though the manifest marks them done (re-crawl / fixed extractor):
    in versioned mode that creates a new snapshot without destroying the
    old one.
    """
    extractor = extractor or _extract_html

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    done = completed_buckets(spark, output_dir)
    redo = {int(b) for b in (reprocess or ())}
    pending = [b for b in range(n_buckets) if b not in done or b in redo]

    m0 = read_manifest(spark, output_dir)
    prev_snap = 0
    if m0 is not None and "snapshot" in m0.columns:
        prev_snap = int(m0.agg(F.max("snapshot")).collect()[0][0] or 0)
    snapshot = prev_snap + 1

    # snapshot immutability guard: in versioned mode a (bucket, run_id)
    # data partition already recorded in the manifest is referenced by an
    # earlier snapshot — rewriting it would make read_snapshot(as_of=older)
    # silently serve new data. Resuming a KILLED run with the same run_id
    # stays legal: its pending buckets have no manifest entry yet.
    if versioned and m0 is not None:
        clash = sorted(
            r.bucket
            for r in m0.filter(
                (F.col("run_id") == run_id)
                & F.col("bucket").isin([int(b) for b in pending])
            )
            .select("bucket")
            .distinct()
            .collect()
        )
        if clash:
            raise ValueError(
                f"run_id {run_id!r} already holds snapshot data for buckets "
                f"{clash[:8]}{'...' if len(clash) > 8 else ''}; rewriting "
                "those (bucket, run_id) partitions would corrupt time "
                "travel — reprocess under a fresh run_id"
            )

    pages_b = pages.withColumn("bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)))

    waves: List[Sequence[int]] = [
        pending[i : i + wave_size] for i in range(0, len(pending), wave_size)
    ]
    if max_waves is not None:
        waves = waves[:max_waves]

    processed: List[int] = []
    total_rows_out = 0
    for wave in waves:
        t0 = time.time()
        sub = pages_b.filter(F.col("bucket").isin([int(b) for b in wave]))
        # rows_in counts the bucket's INPUT rows (pre-extraction) so the
        # kept/dropped accounting stays real even if a filter is ever added
        # above. Observation metrics piggyback on the write action — the
        # wave makes ONE pass over the input, not a second column-pruned
        # scan per wave (which at 100 TB is an extra url-column pass).
        obs = Observation(f"wave_{wave[0]}")
        sub = sub.observe(
            obs,
            *[
                F.sum(F.when(F.col("bucket") == int(b), 1).otherwise(0))
                .cast("long")
                .alias(f"b_{int(b)}")
                for b in wave
            ],
        )
        extracted = extractor(sub)
        # second observation: rows OUT per bucket, piggybacking on the same
        # single write pass — needed below to clear stale non-versioned
        # partitions when a redo produces zero rows (dynamic overwrite only
        # replaces partitions present in the new output)
        obs_out = Observation(f"wave_out_{wave[0]}")
        extracted = extracted.observe(
            obs_out,
            *[
                F.sum(F.when(F.col("bucket") == int(b), 1).otherwise(0))
                .cast("long")
                .alias(f"b_{int(b)}")
                for b in wave
            ],
        )
        # dynamic overwrite: only the partitions present in `extracted` are
        # replaced; a rerun of the same wave is idempotent. Versioned mode
        # adds run_id to the partitioning, so older runs' data is immutable.
        if versioned:
            extracted.withColumn("run_id", F.lit(run_id)).write.partitionBy(
                "bucket", "run_id"
            ).mode("overwrite").parquet(_data_path(output_dir))
        else:
            extracted.write.partitionBy("bucket").mode("overwrite").parquet(
                _data_path(output_dir)
            )
        wall_ms = int((time.time() - t0) * 1000)

        # the write action above populated the observation; a sum over an
        # all-empty wave comes back null, so coalesce to 0 (empty buckets
        # are legal: n_buckets can exceed the distinct-url count)
        obs_metrics = obs.get
        rows_in = {int(b): int(obs_metrics[f"b_{int(b)}"] or 0) for b in wave}
        out_counts = {int(b): int(obs_out.get[f"b_{int(b)}"] or 0) for b in wave}

        # non-versioned mode: a bucket whose new extraction yields zero rows
        # keeps its PRIOR partition on disk (dynamic overwrite never touches
        # it) — clear it explicitly so the read-back below cannot count a
        # previous run's rows as this run's output
        if not versioned:
            import shutil

            for b in wave:
                if out_counts[int(b)] == 0:
                    stale = Path(_data_path(output_dir)) / f"bucket={int(b)}"
                    if stale.exists():
                        shutil.rmtree(stale)

        # metrics from the committed data (read-back = what downstream sees);
        # an all-empty FIRST wave writes no data files, so the directory may
        # be absent or schema-less — catch ONLY AnalysisException (path not
        # found / cannot infer schema), so a genuine read failure (transient
        # FS error) propagates instead of silently zeroing lineage metrics
        from pyspark.errors import AnalysisException

        try:
            committed = spark.read.parquet(_data_path(output_dir)).filter(
                F.col("bucket").isin([int(b) for b in wave])
            )
            if versioned:  # stats for THIS run's data only
                committed = committed.filter(F.col("run_id") == run_id)
            stats = (
                committed.groupBy("bucket")
                .agg(
                    F.count("*").alias("rows_out"),
                    F.sum("blocks_kept").alias("blocks_kept"),
                    F.sum("blocks_dropped").alias("blocks_dropped"),
                    F.sum(
                        F.when(
                            F.col("status").isin("decode_error", "parse_error"), 1
                        ).otherwise(0)
                    ).alias("parse_failures"),
                )
                .collect()
            )
        except AnalysisException:
            stats = []
        by_bucket = {r.bucket: r for r in stats}
        manifest_rows = []
        for b in wave:
            r = by_bucket.get(b)
            manifest_rows.append(
                (
                    int(b),
                    run_id,
                    source,
                    "done",
                    int(rows_in.get(b, 0)),
                    int(r.rows_out) if r else 0,
                    int(r.blocks_kept) if r else 0,
                    int(r.blocks_dropped) if r else 0,
                    int(r.parse_failures) if r else 0,
                    wall_ms,
                    snapshot,
                )
            )
            total_rows_out += int(r.rows_out) if r else 0
            processed.append(int(b))
        spark.createDataFrame(manifest_rows, MANIFEST_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(_manifest_path(output_dir))

    return PipelineResult(
        buckets_processed=processed,
        buckets_skipped=sorted(done - redo),
        rows_out=total_rows_out,
        snapshot=snapshot,
    )


def live_partitions(manifest: DataFrame, as_of: Optional[int] = None) -> DataFrame:
    """The snapshot-log selection at the heart of time travel: for each
    bucket, the manifest entry with the highest snapshot <= ``as_of``
    (all snapshots when None) names the (bucket, run_id) data partition
    live at that point. Returns (bucket, run_id, snapshot) — exposed
    standalone so the algebra is oracle-checkable (`snapshot_time_travel`
    query) independent of any on-disk table."""
    m = manifest
    if as_of is not None:
        m = m.filter(F.col("snapshot") <= int(as_of))
    w = Window.partitionBy("bucket").orderBy(F.desc("snapshot"))
    return (
        m.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("bucket", "run_id", "snapshot")
    )


def read_snapshot(
    spark: SparkSession, output_dir: str, as_of: Optional[int] = None
) -> DataFrame:
    """Read a versioned table at a snapshot: the CURRENT state by default,
    or the state as of an earlier ``snapshot`` id (time travel).

    The manifest is the snapshot log: for each bucket, the entry with the
    highest snapshot <= as_of names the (bucket, run_id) data partition
    that was live then. The selection is a tiny broadcast join against the
    two partition columns, so dynamic partition pruning keeps the scan to
    exactly the live partitions."""
    m = read_manifest(spark, output_dir)
    if m is None or "snapshot" not in m.columns:
        raise ValueError(f"no snapshot manifest at {output_dir}")
    if as_of is not None and int(as_of) < _expiry_watermark(output_dir):
        raise ValueError(
            f"snapshot {as_of} expired (watermark "
            f"{_expiry_watermark(output_dir)}): its data was removed "
            f"by expire_snapshots"
        )
    live = live_partitions(m, as_of).select("bucket", "run_id")
    data = spark.read.parquet(_data_path(output_dir))
    if "run_id" not in data.columns:
        raise ValueError(
            f"{output_dir} is not a versioned table (run versioned=True)"
        )
    return data.join(F.broadcast(live), ["bucket", "run_id"])


def _expiry_watermark_path(output_dir: str) -> Path:
    return Path(output_dir) / "_expired_before"


def _expiry_watermark(output_dir: str) -> int:
    p = _expiry_watermark_path(output_dir)
    try:
        return int(p.read_text().strip())
    except (OSError, ValueError):
        return 0


def expire_snapshots(
    spark: SparkSession, output_dir: str, keep_last: int = 2
) -> int:
    """Iceberg-style snapshot expiry: drop the data partitions no kept
    snapshot references, so versioned storage growth is bounded (at 100 TB
    a re-crawl would otherwise double the table every run).

    Keeps the last ``keep_last`` snapshots readable — for each kept
    snapshot, the latest (bucket, run_id) entry per bucket stays on disk
    (including entries older than the watermark that are still live for a
    kept snapshot). Reads below the watermark raise in ``read_snapshot``.
    Deletion is a driver-side directory remove per expired partition
    (swap in the object-store delete API on a real cluster). Returns the
    number of partitions deleted."""
    import shutil

    m = read_manifest(spark, output_dir)
    if m is None or "snapshot" not in m.columns:
        raise ValueError(f"no snapshot manifest at {output_dir}")
    snaps = sorted(
        r.snapshot for r in m.select("snapshot").distinct().collect()
    )
    if len(snaps) <= keep_last:
        return 0
    watermark = snaps[-keep_last]
    # live = referenced by ANY kept snapshot. Kept snapshots are the
    # suffix s >= watermark, so live = the table state AT the watermark
    # (per-bucket latest entry with snapshot <= watermark — a bucket
    # rewritten at the watermark makes its older entries dead) plus every
    # entry written after it
    w = Window.partitionBy("bucket").orderBy(F.desc("snapshot"))
    state_at_watermark = (
        m.filter(F.col("snapshot") <= watermark)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("bucket", "run_id")
    )
    live = {
        (r.bucket, r.run_id)
        for r in m.filter(F.col("snapshot") > watermark)
        .select("bucket", "run_id")
        .unionByName(state_at_watermark)
        .distinct()
        .collect()
    }
    all_pairs = {
        (r.bucket, r.run_id)
        for r in m.select("bucket", "run_id").distinct().collect()
    }
    # watermark BEFORE deletion: if the process dies mid-expiry, reads below
    # the watermark fail fast ("expired") instead of silently serving a
    # partial table from half-deleted partitions
    _expiry_watermark_path(output_dir).write_text(str(watermark))
    deleted = 0
    for bucket, run_id in sorted(all_pairs - live):
        part = Path(_data_path(output_dir)) / f"bucket={bucket}" / f"run_id={run_id}"
        if part.exists():
            shutil.rmtree(part)
            deleted += 1
    return deleted


def delete_where(
    spark: SparkSession,
    output_dir: str,
    predicate,
    run_id: str,
    source: str = "delete",
    _fail_before_manifest: bool = False,
) -> PipelineResult:
    """Row-level DELETE on a versioned table as a NEW snapshot — the
    copy-on-write strategy Iceberg calls eager row-level delete, matching
    the reference's delete-by-document-id semantics (ref
    vector_db.py:422-437 deletes by doc id from the persistent
    collection).

    Mechanics: only the buckets that actually contain matching rows are
    rewritten — their CURRENT live rows minus the victims land in fresh
    ``(bucket, run_id)`` partitions under snapshot N+1; unaffected
    buckets keep their existing manifest entries live (per-bucket-latest
    selection), so the delete's write cost is proportional to the
    affected data, not the table. History is preserved: every earlier
    snapshot's partitions are untouched and ``read_snapshot(as_of=N)``
    still serves the pre-delete rows.

    Crash safety (same contract as the extraction pipeline): data
    partitions are written BEFORE the single manifest append, so a kill
    mid-delete leaves either (a) orphan unreferenced partitions — invisible
    to every reader, and a rerun with the same run_id dynamically
    overwrites them — or (b) a fully committed delete, in which case the
    rerun finds no matching rows and no-ops. ``_fail_before_manifest`` is
    the test hook that simulates (a).

    ``predicate`` is a Column or SQL string over the table's columns.
    Returns a PipelineResult whose rows_out counts DELETED rows and whose
    buckets_processed lists the rewritten buckets.

    NOTE (also applies to merge_into): a ``source``/predicate frame
    LAZILY DERIVED from this same table would be re-evaluated during the
    rewrite against partially overwritten partitions — materialize such
    frames (collect/checkpoint) before calling."""
    t0 = time.time()
    m = read_manifest(spark, output_dir)
    if m is None or "snapshot" not in m.columns:
        raise ValueError(f"no snapshot manifest at {output_dir}")
    prev_snap = int(m.agg(F.max("snapshot")).collect()[0][0] or 0)
    cond = F.expr(predicate) if isinstance(predicate, str) else predicate

    current = read_snapshot(spark, output_dir)
    # per-bucket live/victim counts in ONE bounded aggregate (buckets are
    # O(10k) at most): victims>0 marks the bucket affected
    counts = {
        int(r.bucket): (int(r.live), int(r.victims))
        for r in current.groupBy("bucket")
        .agg(
            F.count("*").alias("live"),
            F.sum(F.when(cond, 1).otherwise(0)).alias("victims"),
        )
        .collect()
    }
    affected = sorted(b for b, (_, v) in counts.items() if v > 0)
    if not affected:
        return PipelineResult(
            buckets_processed=[], buckets_skipped=sorted(counts),
            rows_out=0, snapshot=prev_snap,
        )

    # snapshot-immutability guard (same rule as the pipeline): this
    # run_id must not already own manifest-referenced partitions for the
    # buckets being rewritten
    clash = sorted(
        r.bucket
        for r in m.filter(
            (F.col("run_id") == run_id)
            & F.col("bucket").isin([int(b) for b in affected])
        )
        .select("bucket")
        .distinct()
        .collect()
    )
    if clash:
        raise ValueError(
            f"run_id {run_id!r} already holds snapshot data for buckets "
            f"{clash[:8]}{'...' if len(clash) > 8 else ''}; delete under a "
            "fresh run_id"
        )

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    survivors = (
        current.filter(F.col("bucket").isin([int(b) for b in affected]))
        .filter(~cond)
        .drop("run_id")
        .withColumn("run_id", F.lit(run_id))
    )
    survivors.write.partitionBy("bucket", "run_id").mode("overwrite").parquet(
        _data_path(output_dir)
    )
    if _fail_before_manifest:
        raise RuntimeError("simulated kill between data write and manifest append")

    # read-back stats from the COMMITTED partitions (what downstream sees)
    from pyspark.errors import AnalysisException

    try:
        committed = (
            spark.read.parquet(_data_path(output_dir))
            .filter(F.col("run_id") == run_id)
            .filter(F.col("bucket").isin([int(b) for b in affected]))
        )
        stats = {
            int(r.bucket): r
            for r in committed.groupBy("bucket")
            .agg(
                F.count("*").alias("rows_out"),
                F.sum("blocks_kept").alias("blocks_kept"),
                F.sum("blocks_dropped").alias("blocks_dropped"),
                F.sum(
                    F.when(
                        F.col("status").isin("decode_error", "parse_error"), 1
                    ).otherwise(0)
                ).alias("parse_failures"),
            )
            .collect()
        }
    except AnalysisException:  # every affected bucket fully deleted
        stats = {}
    wall_ms = int((time.time() - t0) * 1000)
    snapshot = prev_snap + 1
    manifest_rows = []
    deleted_total = 0
    for b in affected:
        live, victims = counts[b]
        r = stats.get(b)
        deleted_total += victims
        manifest_rows.append(
            (
                int(b),
                run_id,
                source,
                "done",
                int(live),
                int(r.rows_out) if r else 0,
                int(r.blocks_kept) if r else 0,
                int(r.blocks_dropped) if r else 0,
                int(r.parse_failures) if r else 0,
                wall_ms,
                snapshot,
            )
        )
    spark.createDataFrame(manifest_rows, MANIFEST_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(_manifest_path(output_dir))
    return PipelineResult(
        buckets_processed=[int(b) for b in affected],
        buckets_skipped=sorted(set(counts) - set(affected)),
        rows_out=deleted_total,
        snapshot=snapshot,
    )


def merge_into(
    spark: SparkSession,
    output_dir: str,
    source: DataFrame,
    run_id: str,
    key_col: str = "url",
    source_name: str = "merge",
    _fail_before_manifest: bool = False,
) -> PipelineResult:
    """MERGE (upsert) into a versioned table as a new snapshot — the
    copy-on-write "when matched update, when not matched insert" strategy,
    keyed on ``key_col``. Completes the DELETE/MERGE pair on the snapshot
    layer (delete_where is the other half).

    The source frame must carry the table's columns (minus run_id) and a
    ``bucket`` is derived from the key with the SAME hash the pipeline
    uses, so a source row lands in the bucket its key already lives in.
    Only buckets receiving source rows are rewritten: their live rows
    minus matched keys, unioned with the source rows, land in fresh
    ``(bucket, run_id)`` partitions under snapshot N+1. Unaffected
    buckets ride their existing manifest entries; history and time travel
    are preserved exactly as in delete_where, with the same crash
    contract (data before the single manifest append; same-run_id rerun
    overwrites orphans and commits once).

    Returns a PipelineResult: rows_out = rows written into the rewritten
    buckets (updates + inserts + untouched co-bucketed rows)."""
    t0 = time.time()
    m = read_manifest(spark, output_dir)
    if m is None or "snapshot" not in m.columns:
        raise ValueError(f"no snapshot manifest at {output_dir}")
    prev_snap = int(m.agg(F.max("snapshot")).collect()[0][0] or 0)

    n_buckets = int(
        m.agg(F.max("bucket")).collect()[0][0] or 0
    ) + 1  # manifest covers every bucket ever written
    src = source.drop("run_id", "bucket").withColumn(
        "bucket", F.pmod(F.xxhash64(key_col), F.lit(n_buckets)).cast("int")
    )
    affected = sorted(
        int(r.bucket) for r in src.select("bucket").distinct().collect()
    )
    if not affected:
        return PipelineResult(
            buckets_processed=[], buckets_skipped=[], rows_out=0,
            snapshot=prev_snap,
        )
    clash = sorted(
        r.bucket
        for r in m.filter(
            (F.col("run_id") == run_id)
            & F.col("bucket").isin([int(b) for b in affected])
        )
        .select("bucket")
        .distinct()
        .collect()
    )
    if clash:
        raise ValueError(
            f"run_id {run_id!r} already holds snapshot data for buckets "
            f"{clash[:8]}{'...' if len(clash) > 8 else ''}; merge under a "
            "fresh run_id"
        )

    current = read_snapshot(spark, output_dir)
    kept = (
        current.filter(F.col("bucket").isin([int(b) for b in affected]))
        .join(src.select(key_col), key_col, "left_anti")  # matched -> replaced
        .drop("run_id")
    )
    merged = kept.unionByName(src.select(*kept.columns)).withColumn(
        "run_id", F.lit(run_id)
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    merged.write.partitionBy("bucket", "run_id").mode("overwrite").parquet(
        _data_path(output_dir)
    )
    if _fail_before_manifest:
        raise RuntimeError("simulated kill between data write and manifest append")

    committed = (
        spark.read.parquet(_data_path(output_dir))
        .filter(F.col("run_id") == run_id)
        .filter(F.col("bucket").isin([int(b) for b in affected]))
    )
    stats = {
        int(r.bucket): r
        for r in committed.groupBy("bucket")
        .agg(
            F.count("*").alias("rows_out"),
            F.sum("blocks_kept").alias("blocks_kept"),
            F.sum("blocks_dropped").alias("blocks_dropped"),
            F.sum(
                F.when(
                    F.col("status").isin("decode_error", "parse_error"), 1
                ).otherwise(0)
            ).alias("parse_failures"),
        )
        .collect()
    }
    src_counts = {
        int(r.bucket): int(r.n)
        for r in src.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    wall_ms = int((time.time() - t0) * 1000)
    snapshot = prev_snap + 1
    manifest_rows = []
    total_out = 0
    for b in affected:
        r = stats.get(b)
        total_out += int(r.rows_out) if r else 0
        manifest_rows.append(
            (
                int(b),
                run_id,
                source_name,
                "done",
                int(src_counts.get(b, 0)),
                int(r.rows_out) if r else 0,
                int(r.blocks_kept) if r else 0,
                int(r.blocks_dropped) if r else 0,
                int(r.parse_failures) if r else 0,
                wall_ms,
                snapshot,
            )
        )
    spark.createDataFrame(manifest_rows, MANIFEST_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(_manifest_path(output_dir))
    return PipelineResult(
        buckets_processed=[int(b) for b in affected],
        buckets_skipped=[],
        rows_out=total_out,
        snapshot=snapshot,
    )


def compact_buckets(
    spark: SparkSession,
    output_dir: str,
    run_id: str,
    buckets: Optional[Sequence[int]] = None,
    target_files: int = 1,
) -> PipelineResult:
    """Table maintenance: rewrite each live bucket's (possibly many small)
    data files into ``target_files`` files under a NEW snapshot — the
    Iceberg rewrite_data_files analog, completing the maintenance trio
    with delete_where/merge_into (same copy-on-write + crash contract)
    and expire_snapshots (which reclaims the superseded partitions).
    Row content is bit-identical by construction; only the file layout
    changes. ``buckets=None`` compacts every live bucket."""
    t0 = time.time()
    m = read_manifest(spark, output_dir)
    if m is None or "snapshot" not in m.columns:
        raise ValueError(f"no snapshot manifest at {output_dir}")
    prev_snap = int(m.agg(F.max("snapshot")).collect()[0][0] or 0)
    live = {int(r.bucket) for r in live_partitions(m).collect()}
    targets = sorted(live if buckets is None else (set(map(int, buckets)) & live))
    if not targets:
        return PipelineResult([], sorted(live), 0, prev_snap)
    clash = sorted(
        r.bucket
        for r in m.filter(
            (F.col("run_id") == run_id)
            & F.col("bucket").isin([int(b) for b in targets])
        )
        .select("bucket")
        .distinct()
        .collect()
    )
    if clash:
        raise ValueError(
            f"run_id {run_id!r} already holds snapshot data for buckets "
            f"{clash[:8]}{'...' if len(clash) > 8 else ''}; compact under a "
            "fresh run_id"
        )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    current = read_snapshot(spark, output_dir)
    (
        current.filter(F.col("bucket").isin([int(b) for b in targets]))
        .drop("run_id")
        .withColumn("run_id", F.lit(run_id))
        .repartition(max(1, target_files) * len(targets), "bucket")
        .sortWithinPartitions("bucket")
        .write.partitionBy("bucket", "run_id")
        .mode("overwrite")
        .parquet(_data_path(output_dir))
    )
    committed = (
        spark.read.parquet(_data_path(output_dir))
        .filter(F.col("run_id") == run_id)
        .filter(F.col("bucket").isin([int(b) for b in targets]))
    )
    stats = {
        int(r.bucket): r
        for r in committed.groupBy("bucket")
        .agg(
            F.count("*").alias("rows_out"),
            F.sum("blocks_kept").alias("blocks_kept"),
            F.sum("blocks_dropped").alias("blocks_dropped"),
            F.sum(
                F.when(
                    F.col("status").isin("decode_error", "parse_error"), 1
                ).otherwise(0)
            ).alias("parse_failures"),
        )
        .collect()
    }
    wall_ms = int((time.time() - t0) * 1000)
    snapshot = prev_snap + 1
    manifest_rows = []
    total = 0
    for b in targets:
        r = stats.get(b)
        total += int(r.rows_out) if r else 0
        manifest_rows.append(
            (
                int(b), run_id, "compact", "done",
                int(r.rows_out) if r else 0,  # rows_in == rows_out: rewrite
                int(r.rows_out) if r else 0,
                int(r.blocks_kept) if r else 0,
                int(r.blocks_dropped) if r else 0,
                int(r.parse_failures) if r else 0,
                wall_ms, snapshot,
            )
        )
    spark.createDataFrame(manifest_rows, MANIFEST_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(_manifest_path(output_dir))
    return PipelineResult(
        buckets_processed=[int(b) for b in targets],
        buckets_skipped=sorted(live - set(targets)),
        rows_out=total,
        snapshot=snapshot,
    )


def snapshots(spark: SparkSession, output_dir: str) -> DataFrame:
    """The snapshot log: one row per snapshot with its run lineage and
    aggregate metrics (what Iceberg surfaces as the snapshots table)."""
    m = read_manifest(spark, output_dir)
    if m is None or "snapshot" not in m.columns:
        raise ValueError(f"no snapshot manifest at {output_dir}")
    return (
        m.groupBy("snapshot", "run_id", "source")
        .agg(
            F.count("*").alias("buckets"),
            F.sum("rows_out").alias("rows_out"),
            F.sum("parse_failures").alias("parse_failures"),
        )
        .orderBy("snapshot")
    )
