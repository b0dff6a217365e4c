"""Benchmark harness (driver contract): headline queries at
$SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS], plus the north-rule
two-cluster-size scaling evidence.

Scaling methodology (documented in BENCH/BASELINE.md):
- the job = parquet scan of a materialized synthetic pages corpus ->
  boilerplate-strip UDF -> status aggregation (the end-to-end extract path);
- run at N and 4N cores in SEPARATE subprocesses pinned with taskset, so
  "N cores" means N physical CPUs for JVM + Python workers combined —
  unpinned local[N] only limits task slots while JVM/Python threads spill
  onto all CPUs and inflate the small-N baseline;
- N defaults to CPUS/16 (2 when CPUS=32): this sandbox is a shared box with
  double-digit host load averages, and leaving free CPUs for that noise
  keeps the measurement about OUR job's scaling, not the neighbors';
- FLEET-EQUIVALENT control (equal hardware contention): the small config
  runs as 4N/N CONCURRENT N-core instances, each pinned to its own core
  slice of the same 4N-core window the big config uses, all processing the
  full corpus. The north rule compares an N-core-executor fleet against a
  4N-core fleet — in both fleets every node runs all cores busy with the
  same work, so per-core clock, L3, and memory-bandwidth contention are
  identical across configs. An IDLE-sibling 2-core run instead gets the
  whole socket's turbo headroom, cache, and bandwidth to itself (measured
  here: ~30% higher per-core throughput than the same code at 8-busy-cores
  — pure hardware contention, not coordination), deflating measured
  efficiency while saying nothing about the code. Efficiency =
  docs_per_sec(one 4N-core run) / (4 x docs_per_sec(one N-core instance,
  best instance across the concurrent fleet — the conservative baseline));
- visits are interleaved with a slice warm-up per visit and min-of-reps per
  config, so host-load drift biases neither side; reps are sized to ~30-60 s
  so tens-of-seconds noise bursts average out instead of voiding a sample.

Prints exactly ONE JSON line to stdout; progress goes to stderr.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_SMALL = max(1, CPUS // 16)
N_BIG = N_SMALL * 4
# 75k keeps the whole bench (6 fixed visits, 3 of them small fleets)
# inside the 10-minute budget even on loud windows (a 110k run measured
# 539 s loud and a 100k run overran 590 s on a worse one; a 160k/7-visit
# run overran outright); docs/s and the efficiency ratio are
# corpus-size-normalized, so records stay comparable across rounds.
# Rep sizing: for a MIN estimator under tens-of-seconds noise bursts, more
# short reps beat fewer long ones (each rep is a fresh chance to land in a
# clean window); the noise-sensitive fast config gets the extra reps.
BENCH_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "75000"))
REPS_PER_VISIT = {"small": 2, "big": 4}
# FIXED pre-declared schedule of (small, big) visit PAIRS — never extended
# at runtime. (The round-2 harness bought extra pairs only while
# efficiency < 0.8, an optional-stopping rule that biases the reported
# number upward; this schedule is unconditional in the metric.)
# STRICT alternation forms 3 pairs adjacent in time: the round-3 schedule
# ended with two big visits, so a loud second half hit only the big
# medians and sank the ratio-of-medians read while the min survived.
# Pairing supports the blocked-design estimator below (per-pair ratios;
# noise common to a pair cancels in its ratio) and buys the small config 6
# samples instead of 4 — the min estimator's honest direction, since an
# inflated small-side min OVERSTATES efficiency.
N_PAIRS = 3
# Budget truncation (TIME-based only, never metric-based, so it cannot
# optional-stop toward a pass): if starting another pair would overrun the
# wall budget, remaining pairs are dropped WHOLE — a truncated record
# beats a timeout that records nothing. Pairs are atomic: dropping one
# config's visit but not its partner's would bias the paired median.
# r7: the deadline clock starts at the SCALING PHASE start (not process
# start), so neither the headline phase nor a load-gate wait can eat the
# pair schedule — r6/r7 records on slow windows truncated to 1 pair and
# recorded only cold visits.
PAIR_DEADLINE_SEC = float(os.environ.get("SPARK_GRAFT_BENCH_DEADLINE", "360"))

# Load gate (VERDICT r6 #1): poll the 1-min load average and defer the
# measured phases — bounded wait, then run UNCONDITIONALLY (the schedule
# itself never depends on mid-run metrics, so no optional stopping). The
# two gate points (process start, scaling-phase start) share one wait
# budget. In this VM loadavg only sees OUR kernel's runqueue; hypervisor
# neighbors show up as steal time instead, so the record also carries
# per-phase steal/busy forensics from /proc/stat.
LOADGATE_MAX_WAIT = float(os.environ.get("SPARK_GRAFT_LOADGATE_MAX_WAIT", "1800"))
LOADGATE_STEP = float(os.environ.get("SPARK_GRAFT_LOADGATE_STEP", "120"))
LOADGATE_LOAD = float(os.environ.get("SPARK_GRAFT_LOADGATE_LOAD", "2.0"))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "orders_rank_in_customer",
    "events_hourly_by_type",
    "emb_context_preservation",
    "emb_cosine_topk",
    "doc_lang_quality",
    "extract_roundtrip",
    "chunk_simple",
    "dedup_minhash_lsh",
]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# child mode: one pinned scaling visit
# ---------------------------------------------------------------------------


def scaling_child(
    cores: int, pages_path: str, sync_file: str = "", reps: int = 2
) -> None:
    from docling_japanese_books_spark.session import get_spark
    from docling_japanese_books_spark.extraction.html import extract_pages
    from pyspark.sql import functions as F

    spark = get_spark(
        f"scale{cores}",
        cores=cores,
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "8192"},
    )

    def job(limit=None):
        pages = spark.read.parquet(pages_path)
        if limit:
            pages = pages.limit(limit)
        return (
            extract_pages(pages)
            .groupBy("extracted.status")
            .agg(F.count("*").alias("n"))
            .collect()
        )

    # warm-up on a slice: starts python workers + JIT without paying a
    # full run (the fast config would otherwise burn 1 of its 4x headroom)
    job(limit=8000)
    if sync_file:
        # start barrier for fleet visits: announce readiness, then wait for
        # the parent to release every instance at once, so all core slices
        # stay busy for the whole measured window (no straggler drift)
        print("READY", flush=True)
        while not Path(sync_file).exists():
            time.sleep(0.05)
    n_docs = None
    times = []
    for _ in range(reps):
        t0 = time.time()
        rows = job()
        times.append(time.time() - t0)
        n_docs = sum(r.n for r in rows)
    print(json.dumps({"n_docs": n_docs, "times": times}), flush=True)
    spark.stop()


def _child_cmd(
    cores: int, pages_path: str, pin: str, sync_file: str, reps: int
) -> list:
    cmd = [
        sys.executable,
        str(REPO / "bench.py"),
        "--scaling-child",
        str(cores),
        pages_path,
        sync_file,
        str(reps),
    ]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", pin] + cmd
    return cmd


def run_visit(cores: int, pages_path: str) -> dict:
    """One visit at ``cores`` (fleet-equivalent control, see module docstring).

    Big config (cores == N_BIG): ONE instance pinned to the whole window.
    Small config: N_BIG/cores concurrent instances, each pinned to its own
    disjoint slice, released together by a start barrier after warm-up —
    the window is fully busy with identical work in both configs, so
    hardware contention cancels out of the efficiency ratio. Returns
    {'n_docs': ..., 'times': [...]}; for the small config the times are the
    BEST instance's reps (conservative: the fastest instance sets the
    baseline the big config must scale against)."""
    n_instances = max(1, N_BIG // cores)
    reps = REPS_PER_VISIT["big" if cores == N_BIG else "small"]
    sync_file = ""
    if n_instances > 1:
        sync_file = str(Path(tempfile.mkdtemp(prefix="bench_sync_")) / "go")
    procs = []
    for i in range(n_instances):
        pin = f"{i * cores}-{(i + 1) * cores - 1}"
        procs.append(
            subprocess.Popen(
                _child_cmd(cores, pages_path, pin, sync_file, reps),
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
                text=True,
                cwd=str(REPO),
                env=os.environ,
            )
        )
    try:
        if n_instances > 1:
            for p in procs:  # wait for every instance's warm-up
                line = p.stdout.readline()
                while line and line.strip() != "READY":
                    line = p.stdout.readline()
            Path(sync_file).touch()  # release the fleet together
        results = []
        for p in procs:
            rest = p.stdout.read()
            p.wait()
            lines = rest.strip().splitlines()
            if p.returncode != 0 or not lines:
                # a dead instance (OOM, kill) must fail THIS visit loudly,
                # not crash the whole bench without its JSON result line
                raise RuntimeError(
                    f"scaling child (cores={cores}) exited rc={p.returncode}"
                )
            results.append(json.loads(lines[-1]))
    finally:
        if sync_file:
            shutil.rmtree(Path(sync_file).parent, ignore_errors=True)
    n_docs = results[0]["n_docs"]
    if n_instances == 1:
        return {"n_docs": n_docs, "times": results[0]["times"]}
    best = min(results, key=lambda r: min(r["times"]))
    return {"n_docs": n_docs, "times": best["times"]}


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------


def load_query_floors() -> dict:
    """Cross-run best-known per-query times from every prior BENCH_r*.json
    in the repo. PURELY METADATA: the floors never alter reps, scheduling,
    or truncation (those stay unconditional) — they exist so a record
    taken on a saturated window self-identifies (round-4's 8.16 s headline
    vs a 5.1 s quiet-window truth was only diagnosable by rerunning)."""
    floors: dict = {}
    for f in sorted(REPO.glob("BENCH_r*.json")):
        try:
            data = json.loads(f.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        # the driver wraps bench stdout under "parsed"; accept both shapes
        if not data.get("queries") and isinstance(data.get("parsed"), dict):
            data = data["parsed"]
        for q, t in (data.get("queries") or {}).items():
            if isinstance(t, (int, float)):
                floors[q] = min(floors.get(q, t), t)
    return floors


def load_scaling_floors() -> dict:
    """Cross-run best docs/sec per scaling config from every prior
    BENCH_r*.json (throughput, so records with different corpus sizes
    stay comparable). Same discipline as load_query_floors: PURE
    METADATA — visits, reps, and scheduling stay unconditional; the
    floors exist so a scaling record taken on an eaten window
    self-identifies instead of reading as a regression (round-5's
    driver record read 0.60-0.72 with a big-side min 1.5x above its
    cross-run best, and nothing in the record said so)."""
    floors: dict = {"small": 0.0, "big": 0.0}
    for f in sorted(REPO.glob("BENCH_r*.json")):
        try:
            data = json.loads(f.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        if "extract_scaling" not in data and isinstance(data.get("parsed"), dict):
            data = data["parsed"]
        sc = data.get("extract_scaling") or {}
        for which in ("small", "big"):
            dps = sc.get(f"docs_per_sec_{which}")
            if isinstance(dps, (int, float)):
                floors[which] = max(floors[which], float(dps))
    return floors


def run_headline(spark) -> dict:
    import __spark_entry__ as entry

    qs = entry.queries()
    # warm-up: touch every fixture table + compile one trivial plan so the
    # first timed query doesn't absorb JVM JIT + footer reads
    from docling_japanese_books_spark.session import TABLES

    for name in TABLES:
        spark.read.parquet(f"{SF_DIR}/{name}.parquet").count()

    times = {}
    for name in HEADLINE:
        def one_rep() -> float:
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            return time.time() - t0

        reps = [one_rep(), one_rep()]
        # noise-triggered escalation: two samples disagreeing >2x means a
        # host-noise burst ate at least one — buy up to 3 more reps so the
        # min recovers the true time (noise only ever SLOWS a rep). The
        # trigger is sample disagreement, never the metric's value, so it
        # doesn't optional-stop toward a pass threshold.
        while max(reps) / min(reps) > 2.0 and len(reps) < 5:
            log(f"  {name}: reps disagree >2x ({[round(r, 2) for r in reps]}); extra rep")
            reps.append(one_rep())
        times[name] = round(min(reps), 3)
        log(f"  {name}: {times[name]}s")
    return times


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-child":
        scaling_child(
            int(sys.argv[2]),
            sys.argv[3],
            sys.argv[4] if len(sys.argv) > 4 else "",
            int(sys.argv[5]) if len(sys.argv) > 5 else 2,
        )
        return

    def loadavg() -> list:
        try:
            return [float(x) for x in Path("/proc/loadavg").read_text().split()[:3]]
        except (OSError, ValueError):  # non-Linux: no forensics, no crash
            return []

    def cpu_times() -> list:
        """Aggregate jiffies (user nice system idle iowait irq softirq
        steal) — per-segment deltas give busy%/steal% forensics."""
        try:
            return [int(x) for x in Path("/proc/stat").read_text().split("\n")[0].split()[1:9]]
        except (OSError, ValueError, IndexError):
            return []

    cpu_marks = {"start": cpu_times()}
    cpu_segments: dict = {}
    last_mark = ["start"]

    def mark_cpu(name: str) -> None:
        now = cpu_times()
        prev = cpu_marks.get(last_mark[0])
        if now and prev and len(now) == len(prev):
            d = [b - a for a, b in zip(prev, now)]
            tot = sum(d) or 1
            cpu_segments[f"{last_mark[0]}->{name}"] = {
                "busy_pct": round(100 * (d[0] + d[1] + d[2]) / tot, 1),
                "steal_pct": round(100 * d[7] / tot, 2),
            }
        cpu_marks[name] = now
        last_mark[0] = name

    gate_budget = [LOADGATE_MAX_WAIT]
    gate_log: dict = {}

    def load_gate(point: str) -> None:
        """Defer this phase until the 1-min load is quiet, the shared wait
        budget runs out, or loadavg is unreadable. Wait-only: once the
        phase starts, nothing downstream consults the load again."""
        waited = 0.0
        seen = []
        while True:
            l = loadavg()
            seen.append(l[0] if l else None)
            if not l or l[0] < LOADGATE_LOAD:
                break
            if waited >= gate_budget[0]:
                log(f"load gate [{point}]: budget exhausted at load {l[0]}; running anyway")
                break
            step = min(LOADGATE_STEP, gate_budget[0] - waited)
            log(f"load gate [{point}]: 1-min load {l[0]} >= {LOADGATE_LOAD}; waiting {step:.0f}s")
            time.sleep(step)
            waited += step
        gate_budget[0] -= waited
        gate_log[point] = {"waited_sec": round(waited, 0), "loads_seen": seen}

    load_gate("bench_start")
    host_load = {"start": loadavg()}

    t_start = time.time()
    tmp = tempfile.mkdtemp(prefix="bench_pages_")
    pages_path = str(Path(tmp) / "pages")
    try:
        from docling_japanese_books_spark.session import get_spark
        from docling_japanese_books_spark.extraction.pages import generate_pages

        spark = get_spark("bench", cores=CPUS)
        log(f"materializing {BENCH_PAGES} heavy pages -> {pages_path}")
        generate_pages(
            spark, BENCH_PAGES, seed=42, min_paras=10, max_paras=30
        ).repartition(64).write.mode("overwrite").option(
            # 64 partitions for the 75k corpus: measured 2.1 s vs 2.7 s at
            # 128 (8 cores) — the 128 chosen for 120k straggler smoothing
            # is pure scheduling overhead at this size, and it taxes the
            # big config (16 task waves) more than the small fleet
            "compression", "none"  # decode work steals pinned CPUs from the UDF
        ).parquet(pages_path)

        log(f"headline queries at local[{CPUS}] on {SF_DIR}")
        times = run_headline(spark)
        spark.stop()
        host_load["after_headline"] = loadavg()
        mark_cpu("after_headline")

        # gate the scaling phase (VERDICT r6 #1), then re-base the pair
        # deadline so the wait + headline never eat the pair schedule
        load_gate("scaling_start")
        t_scaling = time.time()

        # interleaved pinned scaling visits: N, 4N, N, 4N
        samples = {N_SMALL: [], N_BIG: []}
        n_docs = 0
        def visit_with_retry(cores: int) -> dict:
            try:
                return run_visit(cores, pages_path)
            except Exception as ex:  # one retry: a lost visit, not a lost bench
                log(f"visit at {cores} cores failed ({ex}); retrying once")
                return run_visit(cores, pages_path)

        visit_minima = {"small": [], "big": []}
        pairs_run = 0
        for pair_idx in range(N_PAIRS):
            elapsed = time.time() - t_scaling
            if pair_idx > 0 and elapsed > PAIR_DEADLINE_SEC:
                log(
                    f"budget truncation: {elapsed:.0f}s scaling elapsed > "
                    f"{PAIR_DEADLINE_SEC:.0f}s deadline; dropping "
                    f"{N_PAIRS - pair_idx} whole pair(s)"
                )
                break
            for which in ("small", "big"):
                cores = N_SMALL if which == "small" else N_BIG
                log(f"scaling visit: {cores} pinned cores (pair {pair_idx + 1})")
                r = visit_with_retry(cores)
                samples[cores].extend(r["times"])
                visit_minima[which].append(min(r["times"]))
                n_docs = r["n_docs"]
            host_load[f"after_pair_{pair_idx + 1}"] = loadavg()
            mark_cpu(f"after_pair_{pair_idx + 1}")
            pairs_run += 1

        t_small = min(samples[N_SMALL])
        t_big = min(samples[N_BIG])
        dps_small = n_docs / t_small
        dps_big = n_docs / t_big
        eff = dps_big / (4.0 * dps_small)

        def median(xs):
            s = sorted(xs)
            mid = len(s) // 2
            return s[mid] if len(s) % 2 else 0.5 * (s[mid - 1] + s[mid])

        # supplementary noise-inclusive estimates (all three reported;
        # BASELINE.md documents the methodology):
        # - ratio of medians: samples noise on both sides, but a drift or
        #   loud patch that covers one config's visits more than the
        #   other's lands fully in the ratio;
        # - BLOCKED paired median: each (small, big) visit pair is adjacent
        #   in time, so noise common to the pair largely cancels in its
        #   per-pair ratio; the median over the 3 pre-declared pairs is the
        #   drift-robust noise-inclusive read. Both use visit-level minima
        #   (intra-visit bursts removed; cross-visit noise retained).
        eff_median = (n_docs / median(samples[N_BIG])) / (
            4.0 * (n_docs / median(samples[N_SMALL]))
        )
        pair_ratios = [
            s / (4.0 * b)
            for s, b in zip(visit_minima["small"], visit_minima["big"])
        ]
        eff_paired = median(pair_ratios)

        # floor metadata (see load_query_floors): a query whose recorded
        # min is >2x its cross-run floor was measured on a loud window —
        # the flag marks the RECORD as noise-suspect, it never changes
        # what was run or how
        prior_floors = load_query_floors()
        query_floors = {
            q: round(min(t, prior_floors.get(q, t)), 3) for q, t in times.items()
        }
        floor_exceeded = {
            q: round(times[q] / query_floors[q], 2)
            for q in times
            if query_floors[q] > 0 and times[q] > 2.0 * query_floors[q]
        }

        # scaling floor metadata (see load_scaling_floors): a config whose
        # best visit throughput sits >25% below its cross-run best was
        # measured on an eaten window — the 2x rule used for headline
        # queries is too lax here because the efficiency RATIO inherits a
        # one-sided slowdown linearly (r5: big side 1.5x over floor with a
        # quiet small side read as 0.60 efficiency). Flags mark the record
        # loud; they never change what ran.
        prior_scaling = load_scaling_floors()
        dps_now = {"small": dps_small, "big": dps_big}
        scaling_floors = {
            w: round(max(dps_now[w], prior_scaling[w]), 1) for w in dps_now
        }
        scaling_floor_exceeded = {
            w: round(scaling_floors[w] / dps_now[w], 2)
            for w in dps_now
            if dps_now[w] > 0 and scaling_floors[w] > 1.25 * dps_now[w]
        }

        result = {
            "metric": "headline_queries_total_wall",
            "value": round(sum(times.values()), 3),
            "unit": "sec",
            "queries": times,
            "query_floors": query_floors,
            "floor_exceeded": floor_exceeded,
            "floor_exceeded_any": bool(floor_exceeded),
            "sf": SF_DIR.rstrip("/").split("sf")[-1],
            "extract_scaling": {
                "pages": n_docs,
                "cores_small": N_SMALL,
                "cores_big": N_BIG,
                "pinned": bool(shutil.which("taskset")),
                "wall_sec_small": round(t_small, 3),
                "wall_sec_big": round(t_big, 3),
                "docs_per_sec_small": round(dps_small, 1),
                "docs_per_sec_big": round(dps_big, 1),
                "scaling_efficiency": round(eff, 3),
                "scaling_efficiency_median": round(eff_median, 3),
                "scaling_efficiency_paired": round(eff_paired, 3),
                "pair_ratios": [round(x, 3) for x in pair_ratios],
                "pairs_run": pairs_run,
                "pairs_scheduled": N_PAIRS,
                "samples_small": [round(x, 2) for x in samples[N_SMALL]],
                "samples_big": [round(x, 2) for x in samples[N_BIG]],
                "docs_per_sec_floors": scaling_floors,
                "scaling_floor_exceeded": scaling_floor_exceeded,
                "scaling_floor_exceeded_any": bool(scaling_floor_exceeded),
            },
            # host load forensics (1/5/15-min averages at phase
            # boundaries): with the fleet design the bench's own load is
            # ~8 during visits, so a 1-min average well above ~10 after a
            # pair means external contention — the record explains its
            # own scaling_floor_exceeded flags
            "host_load": host_load,
            # per-segment busy/steal (hypervisor neighbors appear as steal
            # in this VM, NOT in loadavg — loadavg only sees our runqueue)
            "cpu_segments": cpu_segments,
            "load_gate": gate_log,
            "bench_total_sec": round(time.time() - t_start, 1),
        }
        print(json.dumps(result), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
