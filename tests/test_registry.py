"""Registry meta-invariants: every driver-facing query must survive the
correctness harness. These are schema-level checks (no query execution), so
the whole registry verifies in seconds."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def frames(spark):
    return {name: fn(spark, SF) for name, fn in entry.queries().items()}


def test_no_complex_columns_reach_the_driver(frames):
    """The harness canonicalizer sorts result cells in pandas; list/struct/
    map cells are unhashable and ERR the row (round-1 regression). Every
    registry query must project arrays down to digests or joined strings."""
    offenders = {}
    for name, df in frames.items():
        bad = [
            (f.name, f.dataType.simpleString())
            for f in df.schema.fields
            if f.dataType.simpleString().startswith(("array", "struct", "map"))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"complex driver-facing columns: {offenders}"


def test_oracle_column_names_match_spark(frames):
    """The harness compares columns sorted BY NAME, so a Spark/oracle alias
    mismatch hash-fails even with identical values. DESCRIBE the oracle in
    DuckDB (no execution) and require the exact same column-name set."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    mismatches = {}
    for name, sql in entry.oracle_sql().items():
        oracle_cols = [
            r[0] for r in con.execute(f"DESCRIBE {sql}").fetchall()
        ]
        spark_cols = frames[name].columns
        if sorted(oracle_cols) != sorted(spark_cols):
            mismatches[name] = (sorted(spark_cols), sorted(oracle_cols))
    assert not mismatches, f"alias mismatches: {mismatches}"


def test_no_hugeint_oracle_columns():
    """DuckDB widens sum(INT)/list_aggregate('sum') to HUGEINT (int128),
    which the harness canonicalizer renders differently from Spark's BIGINT
    — the round-2 root cause for all 3 hash-fails. DESCRIBE every oracle (no
    execution) and require every output column to be a non-HUGEINT type;
    wrap offending sums in CAST(... AS BIGINT)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    offenders = {}
    for name, sql in entry.oracle_sql().items():
        bad = [
            (r[0], r[1])
            for r in con.execute(f"DESCRIBE {sql}").fetchall()
            if "HUGEINT" in r[1].upper()
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"HUGEINT oracle columns (CAST to BIGINT): {offenders}"


def test_window_is_all_oracle_backed():
    """The harness checks a 50-query prefix: every slot must be oracle-
    backed or correctness credit is thrown away (round-1 regression)."""
    names = list(entry.queries())
    oracles = entry.oracle_sql()
    prefix = names[: min(50, len(names))]
    assert all(n in oracles for n in prefix)


def test_window_composition_is_pinned():
    """The 50-slot window holds EXACTLY the oracle queries not in DEMOTED:
    a registry addition that silently reshuffles the window (pushing a
    unique-coverage query out) must trip this, not a grading round."""
    names = list(entry.queries())
    oracles = set(entry.oracle_sql())
    window = set(names[:50])
    expected = oracles - set(entry.DEMOTED)
    assert len(expected) == 50, (
        f"{len(expected)} non-demoted oracle queries for 50 slots — "
        "rebalance DEMOTED when adding/removing oracle queries"
    )
    assert window == expected
    # every demoted name really is a registered oracle query
    assert set(entry.DEMOTED) <= oracles


def test_demoted_surrogates_are_green_in_latest_correctness():
    """Every demoted oracle query names in-window surrogates covering the
    same shape; each surrogate must be GREEN (rows+schema+hash) in the
    newest driver CORRECTNESS file. Automates away the round-2
    doc_sha256 -> image_manifest stale-surrogate episode."""
    import json
    import re
    from pathlib import Path

    repo = Path(entry.__file__).parent
    files = sorted(
        repo.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    if not files:
        pytest.skip("no CORRECTNESS file yet (round 1)")
    latest = json.loads(files[-1].read_text())
    green = {
        n
        for n, r in latest.items()
        if r.get("rows_match") and r.get("schema_match") and r.get("hash_match")
    }
    problems = {}
    for demoted_name, surrogates in entry.DEMOTED.items():
        assert surrogates, f"{demoted_name} demoted without surrogates"
        # r6 hardening: a surrogate that is itself demoted can silently
        # orphan the chain when a later round drops it out of the window
        # (the r5 emb_pairwise_stats/doc_file_stem/doc_japanese_confidence
        # episode) — reject demoted surrogates outright, independent of
        # whatever the latest CORRECTNESS file happens to contain.
        self_demoted = [s for s in surrogates if s in entry.DEMOTED]
        missing = [s for s in surrogates if s not in green]
        if self_demoted:
            problems[demoted_name] = [f"{s} (itself demoted)" for s in self_demoted]
        elif missing:
            problems[demoted_name] = missing
    assert not problems, (
        f"demoted queries whose surrogates are not green in {files[-1].name}: "
        f"{problems}"
    )
