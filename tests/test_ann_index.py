"""Persisted ANN indexes (operators/ann_index.py): save->load->search
equality with the in-memory operators, and the scale contract — the
search job never re-assigns or fully rescans the corpus."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from docling_japanese_books_spark.operators.ann_index import (
    load_ivf_centroids,
    save_ivf_index,
    save_lsh_index,
    topk_ivf_indexed,
    topk_lsh_indexed,
)
from docling_japanese_books_spark.operators.similarity import topk_ivf, topk_lsh


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def corpus(emb):
    return emb.filter("vec_id >= 3").select("vec_id", "embedding")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _rows(df):
    return sorted(
        (r.query_id, r.vec_id, r.score, r.rank) for r in df.collect()
    )


def test_persisted_search_equals_in_memory_partial_probe(
    spark, corpus, queries, tmp_path_factory
):
    """The real pin: with PARTIAL probing (approximate path) the persisted
    index must return exactly what the in-memory operator returns for the
    same centroids — save/load cannot change a single candidate."""
    path = str(tmp_path_factory.mktemp("ivf"))
    cents = save_ivf_index(corpus, path, n_cells=8)
    persisted = topk_ivf_indexed(spark, queries, path, k=5, n_probe=2)
    in_memory = topk_ivf(
        queries, corpus, dim=64, k=5, n_cells=8, n_probe=2, centroids=cents
    )
    assert _rows(persisted) == _rows(in_memory)
    # centroid artifact round-trips bit-exactly (float64 parquet)
    assert np.array_equal(load_ivf_centroids(spark, path), cents)


def test_persisted_search_plan_never_touches_raw_corpus(
    spark, corpus, queries, tmp_path_factory
):
    """Scale contract: the search plan carries exactly ONE Python stage
    (the query-side probe UDF) — no corpus re-assignment — and the
    assignments scan is statically partition-pruned to the probed cells."""
    path = str(tmp_path_factory.mktemp("ivf_plan"))
    save_ivf_index(corpus, path, n_cells=8)
    out = topk_ivf_indexed(spark, queries, path, k=3, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
    # the corpus scan must list only probed cell partitions
    scan_lines = [ln for ln in plan.splitlines() if "assignments" in ln]
    assert any("PartitionFilters" in ln and "cell" in ln for ln in plan.splitlines())
    assert scan_lines  # the persisted table is what gets scanned


def test_persisted_partition_pruning_reads_only_probed_cells(
    spark, corpus, queries, tmp_path_factory
):
    """Executed-metric check: probing 1 of 8 cells per query must scan
    fewer files than the full index holds."""
    import glob

    path = str(tmp_path_factory.mktemp("ivf_prune"))
    save_ivf_index(corpus, path, n_cells=8)
    n_cell_dirs = len(glob.glob(f"{path}/assignments/cell=*"))
    assert n_cell_dirs == 8
    one_q = queries.filter("query_id = 0")
    out = topk_ivf_indexed(spark, one_q, path, k=3, n_probe=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # static pruning over probe cells: a single-cell probe folds to an
    # equality PartitionFilter (Catalyst rewrites 1-element isin to =)
    import re

    scan = next(
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "assignments" in ln
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", scan)
    assert m, scan
    assert re.search(r"cell#\d+ (= \d+|IN \(\d+\))", m.group(1)), scan


def test_lsh_persisted_equals_in_memory(spark, corpus, queries, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lsh"))
    save_lsh_index(corpus, path, dim=64, n_planes=6, seed=7)
    persisted = topk_lsh_indexed(spark, queries, path, k=5, n_probe_bits=2)
    in_memory = topk_lsh(
        queries, corpus, dim=64, k=5, n_planes=6, seed=7, n_probe_bits=2
    )
    assert _rows(persisted) == _rows(in_memory)


def test_lsh_hyperplanes_roundtrip(spark, corpus, tmp_path_factory):
    from docling_japanese_books_spark.operators.similarity import _hyperplanes

    path = str(tmp_path_factory.mktemp("lsh_hp"))
    save_lsh_index(corpus, path, dim=64, n_planes=6, seed=7)
    stored = (
        spark.read.parquet(f"{path}/hyperplanes").orderBy("plane").collect()
    )
    got = np.array([r["vec"] for r in stored])
    assert np.array_equal(got, _hyperplanes(64, 6, 7))


def test_pq_persisted_equals_in_memory_and_scans_codes_only(
    spark, emb, corpus, queries, tmp_path_factory
):
    """Persist->load->ADC search equals the in-memory PQ path, and the
    search plan's corpus scan reads ONLY (vec_id, codes) — the float
    embedding column never appears in the codes table's ReadSchema."""
    import numpy as np

    from docling_japanese_books_spark.operators.ann_index import (
        load_pq_codebooks,
        save_pq_index,
        topk_pq_indexed,
    )
    from docling_japanese_books_spark.operators.quantize import (
        pq_encode_udf,
        topk_pq_adc,
        train_pq_codebooks,
    )

    sample = np.array(
        [r.embedding for r in emb.orderBy("vec_id").limit(128).collect()],
        dtype=np.float64,
    )
    books = train_pq_codebooks(sample, m=8, k=16, n_iters=3)
    path = str(tmp_path_factory.mktemp("pq"))
    save_pq_index(corpus, path, books)
    assert np.allclose(load_pq_codebooks(spark, path), books)

    persisted = topk_pq_indexed(spark, queries, path, k=5)
    codes_mem = corpus.select(
        "vec_id", pq_encode_udf(books)(F.col("embedding")).alias("codes")
    )
    in_memory = topk_pq_adc(queries, codes_mem, books, k=5)

    def rows(df):
        return sorted(
            (r.query_id, r.vec_id, r.adc_dist, r.rank) for r in df.collect()
        )

    assert rows(persisted) == rows(in_memory)

    plan = persisted._jdf.queryExecution().executedPlan().toString()
    codes_scans = [
        ln for ln in plan.splitlines() if "FileScan" in ln and "/codes" in ln
    ]
    assert codes_scans and all("embedding" not in ln for ln in codes_scans)
