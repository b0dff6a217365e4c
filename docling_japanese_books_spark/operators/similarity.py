"""Similarity search over embedding columns (J2/T1 at batch scale).

Brute-force cosine top-k is the exactness baseline (broadcast the query
batch, codegen'd array math, per-query window top-k). The scale path is
random-hyperplane LSH: bucket corpus and queries by sign-bit signatures,
join on bucket, rank within — turning an O(Q x N) cross join into a
shuffle on bucket keys. Hyperplanes are deterministic (seeded numpy),
broadcast as plan literals.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.vectors import cosine


def _stack(v: "pd.Series", dim: "int | None" = None) -> "np.ndarray":
    """Arrow hands an array<float> column as a Series of numpy arrays;
    stack into a (batch, ``dim``) float64 matrix (empty-safe).

    Null or length-mismatched elements become all-NaN rows instead of
    raising — a single null embedding must degrade to a null cell/bucket
    downstream (matching the former column-algebra formulation), never
    kill the whole task. Callers that matmul against a model matrix pass
    its ``dim`` so an off-width row can never change the batch width (a
    ragged row alone in its batch would otherwise shape-error the matmul).
    The dominant all-valid case stays a single vectorized np.array call."""
    if len(v) == 0:
        return np.zeros((0, dim or 1), dtype=np.float64)
    try:
        out = np.array(
            [np.asarray(x, dtype=np.float64) for x in v], dtype=np.float64
        )
        if out.ndim == 2 and (dim is None or out.shape[1] == dim):
            return out
    except (TypeError, ValueError):
        pass
    d = dim
    if d is None:
        dims = [len(x) for x in v if x is not None]
        d = max(dims) if dims else 1
    out = np.full((len(v), d), np.nan, dtype=np.float64)
    for i, x in enumerate(v):
        if x is None:
            continue
        try:
            a = np.asarray(x, dtype=np.float64)
        except (TypeError, ValueError):
            continue
        if a.ndim == 1 and len(a) == d:
            out[i] = a
    return out


def topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k per query: broadcast(queries) x corpus + window rank.

    Scores are rounded to 6 decimals BEFORE ranking (ties broken by corpus
    id) so rank order is reproducible against any oracle comparing rounded
    values — float ulps can never flip a near-tie.

    Scale: queries are the small side by construction (a search batch);
    corpus never shuffles — only the per-query rank does, keyed by query."""
    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        query_id,
        corpus_id,
        # rank on the ROUNDED score so tie order matches any oracle that
        # compares rounded values — a 1e-9 near-tie must not flip ranks
        F.round(
            F.coalesce(cosine(F.col(vec_col), F.col("_qvec")), F.lit(0.0)), 6
        ).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _cell_assign_udf(cent_vecs: "np.ndarray", cent_norms: "np.ndarray"):
    """argmax-cosine cell id as a vectorized pandas UDF.

    The centroid matrix rides in the UDF closure (pickled once per task,
    k x dim floats — KBs), so the Catalyst plan carries exactly ONE
    expression node no matter how many cells or dimensions: at 64 cells x
    1024 dims the former literal-array formulation emitted ~65k plan nodes
    and died in analysis/codegen long before data volume mattered. One
    batch matmul + argmax replaces k interpreted higher-order folds per row.
    First-max tie order matches the old ``array_position(arr, array_max)``."""
    unit = (cent_vecs / cent_norms[:, None]).astype(np.float64)

    @F.pandas_udf(T.IntegerType())
    def assign(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="Int32")
        sims = _stack(v, unit.shape[1]) @ unit.T
        # NaN rows (null/ragged embeddings) -> null cell, not a bogus argmax
        valid = np.isfinite(sims).all(axis=1)
        out = pd.array(sims.argmax(axis=1).astype(np.int32), dtype="Int32")
        out[~valid] = pd.NA
        return pd.Series(out)

    return assign


def _probe_cells_udf(
    cent_vecs: "np.ndarray", cent_norms: "np.ndarray", n_probe: int
):
    """Top-``n_probe`` nearest cell ids as a vectorized pandas UDF (same
    closure-broadcast centroid matrix as :func:`_cell_assign_udf`). Probe
    selection stays executor-side so the query frame is never collected to
    the driver. Ties break toward the lower cell id (stable argsort)."""
    unit = (cent_vecs / cent_norms[:, None]).astype(np.float64)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probes(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        sims = _stack(v, unit.shape[1]) @ unit.T
        valid = np.isfinite(sims).all(axis=1)
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(
            [
                row.astype(np.int32).tolist() if ok else None
                for row, ok in zip(order, valid)
            ]
        )

    return probes


def train_centroids(
    corpus: DataFrame,
    dim: int,
    n_cells: int = 16,
    n_iters: int = 3,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Distributed Lloyd iterations for IVF centroids.

    Init = first n_cells vectors by id (deterministic). Each iteration:
    assign cells JVM-side (argmax over literal centroids), per-cell means
    via dim per-element averages (one shuffle on the cell id), collect the
    k x dim result (tiny) and fold into the next plan. Empty cells keep
    their previous centroid. 3 iterations = 3 jobs; the corpus is scanned,
    never collected."""
    cents = np.array(
        [
            [float(x) for x in r[0]]
            for r in corpus.select(vec_col).orderBy(corpus_id).limit(n_cells).collect()
        ],
        dtype=np.float64,
    )
    for _ in range(n_iters):
        norms = np.linalg.norm(cents, axis=1)
        norms[norms == 0] = 1.0
        assigned = corpus.withColumn(
            "_cell", _cell_assign_udf(cents, norms)(F.col(vec_col))
        )
        # per-cell per-dimension means via posexplode + groupBy(cell, dim):
        # avg is partially aggregatable, so the shuffle carries only
        # k x dim x n_partitions partial sums — and the plan stays O(1)
        # expressions regardless of dim (a dim-wide avg(element_at) column
        # list blows up the plan at 1024+ dims)
        means = (
            assigned.select("_cell", F.posexplode(F.col(vec_col)).alias("_d", "_v"))
            .groupBy("_cell", "_d")
            .agg(F.avg("_v").alias("_m"))
            .collect()
        )
        new = cents.copy()
        by_cell: dict = {}
        for r in means:
            by_cell.setdefault(r["_cell"], {})[r["_d"]] = r["_m"]
        for cell, dims in by_cell.items():
            new[cell] = [dims[i] for i in range(dim)]
        cents = new
    return cents


def topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    centroids: "np.ndarray | None" = None,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: partition the corpus into cells around
    centroids, probe only the n_probe cells nearest each query.

    Centroids are a deterministic sample (first n_cells corpus vectors by
    id) — a kmeans stand-in that keeps the operator dependency-free; swap in
    trained centroids without touching the plan. Cell assignment AND probe
    selection are vectorized pandas UDFs carrying the centroid matrix in
    their closure (one batch matmul + argmax / stable top-n_probe argsort
    per Arrow batch; plan size is O(1) in cells x dims) — the query side is
    never collected to the driver, so ``queries`` may be a full table, not
    just a search batch. Drop the broadcast hints if the query side
    outgrows broadcast size.

    Scale: corpus never moves — the only join is corpus ⋈ broadcast(probe
    pairs) on the cell id, then per-query rank. Recall grows with n_probe
    (n_probe = n_cells degenerates to exact brute force).
    """
    if centroids is None:
        cent_vecs = np.array(
            [
                [float(x) for x in r[0]]
                for r in corpus.select(vec_col)
                .orderBy(corpus_id)
                .limit(n_cells)
                .collect()
            ],
            dtype=np.float64,
        )
    else:
        cent_vecs = np.asarray(centroids, dtype=np.float64)
    cent_norms = np.linalg.norm(cent_vecs, axis=1)
    cent_norms[cent_norms == 0] = 1.0

    c = corpus.withColumn(
        "_cell", _cell_assign_udf(cent_vecs, cent_norms)(F.col(vec_col))
    )

    # materialize the probe array in its own projection, then explode_outer
    # + null-filter: a plain explode over a deterministic UDF makes Catalyst
    # inject a size()>0 pre-filter that re-evaluates the UDF (pinned by
    # tests/test_plans.py for the chunkers; same shape here)
    probes = (
        queries.select(
            F.col(query_id),
            _probe_cells_udf(cent_vecs, cent_norms, n_probe)(
                F.col(vec_col)
            ).alias("_cells"),
        )
        .select(F.col(query_id), F.explode_outer("_cells").alias("_cell"))
        .filter(F.col("_cell").isNotNull())
    )
    qvecs = queries.select(F.col(query_id), F.col(vec_col).alias("_qvec"))

    scored = (
        c.join(F.broadcast(probes), "_cell")
        .join(F.broadcast(qvecs), query_id)
        .select(
            query_id,
            corpus_id,
            F.round(
                F.coalesce(cosine(F.col(vec_col), F.col("_qvec")), F.lit(0.0)), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(corpus_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _hyperplanes(dim: int, n_planes: int, seed: int) -> "np.ndarray":
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(np.float64)


def bucket_udf_for(planes: "np.ndarray"):
    """Sign-bit bucket UDF for an explicit hyperplane matrix (used both by
    the seeded in-memory path and the persisted-index path, which loads
    its planes from an artifact table)."""
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))

    @F.pandas_udf(T.LongType())
    def bucket(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="Int64")
        proj = _stack(v, planes.shape[1]) @ planes.T
        valid = np.isfinite(proj).all(axis=1)
        bits = proj >= 0
        out = pd.array((bits.astype(np.int64) @ weights).astype(np.int64), dtype="Int64")
        out[~valid] = pd.NA
        return pd.Series(out)

    return bucket


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Pack sign(v . plane_i) bits into a bucket id — a vectorized pandas
    UDF whose (n_planes x dim) plane matrix rides in the closure: one
    matmul + sign-bit pack per Arrow batch, a single plan node regardless
    of dimensionality (the former literal-array formulation emitted
    n_planes x dim plan literals and n_planes interpreted folds per row).
    Planes are deterministic (seeded numpy)."""
    return bucket_udf_for(_hyperplanes(dim, n_planes, seed))(vec)


def topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    n_probe_bits: int = 0,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket.

    Recall is tunable two ways: fewer planes -> bigger buckets; and
    multi-probe (``n_probe_bits`` > 0) -> each query also probes the
    buckets reachable by flipping one of its first ``n_probe_bits`` sign
    bits (the nearest neighboring half-spaces). Multi-probe multiplies the
    query side only — the corpus is bucketed once and never moves."""
    c = corpus.withColumn("_bucket", lsh_bucket(F.col(vec_col), dim, n_planes, seed))
    # bucket UDF evaluated ONCE per query row in its own projection; the
    # XOR probe fan-out then references the materialized column (cheap
    # bit ops), never re-running the UDF per probe
    base = F.col("_b0")
    probes = F.array(
        base, *[base.bitwiseXOR(F.lit(1 << i)) for i in range(n_probe_bits)]
    )
    q = (
        queries.select(
            F.col(query_id),
            F.col(vec_col).alias("_qvec"),
            lsh_bucket(F.col(vec_col), dim, n_planes, seed).alias("_b0"),
        )
        .select(
            F.col(query_id),
            F.col("_qvec"),
            F.explode(probes).alias("_bucket"),
        )
    )
    scored = c.join(F.broadcast(q), "_bucket").select(
        query_id,
        corpus_id,
        F.round(
            F.coalesce(cosine(F.col(vec_col), F.col("_qvec")), F.lit(0.0)), 6
        ).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(corpus_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
