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
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine


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


def _cell_assign_expr(vec: Column, cent_vecs: "np.ndarray", cent_norms: "np.ndarray") -> Column:
    """argmax-cosine cell id as pure column algebra over literal centroids."""

    def dot_literal(v: Column, plane) -> Column:
        lit = F.array(*[F.lit(float(x)) for x in plane])
        return F.aggregate(
            F.zip_with(v, lit, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    sims = [dot_literal(vec, c) / float(n) for c, n in zip(cent_vecs, cent_norms)]
    arr = F.array(*sims)
    return (F.array_position(arr, F.array_max(arr)) - 1).cast("int")


def _probe_cells_expr(
    vec: Column, cent_vecs: "np.ndarray", cent_norms: "np.ndarray", n_probe: int
) -> Column:
    """Top-``n_probe`` nearest cell ids as column algebra: similarity to
    every literal centroid, sort (sim, cell) structs descending, slice.
    Keeps probe selection executor-side so the query frame is never
    collected to the driver."""

    def dot_literal(v: Column, plane) -> Column:
        lit = F.array(*[F.lit(float(x)) for x in plane])
        return F.aggregate(
            F.zip_with(v, lit, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    pairs = F.array(
        *[
            F.struct(
                (dot_literal(vec, c) / float(n)).alias("s"),
                F.lit(i).cast("int").alias("c"),
            )
            for i, (c, n) in enumerate(zip(cent_vecs, cent_norms))
        ]
    )
    top = F.slice(F.reverse(F.array_sort(pairs)), 1, n_probe)
    return F.transform(top, lambda p: p["c"])


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
            "_cell", _cell_assign_expr(F.col(vec_col), cents, norms)
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
    selection are pure column algebra over the literal centroids (dot to
    each centroid; argmax for the corpus cell, top-n_probe sort for the
    query's probe list) — the query side is never collected to the driver,
    so ``queries`` may be a full table, not just a search batch. Drop the
    broadcast hints if the query side outgrows broadcast size.

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
        "_cell", _cell_assign_expr(F.col(vec_col), cent_vecs, cent_norms)
    )

    probes = queries.select(
        F.col(query_id),
        F.explode(
            _probe_cells_expr(F.col(vec_col), cent_vecs, cent_norms, n_probe)
        ).alias("_cell"),
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


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(np.float64).tolist()


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Pack sign(v . plane_i) bits into a bucket id — pure column algebra:
    the planes are literal arrays folded into the plan (broadcast by value)."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        d = F.aggregate(
            F.zip_with(vec, plane, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


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
    base_bucket = lsh_bucket(F.col(vec_col), dim, n_planes, seed)
    probes = F.array(
        base_bucket, *[base_bucket.bitwiseXOR(F.lit(1 << i)) for i in range(n_probe_bits)]
    )
    q = queries.select(
        F.col(query_id),
        F.col(vec_col).alias("_qvec"),
        F.explode(probes).alias("_bucket"),
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
