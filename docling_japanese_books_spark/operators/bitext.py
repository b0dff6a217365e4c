"""Margin-based bitext mining (Artetxe & Schwenk 2019, "Margin-based
Parallel Corpus Mining with Multilingual Sentence Embeddings" — the
CCMatrix/WikiMatrix recipe): mine translation pairs from two monolingual
embedding spaces by RATIO MARGIN instead of raw cosine,

    margin(x, y) = cos(x, y) / ( (avgNN_k(x) + avgNN_k(y)) / 2 )

where ``avgNN_k`` is the mean cosine of a vector's k nearest neighbours
in the OTHER language. Dividing by the neighbourhood density cancels
hubness — vectors that are globally close to everything (the failure
mode that makes raw-cosine mining pick the same "hub" target for
hundreds of sources).

Spark shape, built on the oracle-green top-k operators:

- Both directional kNN lists come from ``topk_bruteforce`` (exactness
  baseline — swap in ``operators.ann_index`` search for the 100 TB
  path; the margin algebra downstream is identical for any (src, tgt,
  score) candidate list).
- The two ``avgNN_k`` tables are per-id aggregates of those lists —
  |src| and |tgt| rows, one map-side-combined groupBy each.
- Candidates are the UNION of both directions' kNN pairs (the paper's
  "intersection/union" variant — union, so a pair only one direction
  surfaced still competes); margins are two equi-joins + one codegen'd
  expression, 6-dp rounded before every comparison so rank ties are
  engine-stable.
- The per-source argmax is a partial-aggregable ``max(struct)`` (the
  repo-standard window-free argmax); ``mutual=True`` additionally
  requires the pair to be its TARGET's argmax too — the strict
  both-ways-best setting CCMatrix uses for its highest-precision tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import topk_bruteforce


def margin_knn_scores(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    src_id: str = "src_id",
    tgt_id: str = "tgt_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All candidate pairs with their ratio margins: ``(src_id, tgt_id,
    score, margin)`` for every pair surfaced by either direction's kNN
    list. ``score`` is the 6-dp cosine, ``margin`` the 6-dp ratio."""
    fwd = topk_bruteforce(
        src.select(F.col(src_id), F.col(vec_col)),
        tgt.select(F.col(tgt_id), F.col(vec_col)),
        k=k,
        query_id=src_id,
        corpus_id=tgt_id,
        vec_col=vec_col,
    )
    bwd = topk_bruteforce(
        tgt.select(F.col(tgt_id), F.col(vec_col)),
        src.select(F.col(src_id), F.col(vec_col)),
        k=k,
        query_id=tgt_id,
        corpus_id=src_id,
        vec_col=vec_col,
    )
    avg_fwd = fwd.groupBy(src_id).agg(F.avg("score").alias("_a_src"))
    avg_bwd = bwd.groupBy(tgt_id).agg(F.avg("score").alias("_a_tgt"))
    cands = (
        fwd.select(src_id, tgt_id, "score")
        .unionByName(bwd.select(src_id, tgt_id, "score"))
        .distinct()
    )
    return (
        cands.join(avg_fwd, src_id)
        .join(avg_bwd, tgt_id)
        .select(
            src_id,
            tgt_id,
            "score",
            F.round(
                F.col("score")
                / ((F.col("_a_src") + F.col("_a_tgt")) / 2.0),
                6,
            ).alias("margin"),
        )
    )


def margin_knn_mine(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    threshold: float = 1.05,
    mutual: bool = True,
    src_id: str = "src_id",
    tgt_id: str = "tgt_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Mined pairs ``(src_id, tgt_id, score, margin)``: each source's
    best-margin candidate at ``margin >= threshold``; with
    ``mutual=True`` the pair must be the target's best-margin candidate
    as well. Ties on the rounded margin break toward the smaller
    partner id (deterministic on any engine/partitioning).

    CONTRACT (r8, ADVICE): ids must be NUMERIC — the argmax tie-break
    negates the partner-id column inside a max(struct), which fails the
    numeric cast under ANSI (or nulls the tie key otherwise) for string
    ids such as the url-as-id convention. Mining pipelines with string
    ids should map them through ``F.xxhash64`` (or a row_number frame)
    before calling and join the originals back on the hashed key."""
    scores = margin_knn_scores(
        src, tgt, k=k, src_id=src_id, tgt_id=tgt_id, vec_col=vec_col
    )

    def argmax(frame: DataFrame, group: str, other: str) -> DataFrame:
        best = frame.groupBy(group).agg(
            F.max(
                F.struct(
                    F.col("margin"), (-F.col(other)).alias("_tie")
                )
            ).alias("_b")
        )
        return best.select(
            group, (-F.col("_b._tie")).alias(other)
        )

    best_src = argmax(scores, src_id, tgt_id)
    mined = scores.join(best_src, [src_id, tgt_id], "leftsemi")
    if mutual:
        best_tgt = argmax(scores, tgt_id, src_id)
        mined = mined.join(best_tgt, [src_id, tgt_id], "leftsemi")
    return mined.filter(F.col("margin") >= threshold)
