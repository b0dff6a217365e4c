"""Margin-based bitext mining (operators/bitext.py): exact replication
of the ratio-margin semantics by a numpy reference, planted-pair
recovery, and the mutual-best rule."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from docling_japanese_books_spark.operators.bitext import (
    margin_knn_mine,
    margin_knn_scores,
)

K = 3


def _cos(a, b):
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    return 0.0 if na == 0 or nb == 0 else float(a @ b / (na * nb))


def _np_margins(src, tgt, k):
    """Reference: directional kNN on rounded scores (ties by id), avgNN
    over each list, union candidates, rounded ratio margin."""
    def knn(qs, cs):
        out = {}
        for qi, q in qs.items():
            ranked = sorted(
                ((round(_cos(q, c), 6), ci) for ci, c in cs.items()),
                key=lambda t: (-t[0], t[1]),
            )[:k]
            out[qi] = ranked
        return out

    fwd = knn(src, tgt)
    bwd = knn(tgt, src)
    a_s = {i: sum(s for s, _ in l) / len(l) for i, l in fwd.items()}
    a_t = {j: sum(s for s, _ in l) / len(l) for j, l in bwd.items()}
    cands = {(i, j, s) for i, l in fwd.items() for s, j in l} | {
        (i, j, s) for j, l in bwd.items() for s, i in l
    }
    return {
        (i, j): (s, round(s / ((a_s[i] + a_t[j]) / 2.0), 6))
        for i, j, s in cands
    }


def _np_mine(margins, threshold, mutual):
    best_src = {}
    for (i, j), (_, m) in margins.items():
        cur = best_src.get(i)
        if cur is None or (m, -j) > (cur[1], -cur[0]):
            best_src[i] = (j, m)
    pairs = {(i, j) for i, (j, m) in best_src.items()}
    if mutual:
        best_tgt = {}
        for (i, j), (_, m) in margins.items():
            cur = best_tgt.get(j)
            if cur is None or (m, -i) > (cur[1], -cur[0]):
                best_tgt[j] = (i, m)
        pairs &= {(i, j) for j, (i, m) in best_tgt.items()}
    return {p for p in pairs if margins[p][1] >= threshold}


def _frames(spark):
    rng = np.random.RandomState(17)
    src_vecs = {i: rng.randn(12) for i in range(10)}
    tgt_vecs = {}
    for i in range(10):  # every source has a planted translation
        tgt_vecs[100 + i] = src_vecs[i] + 0.05 * rng.randn(12)
    for j in range(4):  # unpaired junk targets
        tgt_vecs[200 + j] = rng.randn(12)
    mk = lambda d, idc: spark.createDataFrame(  # noqa: E731
        [(int(i), [float(x) for x in v]) for i, v in d.items()],
        f"{idc} long, embedding array<float>",
    )
    return src_vecs, tgt_vecs, mk(src_vecs, "src_id"), mk(tgt_vecs, "tgt_id")


def test_margin_scores_match_numpy(spark):
    src_vecs, tgt_vecs, src, tgt = _frames(spark)
    want = _np_margins(src_vecs, tgt_vecs, K)
    got = {
        (r.src_id, r.tgt_id): (r.score, r.margin)
        for r in margin_knn_scores(src, tgt, k=K).collect()
    }
    assert set(got) == set(want)
    for p in want:
        assert got[p][0] == want[p][0], p           # 6-dp score identical
        assert abs(got[p][1] - want[p][1]) < 1e-9, p


def test_mining_recovers_planted_pairs(spark):
    src_vecs, tgt_vecs, src, tgt = _frames(spark)
    want = _np_mine(_np_margins(src_vecs, tgt_vecs, K), 1.0, True)
    got = {
        (r.src_id, r.tgt_id)
        for r in margin_knn_mine(src, tgt, k=K, threshold=1.0).collect()
    }
    assert got == want
    # exactly the planted translations: every source's best is its twin,
    # so the mutual rule structurally shuts the junk targets out (no
    # source is free to be a junk target's best-and-mutual partner)
    assert got == {(i, 100 + i) for i in range(10)}


def test_mutual_flag_is_a_superset_switch(spark):
    src_vecs, tgt_vecs, src, tgt = _frames(spark)
    margins = _np_margins(src_vecs, tgt_vecs, K)
    got_loose = {
        (r.src_id, r.tgt_id)
        for r in margin_knn_mine(
            src, tgt, k=K, threshold=1.0, mutual=False
        ).collect()
    }
    assert got_loose == _np_mine(margins, 1.0, False)
    got_strict = {
        (r.src_id, r.tgt_id)
        for r in margin_knn_mine(src, tgt, k=K, threshold=1.0).collect()
    }
    assert got_strict <= got_loose


def test_threshold_filters_on_rounded_margin(spark):
    _, _, src, tgt = _frames(spark)
    rows = margin_knn_mine(src, tgt, k=K, threshold=1.02).collect()
    assert rows  # the planted pairs clear 1.02 comfortably
    assert all(r.margin >= 1.02 for r in rows)


def test_argmax_is_window_free(spark):
    """The per-side argmax must be the partial-aggregable max(struct),
    not a row_number window over the candidate set."""
    _, _, src, tgt = _frames(spark)
    plan = (
        margin_knn_mine(src, tgt, k=K)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the only windows are topk_bruteforce's kNN ranks (ordered by
    # score); the margin argmax itself must never rank through a window
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            assert "score" in line and "margin" not in line, line
