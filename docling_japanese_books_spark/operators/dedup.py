"""Deduplication operators for training-data pipelines (task brief: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup).

The reference only deduplicates images by content hash
(``image_processor.py:113-121``, U2); everything else here is the standard
web-scale dedup toolbox rebuilt Spark-first:

- **exact**: sha256 of (optionally canonicalized) text, two-phase hash agg.
- **MinHash + LSH**: char-shingles -> m universal-hash minima (ALL JVM-side:
  xxhash64 + transform/array_min inside whole-stage codegen — no Python) ->
  band -> explode -> self-join on band buckets -> signature-overlap estimate.
  At 100 TB this is the only shape that works: candidate generation is a
  shuffle on small (band, hash) keys, never a quadratic compare.
- **SimHash**: 64-bit signature (vectorized numpy pandas UDF), hamming
  distance via xor+bit_count (codegen), candidate pairing by 16-bit chunk
  banding (pigeonhole: hamming<=3 pairs share at least one of 4 chunks).
- **n-gram Jaccard**: exact char-n-gram set Jaccard as pure column algebra
  (sequence/transform/array_distinct/array_intersect).
"""

from __future__ import annotations

import warnings
from typing import Tuple

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# exact / canonicalized dedup
# ---------------------------------------------------------------------------


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per exact text hash (U2 semantics).

    Scale note: hash in the scan projection so the shuffle carries 32 bytes,
    not document bodies; min(id) is a partial-aggregatable reducer."""
    h = F.sha2(F.col(text_col), 256)
    keepers = (
        df.select(F.col(id_col), h.alias("_h"))
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col))
        .drop("_h")
    )
    return df.join(keepers, id_col, "left_semi")


# ---------------------------------------------------------------------------
# char n-grams + Jaccard (pure column algebra)
# ---------------------------------------------------------------------------


def char_ngrams(col: Column, n: int = 3) -> Column:
    """Distinct character n-grams, JVM-side: sequence -> substr -> distinct.

    Guarded for short strings: Spark's sequence(1, 0) yields a DESCENDING
    [1, 0], not an empty array, so text shorter than n must short-circuit
    to array() explicitly."""
    idx = F.sequence(F.lit(1), F.length(col) - (n - 1))
    return F.when(
        F.length(col) >= n,
        F.array_distinct(F.transform(idx, lambda i: col.substr(i, F.lit(n)))),
    ).otherwise(F.array().cast("array<string>"))


def jaccard(a: Column, b: Column) -> Column:
    """|A∩B| / |A∪B| over array columns; 0.0 when the union is empty."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


# ---------------------------------------------------------------------------
# MinHash + LSH (JVM-side signatures)
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 31) - 1  # 2^31-1, prime; keeps a*h+b < 2^62 (no overflow)


def _perm_params(m: int, seed: int) -> Tuple[list, list]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=m, dtype=np.int64).tolist()
    b = rng.randint(0, _MERSENNE, size=m, dtype=np.int64).tolist()
    return a, b


_SHINGLE_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 constant


def _shingle_hashes(text: str, shingle_n: int) -> np.ndarray:
    """Distinct byte-shingle hashes, fully numpy-vectorized: sliding windows
    over the utf-8 bytes viewed as a (len, n) matrix, folded to one uint64
    per shingle with odd-constant mixes (splitmix-style). No per-shingle
    Python — this is the dedup hot path over every document of the corpus.

    Byte shingles (not char): identical for ASCII, and for CJK a byte
    4-gram is ~1.3 chars of context — the Jaccard estimate's resolution
    changes, not its validity."""
    data = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    if data.size < shingle_n:
        return np.empty(0, dtype=np.int64)
    windows = np.lib.stride_tricks.sliding_window_view(data, shingle_n).astype(
        np.uint64
    )
    h = np.zeros(windows.shape[0], dtype=np.uint64)
    for k in range(shingle_n):
        h = (h + windows[:, k]) * _SHINGLE_MIX
        h ^= h >> np.uint64(29)
    h = np.unique(h)
    return (h % np.uint64(_MERSENNE)).astype(np.int64)


def minhash_signature_udf(m: int = 64, shingle_n: int = 4, seed: int = 42):
    """Vectorized MinHash signature: text -> array<long>[m].

    sig_j = min over shingles s of ((a_j * h(s) + b_j) mod p), p = 2^31-1.
    numpy computes shingle hashes (strided windows) and the (m x n_shingles)
    permutation matrix per document in one shot; per-batch Python cost is a
    few matrix ops. This beats the pure-column-expression variant ~30x
    (Spark HOFs are interpreted per element) and per-shingle hashlib calls
    ~10x."""
    a_np_, b_np_ = _perm_params(m, seed)
    a_np = np.array(a_np_, dtype=np.int64).reshape(-1, 1)
    b_np = np.array(b_np_, dtype=np.int64).reshape(-1, 1)

    def one(text: str) -> list:
        h = _shingle_hashes(text or "", shingle_n)
        if h.size == 0:
            return [int(_MERSENNE)] * m
        sig = ((a_np * h + b_np) % _MERSENNE).min(axis=1)
        return sig.tolist()

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: one(t or ""))

    return _sig


def minhash_signature(
    text: Column, m: int = 64, shingle_n: int = 4, seed: int = 42
) -> Column:
    """Pure-column-expression MinHash (SQL-only fallback; ~30x slower than
    minhash_signature_udf because HOFs are interpreted — kept for
    environments where Python workers are unavailable):
    sig_j = min over shingles s of ((a_j * (xxhash64(s) mod p) + b_j) mod p).
    Empty/short text -> signature of all p (matches nothing).

    NOTE: hash differs from the UDF variant (xxhash64 vs blake2b) — pick one
    per pipeline; signatures are not interchangeable."""
    a_params, b_params = _perm_params(m, seed)
    shingles = char_ngrams(text, shingle_n)
    hashed = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))
    # One expression, one pass: an outer transform over the literal param
    # array references `hashed` once, so shingle hashing runs once per row —
    # NOT once per permutation (the naive F.array(*[min(...) for j])
    # duplicates the shingle-hash subtree m times and is ~50x slower).
    params = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in zip(a_params, b_params)
        ]
    )
    return F.transform(
        params,
        lambda p: F.coalesce(
            F.array_min(
                F.transform(
                    hashed,
                    lambda h: F.pmod(h * p["a"] + p["b"], F.lit(_MERSENNE)),
                )
            ),
            F.lit(_MERSENNE),
        ),
    )


def signature_similarity(sig_a: Column, sig_b: Column) -> Column:
    """Fraction of agreeing signature positions ≈ Jaccard similarity."""
    agree = F.size(
        F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda v: v)
    )
    return agree.cast("double") / F.size(sig_a)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m: int = 64,
    bands: int = 8,
    shingle_n: int = 4,
    seed: int = 42,
    threshold: float = 0.5,
    checkpoint: bool = False,
) -> DataFrame:
    """Near-duplicate pairs via banded LSH.

    Default banding is 8 bands x 8 rows: the LSH S-curve midpoint sits at
    (1/bands)^(1/rows) ~ 0.77 — the near-duplicate operating point. Wider
    bands (16x4, midpoint ~0.35) flood the candidate join with sub-threshold
    pairs on shingle-dense corpora and shift the cost into the verify step.

    Plan shape: scan -> signature (codegen) -> explode bands (m/bands rows
    per doc) -> shuffle on (band, band_hash) -> within-bucket self-join ->
    distinct pairs -> signature-overlap filter. Output:
    (id_a, id_b, est_jaccard) with id_a < id_b.

    ``checkpoint=True`` materializes the signature frame with
    ``localCheckpoint`` instead of ``persist``: at 100 TB the signatures
    don't fit in executor storage memory, and a cache miss would recompute
    the signature UDF over the full corpus for BOTH consumers (band explode
    and pair verify). Checkpointing truncates lineage so the UDF provably
    runs once; on a real cluster swap in ``df.checkpoint()`` with a
    reliable checkpoint dir, or write the signatures to a table. Default
    off: locally the cache always fits and persist is cheaper.
    """
    rows_per_band = m // bands
    sigs = df.select(
        F.col(id_col),
        minhash_signature_udf(m, shingle_n, seed)(F.col(text_col)).alias("sig"),
    )
    # the signature frame feeds the band explode AND the pair verify step:
    # materialize so the UDF runs once per document
    sigs = sigs.localCheckpoint(eager=True) if checkpoint else sigs.persist()
    # the banded self-join carries BARE (id, band, bhash) keys only — at
    # bands=8 the exploded frame is 8 rows/doc, and shipping the m-long
    # signature on both sides would push ~16x the signature bytes through
    # the shuffle; candidates are a tiny fraction of the corpus, so the
    # signatures are re-attached to surviving pairs with two narrow joins
    banded = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            F.slice(F.col("sig"), i * rows_per_band + 1, rows_per_band)
                        ).alias("bhash"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.bhash")

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bhash") == F.col("r.bhash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sig_a = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("_sig_a"))
    sig_b = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("_sig_b"))
    pairs = (
        cand.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .select(
            "id_a",
            "id_b",
            signature_similarity(F.col("_sig_a"), F.col("_sig_b")).alias(
                "est_jaccard"
            ),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )
    return pairs


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


# positional weights for the segmented token hash: 64 odd 64-bit constants
# derived from splitmix64 steps of the golden-ratio constant (public math)
def _posweights(n: int = 64) -> np.ndarray:
    w = np.empty(n, dtype=np.uint64)
    with np.errstate(over="ignore"):  # wraparound mod 2^64 is the intent
        x = np.uint64(0x9E3779B97F4A7C15)
        for i in range(n):
            x = (x + np.uint64(0x9E3779B97F4A7C15))
            z = x
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            w[i] = (z ^ (z >> np.uint64(31))) | np.uint64(1)
    return w


_POSW = None  # lazily built (numpy overflow warnings suppressed at use site)


def _token_hashes(text: str) -> np.ndarray:
    """One 64-bit hash per ASCII-whitespace token, with NO per-token Python:
    the utf-8 byte stream is segmented by a whitespace mask, each token's
    bytes get position-dependent 64-bit weights, and np.add.reduceat folds
    the weighted bytes into per-token sums that a final splitmix-style mix
    diffuses. This replaces a per-token hashlib loop (the dedup hot path at
    corpus scale) with a handful of whole-array numpy ops."""
    global _POSW
    if _POSW is None:
        _POSW = _posweights()
    data = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    if data.size == 0:
        return np.empty(0, dtype=np.uint64)
    # whitespace mask matching str.split()'s ASCII set (9-13, 28-31, 32)
    # plus U+3000 IDEOGRAPHIC SPACE (E3 80 80 in utf-8) — the separator
    # Japanese book text actually uses; other exotic unicode spaces are
    # treated as token bytes (documented tokenization choice)
    ws = (
        (data == 32)
        | ((data >= 9) & (data <= 13))
        | ((data >= 28) & (data <= 31))
    )
    if data.size >= 3:
        ideo = (data[:-2] == 0xE3) & (data[1:-1] == 0x80) & (data[2:] == 0x80)
        hits = np.flatnonzero(ideo)
        if hits.size:
            ws[hits] = True
            ws[hits + 1] = True
            ws[hits + 2] = True
    tok = ~ws
    if not tok.any():
        return np.empty(0, dtype=np.uint64)
    padded = np.concatenate(([False], tok, [False]))
    starts = np.flatnonzero(padded[1:-1] & ~padded[:-2])
    ends = np.flatnonzero(padded[1:-1] & ~padded[2:]) + 1
    lengths = ends - starts
    # position of each token byte within its token, vectorized
    token_bytes = data[tok].astype(np.uint64)
    pos = np.arange(token_bytes.size) - np.repeat(
        np.concatenate(([0], np.cumsum(lengths)[:-1])), lengths
    )
    with np.errstate(over="ignore"):
        weighted = (token_bytes + np.uint64(1)) * _POSW[pos & 63]
        # reduceat boundaries inside the compacted token-byte stream
        bounds = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        sums = np.add.reduceat(weighted, bounds)
        # length goes into the mix so 'ab c' vs 'abc ' differ
        z = sums ^ (lengths.astype(np.uint64) * np.uint64(0xFF51AFD7ED558CCD))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


def _simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (fully numpy-vectorized)."""
    hashes = _token_hashes(text)
    if hashes.size == 0:
        return 0
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
    acc = (2 * bits - 1).sum(axis=0)
    out = np.where(acc > 0, np.uint64(1), np.uint64(0)) << np.arange(
        64, dtype=np.uint64
    )
    return int(out.sum(dtype=np.uint64).astype(np.int64))  # two's-complement BIGINT


@F.pandas_udf(T.LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: _simhash64(t or ""))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Candidate generation by pigeonhole banding: split the 64-bit signature
    into ``max_hamming + 1`` chunks; a pair within the hamming bound can
    differ in at most ``max_hamming`` chunks, so it must agree on at least
    one — the join key is (chunk_idx, chunk_value), never a cross join.
    The chunk count is DERIVED from the bound (a fixed 4-chunk split only
    guarantees recall for hamming <= 3). Output: (id_a, id_b, hamming)."""
    n_chunks = max_hamming + 1
    if not 1 <= n_chunks <= 64:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    width = 64 // n_chunks  # last chunk absorbs the remainder bits
    sigs = df.select(F.col(id_col), simhash_udf(F.col(text_col)).alias("sim"))

    def chunk_val(i: int) -> Column:
        w = 64 - i * width if i == n_chunks - 1 else width
        shifted = F.shiftrightunsigned(F.col("sim"), i * width)
        if w >= 64:  # single-chunk case: the whole signature is the key
            return shifted.alias("cval")
        return shifted.bitwiseAND(F.lit((1 << w) - 1)).alias("cval")

    chunks = sigs.select(
        id_col,
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("chunk"), chunk_val(i))
                    for i in range(n_chunks)
                ]
            )
        ).alias("ck"),
    ).select(id_col, "sim", "ck.chunk", "ck.cval")
    l, r = chunks.alias("l"), chunks.alias("r")
    return (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.cval") == F.col("r.cval"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            hamming64(F.col("l.sim"), F.col("r.sim")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# duplicate-cluster collapse (connected components)
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over near-dup candidate pairs by iterative
    min-label propagation: every node's label converges to the smallest id
    in its component (the standard MapReduce/Pregel CC formulation — each
    round, label(x) = min(label(x), min over neighbors' labels); rounds
    needed = graph diameter, and near-dup clusters are shallow).

    Greedy 'drop id_b of every pair' over-keeps when the candidate graph is
    sparse: edges (a,c),(b,c) drop only c even though {a,b,c} is one
    duplicate cluster. Components give exactly one survivor per cluster.

    Each round: (1) neighbor-min propagation, (2) pointer jumping
    (label(x) <- label(label(x))) — path halving makes convergence
    O(log diameter) instead of O(diameter). ``localCheckpoint`` truncates
    the plan every round so the iterative lineage never snowballs (swap for
    ``checkpoint`` with a checkpoint dir on a real cluster).

    Scale: every step is a join or partial-aggregatable min keyed on node
    ids; the edge list is the only large state. Output: (node, cluster_id).
    Nodes not in any pair are absent (their cluster is themselves)."""
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        # (1) neighbor-min propagation
        neigh = (
            edges.join(labels.select(F.col("node").alias("dst"), "label"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
            .withColumnRenamed("src", "node")
        )
        stepped = labels.join(neigh, "node", "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
        )
        # (2) pointer jumping: follow the parent pointer one hop
        parent = stepped.select(
            F.col("node").alias("label"), F.col("label").alias("plabel")
        )
        new_labels = (
            stepped.join(parent, "label", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("plabel", "label")).alias("label"),
            )
            .localCheckpoint()  # truncate lineage: O(1) plan per round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # exhausted max_iters without the changed==0 early exit: labels may
        # still be split across a deep component — surface it, don't return
        # silently-wrong clusters (pointer jumping makes this need a
        # component of diameter > ~2^max_iters, so hitting it means the
        # caller's max_iters is badly undersized for the graph)
        warnings.warn(
            f"connected_components did not converge within max_iters="
            f"{max_iters}; labels may split deep components — raise max_iters",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select("node", F.col("label").alias("cluster_id"))


def dedup_keep_cluster_min(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Keep exactly one row per duplicate cluster (the minimum id) plus all
    rows that are in no pair — the cluster-correct generalization of
    'drop every id_b'."""
    comp = connected_components(pairs, id_a, id_b)
    losers = comp.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def dedup_paragraphs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
) -> DataFrame:
    """C4-style CROSS-DOCUMENT paragraph dedup: each distinct paragraph
    survives only at its first occurrence (lowest (doc_id, position));
    every later copy is removed and the texts are reconstructed from the
    surviving paragraphs in original order. Distinct from document-level
    dedup — it strips the boilerplate paragraphs (cookie banners, footer
    blurbs) that repeat across MANY otherwise-unique pages.

    One shuffle on the paragraph hash (first-occurrence window), one on
    the doc id (reconstruction agg); paragraphs travel as 32-byte sha256
    keys plus their text once each — no quadratic compare anywhere.
    Returns (id_col, text) with empty text for documents whose every
    paragraph was a duplicate.

    ``sep`` is treated as a LITERAL string on both the split and the
    reconstruction side (F.split takes a Java regex, so the split pattern
    is \\Q...\\E-quoted) — separators with regex metacharacters ('||',
    '. ') split and rejoin consistently."""
    # \Q...\E literal-quotes sep for java.util.regex; an embedded \E would
    # end the quote early, so re-open it around each occurrence
    sep_rx = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    paras = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep_rx)).alias("_idx", "_para"),
    ).filter(F.trim("_para") != "")
    w = Window.partitionBy(F.sha2(F.trim(F.col("_para")), 256)).orderBy(
        F.col(id_col), F.col("_idx")
    )
    kept = (
        paras.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_idx"), F.col("_para")))
                    ),
                    lambda s: s["_para"],
                ),
                sep,
            ).alias("text")
        )
    )
    return (
        docs.select(id_col)
        .join(kept, id_col, "left")
        .withColumn("text", F.coalesce(F.col("text"), F.lit("")))
    )


def duplicate_substring_spans(
    docs: DataFrame,
    min_len: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ExactSubstr dedup, detection half (the Lee et al. 2021
    "Deduplicating Training Data Makes Language Models Better" rule,
    applied at character granularity): every position whose ``min_len``-
    character window also occurs earlier in the corpus (ordered by
    (doc_id, pos); the FIRST occurrence survives) contributes a
    duplicate interval [pos, pos+min_len). Overlapping intervals are
    merged per document with a gaps-and-islands window.

    Returns (id_col, span_start, span_end) — 0-based char intervals,
    end exclusive — one row per merged removable span.

    Scale shape: windows travel as (sha256, doc, pos) triples — one
    shuffle on the window hash (first-occurrence ranking), one on the
    doc id (island merge). Nothing is quadratic: a window duplicated n
    times costs n rows, and the hash keeps the shuffle payload at
    32 bytes + ids regardless of min_len. Map-side cost is O(n_chars x
    min_len) per doc (JVM-side substring hashing, collision-free and
    oracle-twinnable); at 100 TB swap the hashing projection for an
    O(n_chars) Rabin-Karp rolling hash in a numpy UDF plus an equality
    verify on survivors — the shuffles and the island algebra (the parts
    that matter) stay identical."""
    L = int(min_len)
    n_wins = F.length(F.col(text_col)) - F.lit(L - 1)
    grams = docs.select(
        F.col(id_col),
        F.posexplode(
            F.when(
                n_wins >= 1,
                F.transform(
                    F.sequence(F.lit(1), n_wins),
                    lambda i: F.sha2(F.substring(F.col(text_col), i, L), 256),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("_pos", "_h"),
    )
    w_first = Window.partitionBy("_h").orderBy(F.col(id_col), F.col("_pos"))
    dups = (
        grams.withColumn("_rn", F.row_number().over(w_first))
        .filter(F.col("_rn") > 1)
        .select(id_col, F.col("_pos").alias("_start"))
    )
    # islands: a window starting <= L after the running max end extends
    # the current span; otherwise a new island begins
    w_doc = Window.partitionBy(id_col).orderBy("_start")
    w_prev = w_doc.rowsBetween(Window.unboundedPreceding, -1)
    spans = (
        dups.withColumn("_end", F.col("_start") + F.lit(L))
        .withColumn("_max_prev_end", F.max("_end").over(w_prev))
        .withColumn(
            "_new_island",
            F.when(
                F.col("_max_prev_end").isNull()
                | (F.col("_start") > F.col("_max_prev_end")),
                1,
            ).otherwise(0),
        )
        .withColumn("_island", F.sum("_new_island").over(w_doc))
        .groupBy(id_col, "_island")
        .agg(
            # posexplode indexes are already 0-based character offsets
            F.min("_start").alias("span_start"),
            F.max("_end").alias("span_end"),
        )
        .select(id_col, "span_start", "span_end")
    )
    return spans


def dedup_exact_substrings(
    docs: DataFrame,
    min_len: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ExactSubstr dedup, removal half: cut every merged duplicate span
    out of the text (first occurrence in corpus order survives intact).
    Returns (id_col, text) for EVERY input document. Reassembly is one
    Arrow stage over (text, collected spans per doc) — spans per doc are
    bounded by len(text)/min_len, so the collect_list is safe."""
    import pandas as pd
    from pyspark.sql import types as T

    spans = duplicate_substring_spans(docs, min_len, id_col, text_col)
    per_doc = spans.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("_spans")
    )

    @F.pandas_udf(T.StringType())
    def cut(text: pd.Series, sp: pd.Series) -> pd.Series:
        out = []
        for t, spans_i in zip(text, sp):
            if spans_i is None or len(spans_i) == 0:
                out.append(t)
                continue
            parts, cursor = [], 0
            for s in spans_i:
                a, b = int(s["span_start"]), int(s["span_end"])
                parts.append(t[cursor:a])
                cursor = max(cursor, b)
            parts.append(t[cursor:])
            out.append("".join(parts))
        return pd.Series(out)

    return (
        docs.select(id_col, text_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col, cut(F.col(text_col), F.col("_spans")).alias("text")
        )
    )
