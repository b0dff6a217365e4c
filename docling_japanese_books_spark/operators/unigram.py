"""Unigram-LM subword tokenizer (Kudo 2018) — the SentencePiece algorithm
that is the de-facto standard for Japanese and multilingual models (BPE's
greedy merges fragment CJK text badly; the unigram lattice does not).

Same Spark contract as the BPE module: **training** is ONE distributed
word-count shuffle + a bounded top-N collect — only the ``max_words`` most
frequent (word, count) pairs reach the driver, and the EM/prune loop runs
on that dictionary exactly as the published algorithm does. **Encoding**
is a single Arrow-batched pandas UDF whose piece->logprob dict rides the
closure (KBs), Viterbi per word with per-batch memoization.

Algorithm (Kudo 2018 §3, the public recipe):

1. Seed vocabulary: the most frequent substrings (length <= max_piece_len)
   of the word dictionary, plus every single character (so segmentation
   never fails).
2. EM: the E-step runs full forward-backward over each word's
   segmentation lattice, accumulating EXPECTED piece counts (soft counts,
   not Viterbi hard counts); the M-step renormalizes to probabilities.
3. Prune: drop the lowest-expected-count pieces (never single characters)
   a fraction at a time, re-running EM between rounds, until vocab_size
   remains. (SentencePiece ranks pieces by exact likelihood loss; the
   expected-count ranking is the standard simplification — identical
   ordering except for ties in near-zero-count pieces — and keeps the
   loop deterministic. Documented, not hidden.)
4. Encode: per word, Viterbi over the final vocabulary (max sum of piece
   log-probs; ties prefer the longer first piece, then lexicographic —
   fully deterministic). Characters outside the vocabulary emit the
   ``<unk>`` piece.

Words are lowercased whitespace tokens (the BPE module's convention, so
token-count comparisons across the two tokenizers are apples-to-apples);
CJK runs — which have no whitespace — stay intact as single "words" and
the lattice segments them, which is precisely the unigram model's
advantage. Words are truncated to ``max_word_len`` chars for EM
numerical stability (forward-backward products; truncation affects
training statistics only, never encoding).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .bpe import word_counts

UNK = "<unk>"
_MAX_WORD_LEN = 64


def seed_vocab(
    counts: Sequence[Tuple[str, int]],
    seed_size: int,
    max_piece_len: int = 8,
) -> Dict[str, float]:
    """Substring-frequency seed (Kudo §3 step 1): piece -> initial prob.
    Every single character is always included; multi-char pieces are the
    ``seed_size`` most frequent substrings (ties lexicographic)."""
    sub: Dict[str, int] = {}
    for word, n in counts:
        word = word[:_MAX_WORD_LEN]
        L = len(word)
        for i in range(L):
            for j in range(i + 1, min(i + max_piece_len, L) + 1):
                piece = word[i:j]
                sub[piece] = sub.get(piece, 0) + n
    chars = {p: c for p, c in sub.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in sub.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[: max(0, seed_size - len(chars))]
    vocab = dict(chars)
    vocab.update(dict(multi))
    total = sum(vocab.values())
    return {p: c / total for p, c in vocab.items()}


def _forward_backward(
    word: str, probs: Dict[str, float], max_piece_len: int
) -> Tuple[Dict[str, float], float]:
    """Expected piece counts for one word under the unigram model, plus
    the word's total likelihood (sum over all segmentations). Plain
    float64: words are truncated to _MAX_WORD_LEN and seed probs are
    >= 1/total_chars, so products stay well above underflow."""
    L = len(word)
    alpha = [0.0] * (L + 1)
    alpha[0] = 1.0
    for i in range(1, L + 1):
        s = 0.0
        for j in range(max(0, i - max_piece_len), i):
            p = probs.get(word[j:i])
            if p:
                s += alpha[j] * p
        alpha[i] = s
    if alpha[L] == 0.0:
        return {}, 0.0
    beta = [0.0] * (L + 1)
    beta[L] = 1.0
    for i in range(L - 1, -1, -1):
        s = 0.0
        for j in range(i + 1, min(i + max_piece_len, L) + 1):
            p = probs.get(word[i:j])
            if p:
                s += p * beta[j]
        beta[i] = s
    out: Dict[str, float] = {}
    z = alpha[L]
    for i in range(L):
        for j in range(i + 1, min(i + max_piece_len, L) + 1):
            piece = word[i:j]
            p = probs.get(piece)
            if p:
                out[piece] = out.get(piece, 0.0) + alpha[i] * p * beta[j] / z
    return out, z


def em_step(
    counts: Sequence[Tuple[str, int]],
    probs: Dict[str, float],
    max_piece_len: int = 8,
) -> Dict[str, float]:
    """One full EM iteration over the word dictionary: soft expected
    counts via forward-backward, then renormalize. Pure function —
    exposed so tests can pin it against hand-computed lattices."""
    expected: Dict[str, float] = {}
    for word, n in counts:
        word = word[:_MAX_WORD_LEN]
        if not word:
            continue
        exp_w, z = _forward_backward(word, probs, max_piece_len)
        if z == 0.0:
            continue
        for piece, c in exp_w.items():
            expected[piece] = expected.get(piece, 0.0) + n * c
    total = sum(expected.values())
    if total == 0.0:
        return dict(probs)
    return {p: c / total for p, c in expected.items() if c > 0.0}


def train_unigram(
    corpus: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    max_words: int = 50_000,
    max_piece_len: int = 8,
    seed_factor: int = 4,
    em_iters: int = 2,
    prune_frac: float = 0.25,
) -> Dict[str, float]:
    """Learn a unigram vocabulary from the corpus: piece -> log-prob.
    See the module docstring for the scale shape (one shuffle + bounded
    collect; everything after runs on the driver's word dictionary)."""
    counts = word_counts(corpus, text_col, max_words)
    return learn_unigram(
        counts,
        vocab_size,
        max_piece_len=max_piece_len,
        seed_factor=seed_factor,
        em_iters=em_iters,
        prune_frac=prune_frac,
    )


def learn_unigram(
    counts: Sequence[Tuple[str, int]],
    vocab_size: int,
    max_piece_len: int = 8,
    seed_factor: int = 4,
    em_iters: int = 2,
    prune_frac: float = 0.25,
) -> Dict[str, float]:
    """Driver-side EM + prune loop on a (word, count) dictionary."""
    probs = seed_vocab(counts, vocab_size * seed_factor, max_piece_len)
    while True:
        for _ in range(em_iters):
            new = em_step(counts, probs, max_piece_len)
            # single chars must survive even with zero expected count
            floor = (min(new.values()) if new else 1.0) * 1e-6
            for p in list(probs):
                if len(p) == 1 and p not in new:
                    new[p] = floor
            probs = new
        n_multi = sum(1 for p in probs if len(p) > 1)
        n_chars = len(probs) - n_multi
        target_multi = max(0, vocab_size - n_chars)
        if n_multi <= target_multi:
            break
        keep = max(target_multi, int(n_multi * (1.0 - prune_frac)))
        ranked = sorted(
            ((p, c) for p, c in probs.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        kept = dict(ranked[:keep])
        kept.update({p: c for p, c in probs.items() if len(p) == 1})
        total = sum(kept.values())
        probs = {p: c / total for p, c in kept.items()}
    return {p: math.log(c) for p, c in probs.items()}


def viterbi_word(word: str, logp: Dict[str, float], max_piece_len: int = 8) -> List[str]:
    """Best segmentation under the unigram model: max sum of log-probs;
    ties prefer the longer last piece at each position (then the
    lexicographically smaller one) — deterministic everywhere. Unknown
    characters emit UNK."""
    L = len(word)
    NEG = float("-inf")
    unk_pen = (min(logp.values()) if logp else 0.0) - 10.0
    best = [NEG] * (L + 1)
    back: List[Tuple[int, str]] = [(0, "")] * (L + 1)
    best[0] = 0.0
    for i in range(1, L + 1):
        for j in range(max(0, i - max_piece_len), i):
            if best[j] == NEG:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j == 1:  # unknown single char: UNK fallback
                    lp = unk_pen
                else:
                    continue
            score = best[j] + lp
            if score > best[i] or (
                score == best[i]
                and (j < back[i][0] or (j == back[i][0] and piece < back[i][1]))
            ):
                best[i] = score
                back[i] = (j, piece if piece in logp else UNK)
    out: List[str] = []
    i = L
    while i > 0:
        j, piece = back[i]
        out.append(piece)
        i = j
    out.reverse()
    return out


UNIGRAM_SCHEMA = T.StructType(
    [
        T.StructField("n_tokens", T.IntegerType(), False),
        T.StructField("tokens", T.ArrayType(T.StringType()), False),
    ]
)


def unigram_encode_udf(model: Dict[str, float], max_piece_len: int = 8):
    """Arrow-batched encoder: text -> (n_tokens, tokens); the model dict
    rides the closure, Viterbi memoized per batch (Zipf re-use)."""

    @F.pandas_udf(UNIGRAM_SCHEMA)
    def encode(texts: pd.Series) -> pd.DataFrame:
        cache: Dict[str, List[str]] = {}
        rows = []
        for text in texts:
            toks: List[str] = []
            for word in (text or "").lower().split():
                hit = cache.get(word)
                if hit is None:
                    hit = cache[word] = viterbi_word(word, model, max_piece_len)
                toks.extend(hit)
            rows.append(dict(n_tokens=len(toks), tokens=toks))
        return pd.DataFrame(rows)

    return encode


def encode_corpus_unigram(
    docs: DataFrame,
    model: Dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 8,
) -> DataFrame:
    """(id, n_tokens, tokens) for every document — one Python stage, no
    shuffle (the 100 TB map shape)."""
    e = unigram_encode_udf(model, max_piece_len)(F.col(text_col))
    return docs.select(
        F.col(id_col),
        e.getField("n_tokens").alias("n_tokens"),
        e.getField("tokens").alias("tokens"),
    )
