"""Real byte-pair-encoding tokenizer: distributed training + Arrow encode.

``textstats.bpe_ish_token_count`` approximates token counts with a
regex; training pipelines eventually need the real thing — a trained
merge table and deterministic encoding — for sequence packing, length
filtering, and per-token cost accounting. This module implements the
textbook algorithm (Sennrich et al. 2016, the public BPE recipe GPT-2's
tokenizer builds on) in the Spark-correct shape:

- **Training** is ONE distributed word-count shuffle + a bounded top-N
  collect: at 100 TB the corpus never leaves the executors — only the
  ``max_words`` most frequent (word, count) pairs (a few MB) reach the
  driver, and the merge loop runs on that dictionary exactly as the
  published algorithm does. A frequency floor makes the truncation
  explicit rather than silent.
- **Encoding** is a single Arrow-batched pandas UDF whose merge-rank
  dict rides the closure (KBs): per word, greedily apply the
  lowest-rank merge until none applies (GPT-2's ``bpe()`` loop),
  memoized per batch because Zipf's law makes word re-use enormous.

Word tokenization is lowercased ASCII-whitespace splitting with an
end-of-word marker ``</w>`` appended to the final symbol (the original
paper's convention), so "low" mid-word and "low"-at-end merge
independently.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EOW = "</w>"


def word_counts(
    corpus: DataFrame, text_col: str = "text", max_words: int = 50_000
) -> List[Tuple[str, int]]:
    """The one distributed step: (word, count) for the ``max_words`` most
    frequent lowercased words, ties broken by word for determinism.
    Top-N is a TakeOrdered-style bounded collect — no full sort."""
    toks = F.explode(
        F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    ).alias("w")
    rows = (
        corpus.select(toks)
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    return [(r.w, int(r.n)) for r in rows]


def train_bpe(
    corpus: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_words: int = 50_000,
) -> List[Tuple[str, str]]:
    """Learn ``n_merges`` merges from the corpus (see module docstring
    for the scale shape). Returns the ordered merge list."""
    return learn_merges(word_counts(corpus, text_col, max_words), n_merges)


def learn_merges(
    counts: Sequence[Tuple[str, int]], n_merges: int
) -> List[Tuple[str, str]]:
    """Sennrich merge loop over a (word, count) dictionary: repeatedly
    merge the most frequent adjacent symbol pair (ties broken
    lexicographically for determinism). Pure driver-side function —
    exposed so tests can pin it against hand-computed merges."""
    vocab: Dict[Tuple[str, ...], int] = {}
    for word, n in counts:
        if not word:
            continue
        symbols = tuple(word[:-1]) + (word[-1] + EOW,)
        vocab[symbols] = vocab.get(symbols, 0) + n
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Dict[Tuple[str, str], int] = {}
        for symbols, n in vocab.items():
            for a, b in zip(symbols, symbols[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: Dict[Tuple[str, ...], int] = {}
        for symbols, n in vocab.items():
            out: List[str] = []
            i = 0
            while i < len(symbols):
                if (
                    i + 1 < len(symbols)
                    and symbols[i] == best[0]
                    and symbols[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


def bpe_word(word: str, ranks: Dict[Tuple[str, str], int]) -> List[str]:
    """Encode one word with a merge-rank table: repeatedly apply the
    lowest-rank applicable merge (GPT-2's bpe() loop, public recipe)."""
    if not word:
        return []
    symbols = list(word[:-1]) + [word[-1] + EOW]
    while len(symbols) > 1:
        ranked = [
            (ranks[p], i)
            for i, p in enumerate(zip(symbols, symbols[1:]))
            if p in ranks
        ]
        if not ranked:
            break
        _, i = min(ranked)
        symbols[i : i + 2] = [symbols[i] + symbols[i + 1]]
    return symbols


BPE_SCHEMA = T.StructType(
    [
        T.StructField("n_tokens", T.IntegerType(), False),
        T.StructField("tokens", T.ArrayType(T.StringType()), False),
    ]
)


def bpe_encode_udf(merges: Sequence[Tuple[str, str]]):
    """Arrow-batched encoder: text -> (n_tokens, tokens). The merge-rank
    dict rides the closure; per-batch word memoization exploits Zipf
    re-use (the same frequent words dominate every batch)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @F.pandas_udf(BPE_SCHEMA)
    def encode(texts: pd.Series) -> pd.DataFrame:
        cache: Dict[str, List[str]] = {}
        rows = []
        for text in texts:
            toks: List[str] = []
            for word in (text or "").lower().split():
                hit = cache.get(word)
                if hit is None:
                    hit = cache[word] = bpe_word(word, ranks)
                toks.extend(hit)
            rows.append(dict(n_tokens=len(toks), tokens=toks))
        return pd.DataFrame(rows)

    return encode


def encode_corpus(
    docs: DataFrame,
    merges: Sequence[Tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, tokens) for every document — one Python stage, no
    shuffle (the 100 TB map shape)."""
    e = bpe_encode_udf(merges)(F.col(text_col))
    return docs.select(
        F.col(id_col),
        e.getField("n_tokens").alias("n_tokens"),
        e.getField("tokens").alias("tokens"),
    )
