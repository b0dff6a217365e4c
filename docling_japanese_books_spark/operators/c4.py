"""C4 cleaning rules (Raffel et al. 2020 §2.2) — the most-cited webtext
cleaning recipe, reused (with the same constants) by the public datatrove/
RedPajama reimplementations:

Line level (a line survives iff ALL hold):
- ends in a terminal punctuation mark (C4: ``. ! ? "``; this engine adds
  the CJK terminals ``。！？」`` because the north-rule corpus is
  Japanese-heavy — callers can pass the strict C4 set),
- has at least ``min_words`` whitespace words (C4: 5; counted on the
  raw line, not a tokenizer),
- does not mention "javascript" (case-insensitive — C4's artifact rule
  for script-soup extractions),
- does not contain a cookie/policy boilerplate phrase ("terms of use",
  "privacy policy", "cookie policy", "uses cookies", "use of cookies",
  "use cookies" — the published line blocklist).

Page level (the document survives iff ALL hold):
- at least ``min_lines`` lines survived (C4 requires >= 3 *sentences*,
  counted with an NLTK splitter; the retained-line count is this
  engine's deterministic, oracle-expressible proxy — documented, not
  hidden),
- the original text contains neither "lorem ipsum" (case-insensitive)
  nor a curly brace (C4's code-page rule).

Everything is JVM-side array/regexp algebra: split on newline, a
higher-order ``filter`` whose per-line predicate is plain column algebra
(lines per document are few, so HOF interpretation cost is irrelevant —
unlike per-char lambdas), ``array_join`` to rebuild. No UDF, no shuffle:
the 100 TB map shape, and every rule mirrors 1:1 into DuckDB list/regexp
functions for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TERMINAL_RE = r'[.!?"。！？」]$'
C4_STRICT_TERMINAL_RE = r'[.!?"]$'
POLICY_PHRASES = (
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
    "use of cookies",
    "use cookies",
)


def _line_keep(line: Column, min_words: int, terminal_re: str) -> Column:
    t = F.trim(line)
    low = F.lower(t)
    keep = t.rlike(terminal_re)
    keep = keep & (F.size(F.split(t, r"\s+")) >= min_words)
    keep = keep & ~low.contains("javascript")
    for phrase in POLICY_PHRASES:
        keep = keep & ~low.contains(phrase)
    return keep


def c4_signals(
    text: Column,
    min_words: int = 5,
    min_lines: int = 3,
    terminal_re: str = TERMINAL_RE,
) -> Column:
    """Struct column: (text cleaned, n_lines_in, n_lines_kept, kept)."""
    lines = F.split(text, "\n")
    kept_lines = F.filter(lines, lambda l: _line_keep(l, min_words, terminal_re))
    # NOT F.transform(kept_lines, F.trim): trim has an optional second
    # parameter, so transform would bind the element INDEX to it (the
    # deprecated two-arg TRIM) and trim nothing
    cleaned = F.array_join(F.transform(kept_lines, lambda l: F.trim(l)), "\n")
    low = F.lower(text)
    page_ok = (
        (F.size(kept_lines) >= min_lines)
        & ~low.contains("lorem ipsum")
        & ~text.contains("{")
    )
    return F.struct(
        cleaned.alias("text"),
        F.size(lines).alias("n_lines_in"),
        F.size(kept_lines).alias("n_lines_kept"),
        page_ok.alias("kept"),
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    min_lines: int = 3,
    terminal_re: str = TERMINAL_RE,
) -> DataFrame:
    """Apply the C4 recipe: drop failing pages, replace ``text_col`` with
    the retained lines (trimmed, newline-joined). Other columns pass
    through untouched."""
    s = c4_signals(F.col(text_col), min_words, min_lines, terminal_re)
    return (
        df.withColumn("_c4", s)
        .filter(F.col("_c4.kept"))
        .withColumn(text_col, F.col("_c4.text"))
        .drop("_c4")
    )
