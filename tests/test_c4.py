"""C4 cleaning rules (operators/c4.py): line battery, page battery, CJK
terminal extension, and passthrough of non-text columns."""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_japanese_books_spark.operators.c4 import (
    C4_STRICT_TERMINAL_RE,
    c4_clean,
    c4_signals,
)

GOODLINE = "this line has plenty of words and ends properly."


def _sig(spark, text, **kw):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(c4_signals(F.col("text"), **kw).alias("s")).collect()[0].s


def test_c4_line_rules(spark):
    text = "\n".join(
        [
            GOODLINE,                                   # kept
            "no terminal punctuation here at all",      # dropped: terminal
            "too few words.",                           # dropped: min_words
            "this mentions JavaScript somewhere okay.", # dropped: javascript
            "please read our privacy policy before proceeding.",  # dropped
            "another perfectly fine sentence stands here.",       # kept
            "日本語の文は句点で終わるのが普通です。",       # kept (CJK terminal)
        ]
    )
    s = _sig(spark, text, min_words=5)
    assert s.n_lines_in == 7
    # the JP line fails min_words=5 (one whitespace token — C4's word
    # count is whitespace-based, which is exactly why CJK pipelines
    # lower min_words): 2 survivors
    assert s.n_lines_kept == 2
    assert not s.kept  # < 3 kept lines
    assert s.text.split("\n")[0] == GOODLINE
    # with min_words=1 the CJK terminal extension keeps the JP line
    jp = _sig(spark, "日本語の文は句点で終わるのが普通です。", min_words=1,
              min_lines=1)
    assert jp.n_lines_kept == 1 and jp.kept


def test_c4_strict_terminal_set_drops_cjk(spark):
    jp = "日本語の文は句点で終わるのが普通です。"
    s = _sig(spark, jp, min_words=1, min_lines=1,
             terminal_re=C4_STRICT_TERMINAL_RE)
    assert s.n_lines_kept == 0 and not s.kept


def test_c4_page_rules(spark):
    three = "\n".join([GOODLINE] * 3)
    assert _sig(spark, three).kept
    assert not _sig(spark, "\n".join([GOODLINE] * 2)).kept  # < 3 kept lines
    assert not _sig(spark, three + "\nsome Lorem Ipsum filler.").kept
    assert not _sig(spark, three + "\nvar x = { a: 1 };").kept  # curly brace


def test_c4_clean_filters_and_rewrites(spark):
    rows = [
        (1, "\n".join([GOODLINE] * 3) + "\nnope"),  # survives, line dropped
        (2, "short."),                               # page dropped
        (3, "\n".join([GOODLINE] * 4) + "\n{code}"), # curly: page dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = c4_clean(df).collect()
    assert [r.doc_id for r in out] == [1]
    assert out[0].text == "\n".join([GOODLINE] * 3)  # 'nope' line removed


def test_c4_trims_kept_lines(spark):
    s = _sig(spark, "   " + GOODLINE + "   \n" + GOODLINE + "\n" + GOODLINE)
    assert s.kept and s.text.split("\n")[0] == GOODLINE  # trimmed


def test_c4_clean_is_idempotent(spark):
    """Every retained line was trimmed and passed the full line battery,
    and surviving pages passed the page battery on their original text —
    so cleaning a cleaned corpus must be the identity."""
    rows = [
        (1, "\n".join([GOODLINE] * 3) + "\n   spaced but fine sentence with words here.   \nnope"),
        (2, "\n".join([GOODLINE] * 5)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = c4_clean(df)
    twice = c4_clean(once)
    a = {r.doc_id: r.text for r in once.collect()}
    b = {r.doc_id: r.text for r in twice.collect()}
    assert a == b and set(a) == {1, 2}
