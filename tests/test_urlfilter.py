"""URL-level filtering (operators/urlfilter.py): UT1-style domain
blocklist semantics, RefinedWeb hard-subword and soft-word rules, and
the broadcast/codegen plan shape."""

from __future__ import annotations

from docling_japanese_books_spark.operators.urlfilter import (
    soft_word_score,
    url_filter_verdicts,
)
from pyspark.sql import functions as F


def _pages(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_domain_blocklist_etld1_and_host_entries(spark):
    pages = _pages(
        spark,
        [
            "https://a.b.tracker.example/x",   # subdomain of listed eTLD+1
            "https://tracker.example/y",       # the listed domain itself
            "https://metrics.site.example/z",  # host-specific entry
            "https://other.site.example/w",    # same eTLD+1, NOT listed
            "https://clean.example/v",
        ],
    )
    out = url_filter_verdicts(
        pages, blocked_domains=["tracker.example", "metrics.site.example"]
    )
    got = {r.url: r.domain_blocked for r in out.collect()}
    assert got == {
        "https://a.b.tracker.example/x": True,
        "https://tracker.example/y": True,
        "https://metrics.site.example/z": True,
        "https://other.site.example/w": False,
        "https://clean.example/v": False,
    }


def test_blocked_subwords_case_insensitive(spark):
    pages = _pages(
        spark,
        [
            "https://x.example/Phishing-kit/1",
            "https://x.example/safe/phish/2",  # 'phish' is not 'phishing'
            "https://x.example/ok",
        ],
    )
    out = url_filter_verdicts(pages, blocked_subwords=["PHISHING"])
    got = {r.url: r.subword_blocked for r in out.collect()}
    assert got == {
        "https://x.example/Phishing-kit/1": True,
        "https://x.example/safe/phish/2": False,
        "https://x.example/ok": False,
    }


def test_soft_word_score_delimited_tokens(spark):
    words = {"bet": 1.0, "casino": 1.5}
    pages = _pages(
        spark,
        [
            "https://x.example/bet/odds",        # 1.0 (path segment)
            "https://x.example/p?q=bet",          # 1.0 (query value, at end)
            "https://x.example/alphabet/soup",    # 0.0 (substring only)
            "https://x.example/casino-bet",       # 2.5 -> blocked at 2.0
            "https://x.example/plain",            # 0.0
        ],
    )
    out = url_filter_verdicts(pages, soft_words=words, soft_threshold=2.0)
    rows = {r.url: (r.soft_score, r.keep) for r in out.collect()}
    assert rows["https://x.example/bet/odds"] == (1.0, True)
    assert rows["https://x.example/p?q=bet"] == (1.0, True)
    assert rows["https://x.example/alphabet/soup"] == (0.0, True)
    assert rows["https://x.example/casino-bet"] == (2.5, False)
    assert rows["https://x.example/plain"] == (0.0, True)


def test_keep_combines_all_rules(spark):
    pages = _pages(
        spark,
        ["https://bad.example/casino", "https://good.example/news"],
    )
    out = url_filter_verdicts(
        pages,
        blocked_domains=["bad.example"],
        blocked_subwords=["malware"],
        soft_words={"casino": 1.0},
        soft_threshold=1.0,
    )
    got = {r.url: r.keep for r in out.collect()}
    assert got == {
        "https://bad.example/casino": False,  # domain AND soft both fire
        "https://good.example/news": True,
    }
    # verdict frame keeps every input row
    assert out.count() == 2


def test_plan_broadcasts_blocklist_no_corpus_shuffle(spark):
    """The 100 TB shape: both blocklist joins broadcast (the corpus never
    shuffles) and the rule columns are pure codegen — no Python."""
    pages = _pages(spark, [f"https://h{i}.example/p" for i in range(64)])
    out = url_filter_verdicts(
        pages,
        blocked_domains=["h1.example"],
        blocked_subwords=["spam"],
        soft_words={"bet": 1.0},
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # every shuffle exchange keys on the blocklist's domain column (its
    # distinct()) — the corpus itself never shuffles
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "domain#" in line, line


def test_soft_word_score_column_reusable(spark):
    """soft_word_score is a public Column fn usable outside the verdict
    frame (e.g. as a curation report aggregate input)."""
    df = _pages(spark, ["https://x.example/bet", "https://x.example/a"])
    s = df.select(
        F.round(soft_word_score(F.col("url"), {"bet": 0.5}), 6).alias("s")
    ).collect()
    assert sorted(r.s for r in s) == [0.0, 0.5]
