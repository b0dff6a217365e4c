"""Curation pipeline: quality gate, exact + near dedup, survival report."""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_japanese_books_spark.pipeline.curate import curate_corpus

GOOD = (
    "the quick brown fox jumps over the lazy dog and it was a fine day in "
    "the park where the children played and the birds sang in the trees"
)


def test_curation_stages(spark):
    rows = [
        ("https://a/1", GOOD, "en"),
        ("https://a/2", GOOD, "en"),                       # exact dup of 1
        ("https://a/3", GOOD + " extra ending", "en"),     # near dup of 1
        ("https://a/4", "zzz qq", "en"),                   # too short + low quality
        ("https://a/5", "the another completely different story about a "
                        "castle on the hill where it was always raining and "
                        "the wind blew through it for a hundred years", "en"),
    ]
    df = spark.createDataFrame(rows, "url string, text string, lang string")
    curated, report = curate_corpus(df, min_quality=0.2, near_dup_threshold=0.5)

    urls = {r.url for r in curated.select("url").collect()}
    assert report.rows_in == 5
    assert report.rows_quality_pass == 4          # /4 gated out
    assert report.rows_after_exact_dedup == 3     # /2 collapsed into /1
    assert report.rows_after_near_dedup == 2      # /3 collapsed into /1
    assert urls == {"https://a/1", "https://a/5"}

    got = curated.filter(F.col("url") == "https://a/1").collect()[0]
    assert got.lang_guess == "en"
    assert 0.0 <= got.quality <= 1.0


def test_curation_normalizes_before_hashing(spark):
    # full-width vs ascii text must collapse in exact dedup after NFKC
    rows = [
        ("https://b/1", "ＡＢＣ " + GOOD, "ja"),
        ("https://b/2", "ABC " + GOOD, "en"),
    ]
    df = spark.createDataFrame(rows, "url string, text string, lang string")
    curated, report = curate_corpus(df, min_quality=0.0, min_chars=1)
    assert report.rows_after_exact_dedup == 1
    assert [r.url for r in curated.collect()] == ["https://b/1"]


def test_curation_is_single_pass(spark, monkeypatch, tmp_path):
    """The normalize UDF must run exactly once per input row across ALL
    report counts AND the final write — an uncached lineage reruns it per
    action (4x in the worst case), which is the scale-killer at 100 TB."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql import functions as F
    from docling_japanese_books_spark.operators.normalize import normalize_cjk
    from docling_japanese_books_spark.pipeline import curate as curate_mod

    calls = spark.sparkContext.accumulator(0)

    def _counting(texts):
        calls.add(len(texts))
        return texts.map(lambda t: normalize_cjk(t) if t is not None else None)

    # real annotations: `from __future__ import annotations` stringifies
    # inline hints, which pandas_udf's type-hint inference can't resolve
    _counting.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    counting_normalize = F.pandas_udf(_counting, T.StringType())

    monkeypatch.setattr(curate_mod, "normalize_cjk_udf", counting_normalize)

    rows = [(f"https://c/{i}", GOOD + f" tail {i}", "en") for i in range(20)]
    df = spark.createDataFrame(rows, "url string, text string, lang string")
    curated, report = curate_corpus_patched = curate_mod.curate_corpus(
        df, min_quality=0.0, min_chars=1
    )
    # writing the returned frame must NOT recompute the pipeline
    curated.write.mode("overwrite").parquet(str(tmp_path / "out"))
    assert report.rows_in == 20
    assert calls.value == 20, f"normalize UDF ran {calls.value} times for 20 rows"


def test_curation_with_model_and_substring_stages(spark):
    """Round-6 wiring (round-5 verdict #6): the learned quality gate and
    the ExactSubstr cut run INSIDE curate_corpus as pipeline stages with
    their own report metrics — five published filter stages, one pass."""
    banner = (
        "subscribe-to-our-newsletter-for-updates-and-offers-every-single-week"
    )
    fluent = [
        ("https://d/1", GOOD + " one. " + banner, "en"),
        ("https://d/2", "a completely different tale of the harbour where "
                        "the boats came home at dusk and the lamps were lit "
                        "one by one along the quay two. " + banner, "en"),
        ("https://d/3", "the castle stood on the hill for a hundred years "
                        "while the rain fell and the wind blew through the "
                        "empty halls of stone three. " + banner, "en"),
    ]
    df = spark.createDataFrame(fluent, "url string, text string, lang string")
    curated, report = curate_corpus(
        df,
        min_quality=0.0,
        min_chars=1,
        model_quality_min=0.0,      # gate enabled, threshold permissive
        model_sample_size=3,
        substring_min_len=len(banner),
    )
    assert report.rows_in == 3
    assert report.rows_model_quality_pass == 3
    assert report.rows_after_substring_cut == 3
    # the banner survives only at its first corpus occurrence (lowest url)
    texts = {r.url: r.text for r in curated.collect()}
    assert banner in texts["https://d/1"]
    assert banner not in texts["https://d/2"]
    assert banner not in texts["https://d/3"]
    assert report.substring_chars_removed >= 2 * len(banner)
    # the model-quality column rides the curated output
    assert "model_quality" in curated.columns


def test_curation_full_pipeline_is_single_pass(spark, monkeypatch, tmp_path):
    """The single-pass accumulator pin must hold with ALL five stages on:
    the normalize UDF still runs exactly once per input row across the
    model training collect, both dedup counts, the substring-cut stats,
    and the final write."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql import functions as F
    from docling_japanese_books_spark.operators.normalize import normalize_cjk
    from docling_japanese_books_spark.pipeline import curate as curate_mod

    calls = spark.sparkContext.accumulator(0)

    def _counting(texts):
        calls.add(len(texts))
        return texts.map(lambda t: normalize_cjk(t) if t is not None else None)

    _counting.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    monkeypatch.setattr(
        curate_mod, "normalize_cjk_udf", F.pandas_udf(_counting, T.StringType())
    )

    rows = [(f"https://e/{i}", GOOD + f" tail {i}", "en") for i in range(20)]
    df = spark.createDataFrame(rows, "url string, text string, lang string")
    curated, report = curate_mod.curate_corpus(
        df,
        min_quality=0.0,
        min_chars=1,
        model_quality_min=0.0,
        model_sample_size=5,
        substring_min_len=len(GOOD),
    )
    curated.write.mode("overwrite").parquet(str(tmp_path / "out"))
    assert report.rows_in == 20
    assert calls.value == 20, f"normalize UDF ran {calls.value} times for 20 rows"


def test_curation_semantic_stage_drops_paraphrases(spark):
    """SemDeDup stage: a word-order paraphrase survives exact dedup (new
    sha256) and a disabled MinHash gate, but its trigram stub embedding is
    cosine ~1 to the original — the semantic stage drops it, keeping the
    smaller url."""
    para = GOOD.replace("quick brown fox", "brown quick fox")
    assert para != GOOD
    rows = [
        ("https://f/1", GOOD, "en"),
        ("https://f/2", para, "en"),           # paraphrase of /1
        ("https://f/3", "a completely different tale of the harbour where "
                        "the boats came home at dusk and the lamps were "
                        "lit one by one along the quay", "en"),
    ]
    df = spark.createDataFrame(rows, "url string, text string, lang string")
    curated, report = curate_corpus(
        df,
        min_quality=0.0,
        min_chars=1,
        near_dup_threshold=1.1,    # lexical near-dup disabled: >1 impossible
        semantic_tau=0.9,
        # one cluster: with k=2 the centroids would be /1 and /2 themselves,
        # putting each paraphrase in its own cluster — the published
        # SemDeDup boundary-miss approximation, demonstrated in
        # tests/test_semdedup.py; here we test the curate wiring
        semantic_clusters=1,
    )
    assert report.rows_after_near_dedup == 3
    assert report.rows_after_semantic_dedup == 2
    urls = {r.url for r in curated.collect()}
    assert urls == {"https://f/1", "https://f/3"}


def test_curation_six_stages_single_pass(spark, monkeypatch, tmp_path):
    """The accumulator pin with EVERY optional stage on (learned quality +
    semantic dedup + adaptive/checkpointed ExactSubstr): normalize still
    runs exactly once per input row across all report counts, the anchor
    pass, the semantic embed, and the final write."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql import functions as F
    from docling_japanese_books_spark.operators.normalize import normalize_cjk
    from docling_japanese_books_spark.pipeline import curate as curate_mod

    calls = spark.sparkContext.accumulator(0)

    def _counting(texts):
        calls.add(len(texts))
        return texts.map(lambda t: normalize_cjk(t) if t is not None else None)

    _counting.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    monkeypatch.setattr(
        curate_mod, "normalize_cjk_udf", F.pandas_udf(_counting, T.StringType())
    )

    rows = [(f"https://g/{i}", GOOD + f" tail {i}", "en") for i in range(20)]
    df = spark.createDataFrame(rows, "url string, text string, lang string")
    curated, report = curate_mod.curate_corpus(
        df,
        min_quality=0.0,
        min_chars=1,
        model_quality_min=0.0,
        model_sample_size=5,
        semantic_tau=0.9999,   # near-exact only: tails differ, all survive
        substring_min_len=len(GOOD),
    )
    curated.write.mode("overwrite").parquet(str(tmp_path / "out"))
    assert report.rows_in == 20
    assert report.rows_after_semantic_dedup is not None
    assert report.substring_path in ("prefilter", "bare")
    assert report.substring_candidate_fraction is not None
    assert calls.value == 20, f"normalize UDF ran {calls.value} times for 20 rows"


def test_curation_gopher_gate(spark):
    """gopher=True folds the Gopher rule battery into the heuristic gate:
    rows_quality_pass still counts heuristic-only survivors while
    rows_gopher_pass counts survivors of both, and only the latter flow
    into dedup."""
    passing = " ".join(
        ["the quick brown fox jumps over that lazy dog with style and"] * 6
    )
    rows = [
        (f"https://pass/{i}", passing + f" extra tail words number {i}", "en")
        for i in range(3)
    ] + [
        # GOOD is 27 words: healthy text but under Gopher's 50-word floor
        (f"https://short/{i}", GOOD + f" tail {i}", "en")
        for i in range(2)
    ]
    df = spark.createDataFrame(rows, "url string, text string, lang string")

    _, plain = curate_corpus(df, min_quality=0.0, min_chars=1)
    assert plain.rows_gopher_pass is None
    assert plain.rows_quality_pass == 5

    curated, rep = curate_corpus(df, min_quality=0.0, min_chars=1, gopher=True)
    assert rep.rows_quality_pass == 5  # heuristic-only count unchanged
    assert rep.rows_gopher_pass == 3
    # downstream dedup still applies: the three gopher survivors differ
    # only in their tails, so near-dup collapses them to the min url
    assert [r.url for r in curated.collect()] == ["https://pass/0"]


def test_curation_c4_stage_rewrites_and_gates(spark):
    """c4=True cleans text (retained lines) before scoring, drops failing
    pages via the gate, and reports rows_c4_pass — while the heuristic
    quality count keeps its meaning on the cleaned text."""
    goodline = "the quick brown fox jumps over that lazy dog with style."
    keep_text = "\n".join([goodline] * 4) + "\nno terminal punct dropped line"
    rows = [
        (f"https://keep/{i}", keep_text + f"\nthis unique tail sentence number {i} is long enough to matter.", "en")
        for i in range(2)
    ] + [
        ("https://code/1", "var x = 1;\nfunction f() {}", "en"),  # curly: dropped
    ]
    df = spark.createDataFrame(rows, "url string, text string, lang string")
    curated, rep = curate_corpus(df, min_quality=0.0, min_chars=1, c4=True)
    assert rep.rows_in == 3 and rep.rows_c4_pass == 2
    out = {r.url: r.text for r in curated.collect()}
    # near-dup collapses the two keeps to the min url; text was REWRITTEN:
    # the non-terminal line is gone, the tail sentence survived
    assert list(out) == ["https://keep/0"]
    assert "dropped line" not in out["https://keep/0"]
    assert "unique tail sentence number 0" in out["https://keep/0"]
    # disabled: report field stays None
    _, rep2 = curate_corpus(df, min_quality=0.0, min_chars=1)
    assert rep2.rows_c4_pass is None


def test_curation_gopher_repetition_gate(spark):
    """gopher_repetition=True folds the repetition battery into the gate:
    a document whose top bigram dominates its characters is dropped even
    though the heuristic quality gate and the rule battery would keep it."""
    clean = " ".join(f"w{i:02d}ord extra" for i in range(40)) + " the of and."
    spam = ("click here " * 60).strip() + " the of and."
    rows = [("https://clean/1", clean, "en"), ("https://spam/1", spam, "en")]
    df = spark.createDataFrame(rows, "url string, text string, lang string")
    _, off = curate_corpus(df, min_quality=0.0, min_chars=1)
    assert off.rows_gopher_pass is None and off.rows_quality_pass == 2
    curated, rep = curate_corpus(
        df, min_quality=0.0, min_chars=1, gopher_repetition=True
    )
    assert rep.rows_gopher_pass == 1
    assert [r.url for r in curated.collect()] == ["https://clean/1"]


def test_url_gate_blocks_before_normalize(spark, monkeypatch):
    """Stage-0 wiring: URL-blocked pages never reach the normalize UDF
    (the whole point of a URL gate at 100 TB — the accumulator counts
    exactly one normalize call per URL SURVIVOR), and the report carries
    the pre-gate rows_in plus rows_url_pass."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql import functions as F
    from docling_japanese_books_spark.operators.normalize import normalize_cjk
    from docling_japanese_books_spark.pipeline import curate as curate_mod

    calls = spark.sparkContext.accumulator(0)

    def _counting(texts):
        calls.add(len(texts))
        return texts.map(lambda t: normalize_cjk(t) if t is not None else None)

    _counting.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    monkeypatch.setattr(
        curate_mod, "normalize_cjk_udf", F.pandas_udf(_counting, T.StringType())
    )

    rows = [
        (f"https://spam.example/casino/{i}", GOOD + f" blocked {i}", "en")
        for i in range(8)
    ] + [
        (f"https://ok.example/a/{i}", GOOD + f" kept {i}", "en")
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "url string, text string, lang string")
    curated, report = curate_mod.curate_corpus(
        df,
        min_quality=0.0,
        min_chars=1,
        url_blocked_domains=["spam.example"],
    )
    assert report.rows_in == 20
    assert report.rows_url_pass == 12
    assert calls.value == 12, f"normalize ran {calls.value}x for 12 survivors"
    assert curated.filter(F.col("url").contains("spam.example")).count() == 0
    # the gate's verdict columns never leak into the curated schema
    assert "domain_blocked" not in curated.columns
    assert "keep" not in curated.columns


def test_url_gate_soft_words_and_report_line(spark):
    """Soft-word scoring reaches the gate through curate's kwargs, and a
    disabled gate leaves rows_url_pass None."""
    rows = [
        ("https://x.example/casino/bet/1", GOOD + " one", "en"),
        ("https://x.example/news/2", GOOD + " two", "en"),
    ]
    df = spark.createDataFrame(rows, "url string, text string, lang string")
    _, gated = curate_corpus(
        df,
        min_quality=0.0,
        min_chars=1,
        url_soft_words={"casino": 1.0, "bet": 1.5},
        url_soft_threshold=2.0,
    )
    assert gated.rows_in == 2 and gated.rows_url_pass == 1
    _, plain = curate_corpus(df, min_quality=0.0, min_chars=1)
    assert plain.rows_url_pass is None and plain.rows_in == 2


def test_dsir_stage_selects_target_like_survivors(spark):
    """The optional final DSIR stage keeps the dsir_keep survivors most
    like the target corpus: plant 4 target-like docs among 8 junk docs,
    ask for 4 — exactly the planted ones survive, the report says so,
    and log_weight rides the curated output."""
    target = spark.createDataFrame(
        [("t", "the merchant ships returned to the harbour at dusk " * 20)],
        "url string, text string",
    )
    phrase = "the merchant ships returned to the harbour at dusk "
    rows = [
        (f"https://keep.example/{i}", phrase * 6, "en") for i in range(4)
    ] + [
        (
            f"https://junk.example/{j}",
            f"zorp{j} quux{j} blargh{j} wibble{j} frob{j} " * 6,
            "en",
        )
        for j in range(8)
    ]
    df = spark.createDataFrame(rows, "url string, text string, lang string")
    curated, report = curate_corpus(
        df,
        min_quality=0.0,
        min_chars=1,
        near_dup_threshold=0.99,  # the 4 planted twins must survive dedup
        dsir_target=target,
        dsir_keep=4,
    )
    # exact dedup collapses the 4 identical planted docs to ONE (lowest
    # url) — so selection sees 1 target-like + 8 junk and must put the
    # target-like doc in its top-4
    kept = {r.url for r in curated.collect()}
    assert "https://keep.example/0" in kept
    assert report.rows_after_dsir == 4
    assert "log_weight" in curated.columns
