"""Training-data curation queries: dedup, similarity search, text analysis,
multimodal manifests — the large-scale-pipeline operators (task brief),
each driver-checkable."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedup import (
    char_ngrams,
    jaccard,
    minhash_lsh_candidates,
    simhash_near_dups,
)
from ..operators.similarity import topk_bruteforce, topk_lsh
from ..operators.textstats import bpe_ish_token_count, lang_id, quality_score
from ..multimodal.images import extract_image_features, image_manifest
from .relational import fan, query, r6, t, tfan


def _with_planted_near_dups(docs: DataFrame, n: int = 20) -> DataFrame:
    """Deterministically append near-duplicate copies of the first n docs
    (id + 1_000_000, text + one extra token) so dedup queries have a known
    positive set on any corpus."""
    dups = (
        docs.filter(F.col("doc_id") < n)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        )
    )
    return docs.select("doc_id", "text").unionByName(dups)


@query("dedup_minhash_lsh")
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs over documents + planted dups.
    Rows-only (hash-permutation specifics aren't SQL-expressible); recall
    on the planted pairs is pinned by tests/test_dedup.py."""
    # r8: fan AFTER the union (one exchange for both branches) so the
    # signature UDF parallelizes — the single-row-group fixture otherwise
    # computes every MinHash in two tasks (12.9 s -> 3.1 s for the
    # signature pass at sf1.0); downstream banded joins are unchanged.
    docs = fan(
        spark, _with_planted_near_dups(t(spark, sf_dir, "documents")),
        sf_dir, "documents", "doc_id", width=8,
    )
    return minhash_lsh_candidates(docs, threshold=0.5).select(
        "id_a", "id_b", r6(F.col("est_jaccard")).alias("est_jaccard")
    )


@query("dedup_simhash")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 3) over documents + planted dups."""
    docs = fan(
        spark, _with_planted_near_dups(t(spark, sf_dir, "documents")),
        sf_dir, "documents", "doc_id", width=8,
    )
    return simhash_near_dups(docs, max_hamming=3)


_NG3 = """
    SELECT doc_id, CASE WHEN length(text) >= 3
           THEN list_distinct(list_transform(range(1, length(text) - 1),
                i -> substr(text, CAST(i AS INT), 3))) ELSE [] END AS g
    FROM documents
"""


def _consecutive_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id_a, id_b, j): exact char-3-gram Jaccard of consecutive doc pairs —
    shared by the jaccard query and the cluster-collapse query."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", char_ngrams(F.col("text"), 3).alias("g")
    )
    a, b = docs.alias("a"), docs.alias("b")
    return a.join(b, F.col("a.doc_id") + 1 == F.col("b.doc_id")).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        jaccard(F.col("a.g"), F.col("b.g")).alias("j"),
    )


@query(
    "dedup_ngram_jaccard",
    f"""
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CASE WHEN len(list_distinct(list_concat(a.g, b.g))) > 0
                 THEN len(list_intersect(a.g, b.g)) * 1.0
                      / len(list_distinct(list_concat(a.g, b.g)))
                 ELSE 0.0 END, 6) AS jaccard3
    FROM ({_NG3}) a JOIN ({_NG3}) b ON a.doc_id + 1 = b.doc_id
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact char-3-gram Jaccard between consecutive doc pairs — pure column
    algebra (sequence/substr/array_intersect), oracle-checked against
    DuckDB's list functions."""
    return _consecutive_jaccard_pairs(spark, sf_dir).select(
        "id_a", "id_b", r6(F.col("j")).alias("jaccard3")
    )


_COS = """
    list_dot_product(list_transform({a}, x -> CAST(x AS DOUBLE)),
                     list_transform({b}, x -> CAST(x AS DOUBLE)))
    / NULLIF(sqrt(list_dot_product(list_transform({a}, x -> CAST(x AS DOUBLE)),
                                   list_transform({a}, x -> CAST(x AS DOUBLE))))
           * sqrt(list_dot_product(list_transform({b}, x -> CAST(x AS DOUBLE)),
                                   list_transform({b}, x -> CAST(x AS DOUBLE)))), 0)
"""


@query(
    "similarity_topk_batch",
    f"""
    SELECT query_id, vec_id, score, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             round(coalesce({_COS.format(a="c.embedding", b="q.embedding")}, 0.0), 6) AS score,
             CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(coalesce({_COS.format(a="c.embedding", b="q.embedding")}, 0.0), 6) DESC,
                        c.vec_id) AS INT) AS rank
      FROM (SELECT * FROM embeddings WHERE vec_id < 3) q
      CROSS JOIN (SELECT * FROM embeddings WHERE vec_id >= 3) c)
    WHERE rank <= 3
    """,
)
def similarity_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN baseline: brute-force cosine top-3 for a 3-query batch
    (J2/T1 generalized to query batches)."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = tfan(spark, sf_dir, "embeddings").filter(F.col("vec_id") >= 3)
    out = topk_bruteforce(queries, corpus, k=3)
    # round score BEFORE ranking so float ulps can't flip tie order vs duckdb
    return out.select("query_id", "vec_id", r6(F.col("score")).alias("score"), "rank")


_SEM_CORPUS = """
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings WHERE vec_id < 10
"""


@query(
    "semdedup_verdicts",
    f"""
    WITH corpus AS ({_SEM_CORPUS}),
    cents AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
             embedding AS cvec
      FROM (SELECT * FROM corpus ORDER BY vec_id LIMIT 8)
    ),
    assigned AS (
      SELECT vec_id, embedding, cid AS cluster_id FROM (
        SELECT c.vec_id, c.embedding, ce.cid,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY round(coalesce({_COS.format(a="c.embedding", b="ce.cvec")}, 0.0), 6) DESC,
                          ce.cid) AS rn
        FROM corpus c CROSS JOIN cents ce)
      WHERE rn = 1
    ),
    dropped AS (
      SELECT DISTINCT a.vec_id
      FROM assigned a JOIN assigned b
        ON a.cluster_id = b.cluster_id AND b.vec_id < a.vec_id
       AND round(coalesce({_COS.format(a="a.embedding", b="b.embedding")}, 0.0), 6) >= 0.95
    )
    SELECT a.vec_id, CAST(a.cluster_id AS INT) AS cluster_id,
           (d.vec_id IS NULL) AS kept
    FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id
    """,
)
def semdedup_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup embedding-level dedup (Abbas et al. 2023) over the
    embeddings table + planted exact twins of vec_id < 10 (id + 1e6):
    cluster on the 8 deterministic smallest-id centroids, then drop every
    member with a smaller-id same-cluster neighbor at 6-dp cosine >= 0.95.
    The reference's vector path stops at store-and-search
    (vector_db.py:208-229) — this is the training-pipeline extension.
    Declarative end to end: broadcast centroid join + partial-aggregable
    argmax + within-cluster EXISTS self-join (tests/test_semdedup.py pins
    the window-free plan)."""
    from ..operators.semdedup import first_k_centroids, semdedup

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    twins = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(twins)
    return semdedup(corpus, first_k_centroids(corpus, 8), tau=0.95)


@query(
    "ann_ivf_persist",
    f"""
    SELECT query_id, vec_id, score, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             round(coalesce({_COS.format(a="c.embedding", b="q.embedding")}, 0.0), 6) AS score,
             CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(coalesce({_COS.format(a="c.embedding", b="q.embedding")}, 0.0), 6) DESC,
                        c.vec_id) AS INT) AS rank
      FROM (SELECT * FROM embeddings WHERE vec_id < 3) q
      CROSS JOIN (SELECT * FROM embeddings WHERE vec_id >= 3) c)
    WHERE rank <= 3
    """,
)
def ann_ivf_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index PERSISTENCE under the driver gate (ref vector_db.py:208-229
    creates a durable collection; :350-400 searches it in a later call):
    build an IVF index over the corpus, write the centroid + cell-
    partitioned assignment artifact tables, then search the LOADED index —
    the corpus is never re-assigned (plan pinned by tests/test_ann_index).
    Probing all 8 cells makes the persisted search exhaustive, so the
    oracle is exact brute-force top-3; partial-probe equality with the
    in-memory operator is pinned by pytest."""
    import os
    import tempfile

    from ..operators.ann_index import save_ivf_index, topk_ivf_indexed

    emb = t(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 3)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_ann_ivf",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    save_ivf_index(corpus, path, n_cells=8)
    out = topk_ivf_indexed(spark, queries, path, k=3, n_probe=8)
    return out.select("query_id", "vec_id", r6(F.col("score")).alias("score"), "rank")


@query("similarity_topk_lsh")
def similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k (the 100-TB path). Rows-only; recall
    vs brute force is pinned in tests/test_similarity.py."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = tfan(spark, sf_dir, "embeddings").filter(F.col("vec_id") >= 3)
    return topk_lsh(queries, corpus, dim=64, k=3, n_planes=4).select(
        "query_id", "vec_id", r6(F.col("score")).alias("score"), "rank"
    )


@query("curate_corpus_report")
def curate_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full FIVE-stage curation pass (normalize -> heuristic + learned
    quality gates -> exact dedup -> near dedup -> ExactSubstr cut) over
    the synthetic pages corpus with planted duplicates; returns the
    survival funnel as one row. Rows-only (stage semantics pinned by
    tests/test_curate.py; the two round-6 stages by
    test_curation_with_model_and_substring_stages)."""
    from ..extraction.html import extract_pages
    from ..extraction.pages import generate_pages
    from ..pipeline.curate import curate_corpus

    pages = generate_pages(spark, 800, seed=42)
    extracted = extract_pages(pages).select(
        "url", F.col("extracted.text").alias("text"), "lang"
    )
    _, report = curate_corpus(
        extracted,
        min_quality=0.2,
        model_quality_min=0.05,
        model_sample_size=100,
        substring_min_len=60,
    )
    return spark.createDataFrame(
        [
            (
                report.rows_in,
                report.rows_quality_pass,
                report.rows_model_quality_pass,
                report.rows_after_exact_dedup,
                report.rows_after_near_dedup,
                report.rows_after_substring_cut,
                report.substring_chars_removed,
            )
        ],
        "rows_in long, quality_pass long, model_pass long, after_exact long,"
        " after_near long, after_cut long, cut_chars long",
    )


@query("similarity_topk_ivf")
def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: probe the 4 nearest of 16 cells per query (rows-only;
    exactness when n_probe=n_cells pinned by tests/test_similarity.py)."""
    from ..operators.similarity import topk_ivf

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = tfan(spark, sf_dir, "embeddings").filter(F.col("vec_id") >= 3)
    return topk_ivf(queries, corpus, dim=64, k=3, n_cells=16, n_probe=4).select(
        "query_id", "vec_id", r6(F.col("score")).alias("score"), "rank"
    )


@query(
    "doc_lang_quality",
    """
    SELECT doc_id,
           CASE WHEN len(regexp_extract_all(text, '[぀-ゟ゠-ヿ一-龯]')) * 1.0
                     / greatest(length(text), 1) > 0.2 THEN 'ja'
                ELSE (
                  CASE WHEN greatest(en_h, fr_h, es_h, de_h) = 0 THEN 'und'
                       WHEN en_h = greatest(en_h, fr_h, es_h, de_h) THEN 'en'
                       WHEN fr_h = greatest(en_h, fr_h, es_h, de_h) THEN 'fr'
                       WHEN es_h = greatest(en_h, fr_h, es_h, de_h) THEN 'es'
                       ELSE 'de' END) END AS lang_guess,
           bpe_tokens
    FROM (
      SELECT doc_id, text,
        len(regexp_extract_all(lower(text), '\\b(?:the|and|of|to|in|is|that|it|for|was)\\b')) AS en_h,
        len(regexp_extract_all(lower(text), '\\b(?:le|la|les|de|des|et|un|une|est|que)\\b'))  AS fr_h,
        len(regexp_extract_all(lower(text), '\\b(?:el|la|los|de|y|un|una|es|que|en)\\b'))     AS es_h,
        len(regexp_extract_all(lower(text), '\\b(?:der|die|das|und|ist|ein|eine|zu|den|von)\\b')) AS de_h,
        len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]')) AS bpe_tokens
      FROM documents)
    """,
)
def doc_lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic + BPE-ish token count (curation text analysis)."""
    # r8: fanned scan (tfan) — the regex battery is pure per-row CPU and
    # single-tasked on the one-row-group fixture (6.0 s -> ~0.9 s at sf1.0,
    # with the translate()-based bpe count landing another ~0.3 s).
    docs = tfan(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        lang_id(F.col("text")).alias("lang_guess"),
        bpe_ish_token_count(F.col("text")).alias("bpe_tokens"),
    )


@query(
    "doc_gopher_rules",
    r"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END
               AS words,
             length(regexp_replace(text, '\s+', '', 'g')) AS nonws,
             len(regexp_extract_all(text, '#')) AS hashes,
             len(regexp_extract_all(text, '\.\.\.')) AS ellipses,
             len(regexp_extract_all(text, '\n')) + 1 AS n_lines,
             len(regexp_extract_all(text, '(?m)^\s*[-*•]')) AS bullets,
             len(regexp_extract_all(text, '(?m)\.\.\.$')) AS ell_lines,
             len(regexp_extract_all(text, '(?:^|\s)[^\s]*[A-Za-z][^\s]*'))
               AS alpha_words,
             (CASE WHEN len(regexp_extract_all(lower(text), '\bthe\b')) > 0 THEN 1 ELSE 0 END
            + CASE WHEN len(regexp_extract_all(lower(text), '\bbe\b')) > 0 THEN 1 ELSE 0 END
            + CASE WHEN len(regexp_extract_all(lower(text), '\bto\b')) > 0 THEN 1 ELSE 0 END
            + CASE WHEN len(regexp_extract_all(lower(text), '\bof\b')) > 0 THEN 1 ELSE 0 END
            + CASE WHEN len(regexp_extract_all(lower(text), '\band\b')) > 0 THEN 1 ELSE 0 END
            + CASE WHEN len(regexp_extract_all(lower(text), '\bthat\b')) > 0 THEN 1 ELSE 0 END
            + CASE WHEN len(regexp_extract_all(lower(text), '\bhave\b')) > 0 THEN 1 ELSE 0 END
            + CASE WHEN len(regexp_extract_all(lower(text), '\bwith\b')) > 0 THEN 1 ELSE 0 END)
               AS stop_hits
      FROM documents),
    m AS (
      SELECT doc_id, words, stop_hits,
             nonws * 1.0 / greatest(words, 1) AS mwl,
             hashes * 1.0 / greatest(words, 1) AS hr,
             ellipses * 1.0 / greatest(words, 1) AS er,
             bullets * 1.0 / n_lines AS bf,
             ell_lines * 1.0 / n_lines AS elf,
             alpha_words * 1.0 / greatest(words, 1) AS awf
      FROM base)
    SELECT doc_id,
           CAST(words AS INT) AS words,
           round(mwl, 6) AS mean_word_len,
           round(bf, 6) AS bullet_frac,
           round(awf, 6) AS alpha_word_frac,
           CAST(stop_hits AS INT) AS stop_hits,
           (words >= 50 AND words <= 100000) AS rule_word_count,
           (mwl >= 3.0 AND mwl <= 10.0) AS rule_mean_word_len,
           (hr <= 0.1 AND er <= 0.1) AS rule_symbol_ratio,
           (bf <= 0.9) AS rule_bullets,
           (elf <= 0.3) AS rule_ellipsis_lines,
           (awf >= 0.8) AS rule_alpha_words,
           (stop_hits >= 2) AS rule_stopwords,
           (words >= 50 AND words <= 100000
            AND mwl >= 3.0 AND mwl <= 10.0
            AND hr <= 0.1 AND er <= 0.1
            AND bf <= 0.9 AND elf <= 0.3
            AND awf >= 0.8 AND stop_hits >= 2) AS passes
    FROM m
    """,
)
def doc_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher heuristic quality-rule set (operators/textstats.py
    ``gopher_rules`` — Rae et al. 2021 App. A1.1, the filter battery
    MassiveText/RefinedWeb/FineWeb standardized on): word-count bounds,
    mean word length, symbol ratios, bullet/ellipsis line fractions,
    alphabetic-word fraction, stop-word presence — measures, per-rule
    verdicts, and the overall keep flag, all as one map-only codegen'd
    regexp pass (no UDF). The oracle replays every rule in DuckDB (the
    word-boundary and multiline anchors mean the same thing in Java
    regex and RE2). Demoted from birth: the regexp-algebra shape is
    green via the in-window doc_lang_quality / doc_token_stats rows;
    per-rule boundary cases are pinned by tests/test_textstats.py."""
    from ..operators.textstats import gopher_rules

    docs = tfan(spark, sf_dir, "documents")
    g = gopher_rules(F.col("text"))
    return docs.select(
        "doc_id",
        *[
            g.getField(f).alias(f)
            for f in (
                "words",
                "mean_word_len",
                "bullet_frac",
                "alpha_word_frac",
                "stop_hits",
                "rule_word_count",
                "rule_mean_word_len",
                "rule_symbol_ratio",
                "rule_bullets",
                "rule_ellipsis_lines",
                "rule_alpha_words",
                "rule_stopwords",
                "passes",
            )
        ],
    )


# doc_quality_score retired as a registry query in round 7 (the composite
# formula is pinned by a hand-computed unit golden in
# tests/test_textstats.py, the quality-family oracle coverage now rides
# doc_lang_quality + doc_gopher_rules, and the quality_score function
# itself stays the curate_corpus heuristic gate).


@query(
    "doc_c4_clean",
    r"""
    WITH base AS (
      SELECT doc_id, text,
             regexp_split_to_array(text, '\n') AS lines
      FROM documents),
    k AS (
      SELECT doc_id, text, len(lines) AS n_in,
             list_filter(lines, l ->
                 regexp_matches(trim(l), '[.!?"。！？」]$')
                 AND len(regexp_split_to_array(trim(l), '\s+')) >= 5
                 AND NOT contains(lower(trim(l)), 'javascript')
                 AND NOT contains(lower(trim(l)), 'terms of use')
                 AND NOT contains(lower(trim(l)), 'privacy policy')
                 AND NOT contains(lower(trim(l)), 'cookie policy')
                 AND NOT contains(lower(trim(l)), 'uses cookies')
                 AND NOT contains(lower(trim(l)), 'use of cookies')
                 AND NOT contains(lower(trim(l)), 'use cookies'))
               AS kept_lines
      FROM base)
    SELECT doc_id,
           coalesce(array_to_string(list_transform(kept_lines, l -> trim(l)),
                                    chr(10)), '') AS cleaned,
           CAST(n_in AS INT) AS n_lines_in,
           CAST(len(kept_lines) AS INT) AS n_lines_kept,
           (len(kept_lines) >= 3
            AND NOT contains(lower(text), 'lorem ipsum')
            AND NOT contains(text, '{')) AS kept
    FROM k
    """,
)
def doc_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 cleaning recipe (operators/c4.py, Raffel et al. 2020 §2.2):
    per-line terminal-punctuation / min-words / javascript / policy-
    boilerplate rules, page-level lorem-ipsum / curly-brace / min-kept
    rules — all JVM-side array+regexp algebra, every rule mirrored 1:1
    into DuckDB list functions (the cleaned text itself is part of the
    hash compare). Demoted from birth: the split/filter/rejoin shape is
    green via the in-window sentence_split / doc_token_stats rows; the
    rule battery's boundary cases are pinned by tests/test_c4.py."""
    from ..operators.c4 import c4_signals

    docs = tfan(spark, sf_dir, "documents")
    s = c4_signals(F.col("text"))
    return docs.select(
        "doc_id",
        s.getField("text").alias("cleaned"),
        s.getField("n_lines_in").alias("n_lines_in"),
        s.getField("n_lines_kept").alias("n_lines_kept"),
        s.getField("kept").alias("kept"),
    )


@query(
    "image_manifest",
    """
    SELECT doc_id, count(*) AS n_images,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           array_to_string((array_agg(sha ORDER BY sha))[1:5], ',') AS image_hashes
    FROM (
      SELECT doc_id, sha256(text) AS sha, length(text) AS n_bytes FROM documents
      UNION ALL
      SELECT doc_id, sha256(reverse(text)), length(text) FROM documents)
    GROUP BY doc_id
    """,
)
def image_manifest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 image manifest over a synthesized 2-images-per-doc binary table
    (payloads derived from text so DuckDB can reproduce the hashes)."""
    docs = tfan(spark, sf_dir, "documents")
    images = docs.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("image_index"), F.encode("text", "utf-8").alias("payload")),
                F.struct(F.lit(1).alias("image_index"), F.encode(F.reverse("text"), "utf-8").alias("payload")),
            )
        ).alias("img"),
    ).select("doc_id", "img.image_index", "img.payload")
    meta = extract_image_features(images)
    # driver-facing projection: the canonicalizer can't sort list cells, so
    # the hash array is joined to one string (the operator keeps the array)
    return image_manifest(meta).withColumn(
        "image_hashes", F.concat_ws(",", "image_hashes")
    )


@query("doc_winnowing_overlap")
def doc_winnowing_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash winnowing fingerprints (MOSS-style) + containment
    overlap between consecutive docs. Rows-only; the winnowing guarantee
    and rolling-hash math are pinned by tests/test_fingerprint_media.py."""
    from ..operators.fingerprint import fingerprint_documents, fingerprint_overlap

    fps = fingerprint_documents(tfan(spark, sf_dir, "documents"))
    a, b = fps.alias("a"), fps.alias("b")
    return a.join(b, F.col("a.doc_id") + 1 == F.col("b.doc_id")).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        r6(
            fingerprint_overlap(F.col("a.fingerprint"), F.col("b.fingerprint"))
        ).alias("containment"),
    )


@query("media_features")
def media_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio/video multimodal plumbing: binary payload -> typed metadata +
    sampled frame/window features (stubbed codec, real batch shape)."""
    from ..multimodal.media import extract_media_features

    docs = tfan(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    media = docs.select(
        "doc_id",
        F.lit(0).alias("media_index"),
        F.encode("text", "utf-8").alias("payload"),
    )
    out = extract_media_features(media)
    return out.select(
        "doc_id", "kind", "duration_s", "sample_rate", "n_frames",
        F.size("samples").alias("n_samples"),
    )


@query("image_features")
def image_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode/feature plumbing (stubbed decode, real Spark
    batch shape). Rows-only."""
    docs = tfan(spark, sf_dir, "documents")
    images = docs.select(
        "doc_id",
        F.lit(0).alias("image_index"),
        F.encode("text", "utf-8").alias("payload"),
    )
    # digest the feature vector so every driver-facing column is hashable
    meta = extract_image_features(images)
    return meta.select(
        "doc_id", "image_index", "sha256", "n_bytes", "width", "height",
        "format", F.size("feature").alias("feature_dim"),
        F.xxhash64(F.to_json("feature")).alias("feature_digest"),
    )


@query(
    "dedup_clusters",
    f"""
    WITH p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CASE WHEN len(list_distinct(list_concat(a.g, b.g))) > 0
                  THEN len(list_intersect(a.g, b.g)) * 1.0
                       / len(list_distinct(list_concat(a.g, b.g)))
                  ELSE 0.0 END AS j
      FROM ({_NG3}) a JOIN ({_NG3}) b ON a.doc_id + 1 = b.doc_id),
    linked AS (SELECT id_a, id_b FROM p WHERE j >= 0.5),
    nodes AS (SELECT id_a AS node FROM linked
              UNION SELECT id_b FROM linked),
    marks AS (
      SELECT node,
             CASE WHEN node IN (SELECT id_b FROM linked) THEN 0 ELSE 1 END
               AS is_start
      FROM nodes),
    islands AS (
      SELECT node, sum(is_start) OVER (ORDER BY node) AS grp FROM marks)
    SELECT node, min(node) OVER (PARTITION BY grp) AS cluster_id FROM islands
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster collapse: consecutive-doc 3-gram-jaccard pairs at
    threshold 0.5 -> connected components by min-label propagation
    (operators/dedup.py connected_components). The pair graph here is
    chains of consecutive ids, so the oracle reproduces the components with
    a gaps-and-islands window query — the Spark side runs the REAL general
    CC operator and must converge to the same labels."""
    from ..operators.dedup import connected_components

    pairs = (
        _consecutive_jaccard_pairs(spark, sf_dir)
        .filter(F.col("j") >= 0.5)
        .select("id_a", "id_b")
    )
    return connected_components(pairs)


@query("media_frame_sample")
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling plumbing (task brief: frame-sample as a
    first-class multimodal op): synthesized binary media per doc -> one row
    per sampled frame with offset + per-frame hash. Rows-only (fake codec);
    batch shape pinned by tests/test_fingerprint_media.py."""
    from ..multimodal.media import sample_frames

    docs = fan(spark, t(spark, sf_dir, "documents").limit(200), sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.lit(0).alias("media_index"),
        F.encode("text", "utf-8").alias("payload"),
    )
    frames = sample_frames(media, n_frames=4)
    return frames.select(
        "doc_id",
        "media_index",
        "frame_index",
        "offset_s",
        "frame_sha256",
        F.xxhash64(F.to_json("feature")).alias("feature_digest"),
    )


@query("image_resize")
def image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-in/binary-out image resize plumbing (task brief: resize as a
    first-class multimodal op; stub pixels, real batch shape + size
    accounting). Rows-only."""
    from ..multimodal.media import resize_images

    docs = fan(spark, t(spark, sf_dir, "documents").limit(200), sf_dir, "documents")
    images = docs.select(
        "doc_id",
        F.lit(0).alias("image_index"),
        F.encode("text", "utf-8").alias("payload"),
    )
    resized = resize_images(images, width=64, height=64)
    return resized.select(
        "doc_id",
        "image_index",
        "width",
        "height",
        F.sha2("payload", 256).alias("payload_sha"),
        "n_bytes_in",
        "n_bytes_out",
    )


@query(
    "png_pixel_roundtrip",
    """
    SELECT doc_id,
           CAST(8 + doc_id % 16 AS INT) AS width,
           CAST(8 + doc_id % 8 AS INT)  AS height,
           round(
             list_aggregate(
               flatten(list_transform(range(0, CAST(8 + doc_id % 8 AS INT)),
                 y -> list_transform(range(0, CAST(8 + doc_id % 16 AS INT)),
                   x -> CAST((x * 7 + y * 13 + doc_id) % 256 AS DOUBLE)))),
               'avg') / 255.0, 6) AS mean_px
    FROM documents WHERE doc_id < 200
    """,
)
def png_pixel_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG pixel decode under the driver gate: a deterministic
    gradient image is synthesized per doc, encoded as a genuine PNG
    (multimodal/png_codec, filter type cycling doc_id%5 so all five
    scanline filters are exercised), decoded back pure-Python, and the
    reported width/height/pixel-mean come from the DECODED pixels. The
    oracle predicts all three analytically from the gradient formula —
    any codec defect (filter math, stride, CRC) breaks the hash match."""
    from ..multimodal.png_codec import pixels_to_png, png_to_pixels

    schema = T.StructType(
        [
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("mean_px", T.DoubleType(), False),
        ]
    )

    @F.pandas_udf(schema)
    def roundtrip(doc_id: pd.Series) -> pd.DataFrame:
        rows = []
        for d in doc_id:
            d = int(d)
            w, h = 8 + d % 16, 8 + d % 8
            x, y = np.arange(w), np.arange(h)
            px = ((x[None, :] * 7 + y[:, None] * 13 + d) % 256).astype(np.uint8)
            back = png_to_pixels(pixels_to_png(px, filter_type=d % 5))
            rows.append(
                dict(
                    width=int(back.shape[1]),
                    height=int(back.shape[0]),
                    mean_px=float(back.astype(np.float64).mean() / 255.0),
                )
            )
        return pd.DataFrame(rows)

    docs = tfan(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    e = roundtrip(F.col("doc_id"))
    return docs.select(
        "doc_id",
        e.getField("width").alias("width"),
        e.getField("height").alias("height"),
        F.round(e.getField("mean_px"), 6).alias("mean_px"),
    )


@query(
    "tiff_pixel_roundtrip",
    """
    SELECT doc_id,
           CAST(8 + doc_id % 16 AS INT) AS width,
           CAST(8 + doc_id % 8 AS INT)  AS height,
           round(
             list_aggregate(
               flatten(list_transform(range(0, CAST(8 + doc_id % 8 AS INT)),
                 y -> list_transform(range(0, CAST(8 + doc_id % 16 AS INT)),
                   x -> CAST((x * 7 + y * 13 + doc_id) % 256 AS DOUBLE)))),
               'avg') / 255.0, 6) AS mean_px
    FROM documents WHERE doc_id < 200
    """,
)
def tiff_pixel_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-TIFF decode under the gate (multimodal/tiff_codec —
    the scanned-book master format the reference's domain ships): the same
    deterministic gradient as the PNG row is written as a genuine TIFF,
    cycling byte order (doc_id%2), compression none/PackBits/LZW/Deflate
    (doc_id%4, sometimes with Predictor 2 — §13/§14 + the Deflate
    extension) and strip height (1 + doc_id%5 rows), decoded back
    pure-Python;
    width/height/pixel-mean come from the DECODED pixels and the oracle
    predicts all three analytically."""
    from ..multimodal.tiff_codec import pixels_to_tiff, tiff_to_pixels

    schema = T.StructType(
        [
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("mean_px", T.DoubleType(), False),
        ]
    )

    @F.pandas_udf(schema)
    def roundtrip(doc_id: pd.Series) -> pd.DataFrame:
        rows = []
        for d in doc_id:
            d = int(d)
            w, h = 8 + d % 16, 8 + d % 8
            x, y = np.arange(w), np.arange(h)
            px = ((x[None, :] * 7 + y[:, None] * 13 + d) % 256).astype(np.uint8)
            blob = pixels_to_tiff(
                px,
                byte_order="<" if d % 2 == 0 else ">",
                compression=(1, 32773, 5, 8)[d % 4],
                rows_per_strip=1 + d % 5,
                predictor=2 if d % 6 == 2 else 1,  # some rows get both
                # every 5th doc goes through the §15 tiled layout (same
                # pixels, so the analytic oracle is layout-invariant)
                tile_size=(8, 4) if d % 5 == 4 else None,
            )
            back = tiff_to_pixels(blob)
            rows.append(
                dict(
                    width=int(back.shape[1]),
                    height=int(back.shape[0]),
                    mean_px=float(back.astype(np.float64).mean() / 255.0),
                )
            )
        return pd.DataFrame(rows)

    docs = tfan(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    e = roundtrip(F.col("doc_id"))
    return docs.select(
        "doc_id",
        e.getField("width").alias("width"),
        e.getField("height").alias("height"),
        F.round(e.getField("mean_px"), 6).alias("mean_px"),
    )


@query(
    "webp_pixel_roundtrip",
    """
    SELECT doc_id,
           CAST(8 + doc_id % 16 AS INT) AS width,
           CAST(8 + doc_id % 8 AS INT)  AS height,
           round(
             list_aggregate(
               flatten(list_transform(range(0, CAST(8 + doc_id % 8 AS INT)),
                 y -> list_transform(range(0, CAST(8 + doc_id % 16 AS INT)),
                   x -> CAST((x * 7 + y * 13 + doc_id) % 256 AS DOUBLE)))),
               'avg') / 255.0, 6) AS mean_px
    FROM documents WHERE doc_id < 200
    """,
)
def webp_pixel_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WebP LOSSLESS (VP8L) roundtrip under the gate (multimodal/
    webp_codec — RIFF container, LSB-first bitstream, code-length-coded
    prefix trees): the same deterministic gradient as the PNG row is
    encoded with the full entropy coder (per-channel Huffman trees, the
    gradient guarantees >2 symbols so the SIMPLE form is never taken)
    and decoded back; width/height/pixel-mean come from the DECODED
    pixels and the oracle predicts them analytically. LZ77 / cache /
    transforms on the decode side are pinned by tests/test_webp_codec.py
    hand-assembled bitstreams."""
    from ..multimodal.webp_codec import pixels_to_webp, webp_to_pixels

    schema = T.StructType(
        [
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("mean_px", T.DoubleType(), False),
        ]
    )

    @F.pandas_udf(schema)
    def roundtrip(doc_id: pd.Series) -> pd.DataFrame:
        rows = []
        for d in doc_id:
            d = int(d)
            w, h = 8 + d % 16, 8 + d % 8
            x, y = np.arange(w), np.arange(h)
            g = ((x[None, :] * 7 + y[:, None] * 13 + d) % 256).astype(np.uint8)
            back = webp_to_pixels(pixels_to_webp(g))
            rows.append(
                dict(
                    width=int(back.shape[1]),
                    height=int(back.shape[0]),
                    mean_px=float(back.astype(np.float64).mean() / 255.0),
                )
            )
        return pd.DataFrame(rows)

    docs = tfan(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    e = roundtrip(F.col("doc_id"))
    return docs.select(
        "doc_id",
        e.getField("width").alias("width"),
        e.getField("height").alias("height"),
        F.round(e.getField("mean_px"), 6).alias("mean_px"),
    )


@query(
    "jpeg_pixel_roundtrip",
    """
    SELECT doc_id,
           CAST(8 + doc_id % 16 AS INT) AS width,
           CAST(8 + doc_id % 8 AS INT)  AS height,
           round(CAST((doc_id * 37 + 11) % 256 AS DOUBLE) / 255.0, 6)
             AS mean_uniform,
           TRUE AS grad_close
    FROM documents WHERE doc_id < 200
    """,
)
def jpeg_pixel_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode under the driver gate (pure-Python codec,
    multimodal/jpeg_codec; ref decodes arbitrary image data-URIs at
    image_processor.py:159-183). Two images per doc:

    - a UNIFORM gray image at quality 100: DC-only blocks with quant step
      1 round-trip byte-exactly, so the decoded mean must equal the
      analytic value to 6 decimals (hash-checked) — any defect in marker
      parse, Huffman tables, dequant, or IDCT breaks it;
    - a GRADIENT image at quality 90 exercising AC run-length coding and
      byte stuffing: decoded mean must sit within 2 gray levels of the
      analytic mean (lossy-bounded boolean, also hash-checked)."""
    from ..multimodal.jpeg_codec import jpeg_to_pixels, pixels_to_jpeg

    schema = T.StructType(
        [
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("mean_uniform", T.DoubleType(), False),
            T.StructField("grad_close", T.BooleanType(), False),
        ]
    )

    @F.pandas_udf(schema)
    def roundtrip(doc_id: pd.Series) -> pd.DataFrame:
        rows = []
        for d in doc_id:
            d = int(d)
            w, h = 8 + d % 16, 8 + d % 8
            v = (d * 37 + 11) % 256
            uni = np.full((h, w), v, np.uint8)
            back_u = jpeg_to_pixels(pixels_to_jpeg(uni, quality=100))
            x, y = np.arange(w), np.arange(h)
            grad = ((x[None, :] * 3 + y[:, None] * 5 + d) % 200).astype(np.uint8)
            back_g = jpeg_to_pixels(pixels_to_jpeg(grad, quality=90))
            rows.append(
                dict(
                    width=int(back_u.shape[1]),
                    height=int(back_u.shape[0]),
                    mean_uniform=float(back_u.astype(np.float64).mean() / 255.0),
                    grad_close=bool(
                        abs(
                            back_g.astype(np.float64).mean()
                            - grad.astype(np.float64).mean()
                        )
                        < 2.0
                    ),
                )
            )
        return pd.DataFrame(rows)

    docs = tfan(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    e = roundtrip(F.col("doc_id"))
    return docs.select(
        "doc_id",
        e.getField("width").alias("width"),
        e.getField("height").alias("height"),
        F.round(e.getField("mean_uniform"), 6).alias("mean_uniform"),
        e.getField("grad_close").alias("grad_close"),
    )


@query(
    "gif_pixel_roundtrip",
    """
    SELECT doc_id,
           CAST(6 + doc_id % 12 AS INT) AS width,
           CAST(6 + doc_id % 6 AS INT)  AS height,
           round(list_aggregate(
             flatten(list_transform(range(0, CAST(6 + doc_id % 6 AS BIGINT)),
               y -> list_transform(range(0, CAST(6 + doc_id % 12 AS BIGINT)),
                 x -> CAST((((x * 3 + y * 7 + doc_id) % (4 + doc_id % 13))
                            * 37 + 5) % 256 AS DOUBLE)))),
             'avg') / 255.0, 6) AS mean_px
    FROM documents WHERE doc_id < 200
    """,
)
def gif_pixel_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode (pure-Python LZW codec, multimodal/gif_codec): a
    deterministic palette-index gradient is encoded as a genuine GIF89a
    per doc (palette size 4..16 so LZW width growth is exercised), decoded
    back, and width/height/pixel-mean come from the DECODED RGB. GIF is
    lossless, so the oracle predicts the mean analytically — any LZW or
    palette defect breaks the hash match. Demoted slot: locally
    oracle-verified; window surrogates are the PNG/JPEG roundtrips."""
    from ..multimodal.gif_codec import gif_to_pixels, pixels_to_gif

    schema = T.StructType(
        [
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("mean_px", T.DoubleType(), False),
        ]
    )

    @F.pandas_udf(schema)
    def roundtrip(doc_id: pd.Series) -> pd.DataFrame:
        rows = []
        for d in doc_id:
            d = int(d)
            w, h, ncol = 6 + d % 12, 6 + d % 6, 4 + d % 13
            x, y = np.arange(w), np.arange(h)
            idx = ((x[None, :] * 3 + y[:, None] * 7 + d) % ncol).astype(np.uint8)
            pal = np.repeat(
                ((np.arange(ncol) * 37 + 5) % 256)[:, None], 3, axis=1
            ).astype(np.uint8)
            back = gif_to_pixels(pixels_to_gif(idx, pal))
            rows.append(
                dict(
                    width=int(back.shape[1]),
                    height=int(back.shape[0]),
                    mean_px=float(back.astype(np.float64).mean() / 255.0),
                )
            )
        return pd.DataFrame(rows)

    docs = tfan(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    e = roundtrip(F.col("doc_id"))
    return docs.select(
        "doc_id",
        e.getField("width").alias("width"),
        e.getField("height").alias("height"),
        F.round(e.getField("mean_px"), 6).alias("mean_px"),
    )


@query(
    "wav_audio_roundtrip",
    """
    SELECT doc_id,
           round(CAST(800 + (doc_id % 5) * 160 AS DOUBLE) / 8000.0, 6)
             AS duration_s,
           CAST(8000 AS INT) AS sample_rate,
           round(sqrt(list_aggregate(list_transform(
                   range(0, CAST(800 + (doc_id % 5) * 160 AS BIGINT)),
                   i -> pow((CAST((doc_id * 31 + i * 7) % 2001 AS DOUBLE)
                             - 1000.0) / 32768.0, 2)),
                 'avg')), 6) AS rms
    FROM documents WHERE doc_id < 200
    """,
)
def wav_audio_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode under the driver gate (pure-Python RIFF/WAVE
    codec, multimodal/wav_codec): a deterministic int16 PCM signal is
    synthesized per doc, encoded as genuine WAV bytes, decoded back, and
    duration/rate/RMS computed from the DECODED samples. PCM is lossless,
    so the oracle predicts RMS analytically from the sample formula — any
    codec defect (chunk walk, sign handling, channel stride) breaks the
    hash match."""
    from ..multimodal.wav_codec import audio_features, samples_to_wav, wav_to_samples

    schema = T.StructType(
        [
            T.StructField("duration_s", T.DoubleType(), False),
            T.StructField("sample_rate", T.IntegerType(), False),
            T.StructField("rms", T.DoubleType(), False),
        ]
    )

    @F.pandas_udf(schema)
    def roundtrip(doc_id: pd.Series) -> pd.DataFrame:
        rows = []
        for d in doc_id:
            d = int(d)
            n = 800 + (d % 5) * 160
            i = np.arange(n, dtype=np.int64)
            sig = (((d * 31 + i * 7) % 2001) - 1000).astype(np.int16)
            back, rate = wav_to_samples(samples_to_wav(sig, 8000))
            feats = audio_features(back, rate)
            rows.append(
                dict(
                    duration_s=feats["duration_s"],
                    sample_rate=int(rate),
                    rms=feats["rms"],
                )
            )
        return pd.DataFrame(rows)

    docs = tfan(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    e = roundtrip(F.col("doc_id"))
    return docs.select(
        "doc_id",
        F.round(e.getField("duration_s"), 6).alias("duration_s"),
        e.getField("sample_rate").alias("sample_rate"),
        F.round(e.getField("rms"), 6).alias("rms"),
    )


@query(
    "dedup_substring_stats",
    """
    WITH aug AS (
      SELECT doc_id,
             text || '#' || CAST(doc_id AS VARCHAR) || '#'
                  || '<<shared-exact-substring-banner-for-window-dedup-test>>'
                  || '@' || CAST(doc_id AS VARCHAR) AS text
      FROM documents),
    g AS (
      SELECT doc_id, text,
             unnest(range(1, greatest(length(text) - 40 + 2, 1))) AS pos
      FROM aug),
    h AS (
      SELECT doc_id, pos, substr(text, CAST(pos AS INT), 40) AS gram FROM g),
    r AS (
      SELECT doc_id, pos,
             row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
      FROM h),
    d AS (
      SELECT doc_id, pos - 1 AS s, pos - 1 + 40 AS e FROM r WHERE rn > 1),
    w AS (
      SELECT doc_id, s, e,
             max(e) OVER (PARTITION BY doc_id ORDER BY s
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS maxprev
      FROM d),
    i AS (
      SELECT doc_id, s, e,
             CASE WHEN maxprev IS NULL OR s > maxprev THEN 1 ELSE 0 END AS ni
      FROM w),
    isl AS (
      SELECT doc_id, s, e,
             sum(ni) OVER (PARTITION BY doc_id ORDER BY s
                           ROWS UNBOUNDED PRECEDING) AS island
      FROM i),
    spans AS (
      SELECT doc_id, island, min(s) AS ss, max(e) AS se
      FROM isl GROUP BY doc_id, island),
    agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
             CAST(sum(se - ss) AS BIGINT) AS removed_chars
      FROM spans GROUP BY doc_id)
    SELECT a.doc_id,
           coalesce(g2.n_spans, 0) AS n_spans,
           coalesce(g2.removed_chars, 0) AS removed_chars,
           CAST(length(a.text) AS BIGINT) - coalesce(g2.removed_chars, 0)
             AS kept_chars
    FROM aug a LEFT JOIN agg g2 ON a.doc_id = g2.doc_id
    """,
)
def dedup_substring_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup under the driver gate (Lee et al. 2021 window
    rule, operators/dedup.duplicate_substring_spans): a shared 40+ char
    banner is planted in every document between doc-unique sentinels, so
    every doc except the first corpus occurrence must report exactly the
    banner's merged island (plus any organic 40-char duplicates, which
    both sides count identically). The oracle replays the whole
    pipeline — window extraction, global first-occurrence ranking,
    per-doc gaps-and-islands merge — in SQL."""
    from ..operators.dedup import duplicate_substring_spans

    L = 40
    docs = tfan(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("#"), F.col("doc_id").cast("string"), F.lit("#"),
            F.lit("<<shared-exact-substring-banner-for-window-dedup-test>>"),
            F.lit("@"), F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    spans = duplicate_substring_spans(docs, min_len=L)
    agg = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start")).alias("removed_chars"),
    )
    return (
        docs.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("removed_chars", F.lit(0)).alias("removed_chars"),
            (
                F.length("text").cast("long")
                - F.coalesce("removed_chars", F.lit(0))
            ).alias("kept_chars"),
        )
    )


@query("similarity_topk_pq")
def similarity_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN (operators/quantize.py PQ section): train
    subspace codebooks on a bounded sample, encode the corpus to m
    one-byte codes, search by asymmetric distance (per-query LUT + m
    lookups — the corpus scan never touches a float vector). Rows-only;
    exactness in the codebook-covers-corpus case and recall behavior are
    pinned by tests/test_pq.py."""
    import numpy as np

    from ..operators.quantize import (
        pq_encode_udf,
        topk_pq_adc,
        train_pq_codebooks,
    )

    emb = t(spark, sf_dir, "embeddings")
    sample = np.array(
        [r.embedding for r in emb.orderBy("vec_id").limit(256).collect()],
        dtype=np.float64,
    )
    books = train_pq_codebooks(sample, m=8, k=16, n_iters=3)
    corpus = tfan(spark, sf_dir, "embeddings").filter(F.col("vec_id") >= 3)
    codes = corpus.select(
        "vec_id", pq_encode_udf(books)(F.col("embedding")).alias("codes")
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return topk_pq_adc(queries, codes, books, k=3).select(
        "query_id", "vec_id", r6(F.col("adc_dist")).alias("adc_dist"), "rank"
    )


@query("doc_quality_model_score")
def doc_quality_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned quality filter (operators/quality_clf.py, the fastText-
    style role of CCNet/RedPajama): a logistic model over hashed
    unigram+bigram features is trained self-supervised (corpus docs vs
    their word-scrambled twins, bounded sample) and every document is
    scored in one Arrow stage. Rows-only — iterative training has no
    ANSI twin; separability and determinism pinned by
    tests/test_quality_clf.py."""
    from ..operators.quality_clf import quality_score_udf, self_supervised_model

    docs = tfan(spark, sf_dir, "documents")
    w, b = self_supervised_model(docs, sample_size=100, dim=1 << 14)
    return docs.select(
        "doc_id",
        F.round(
            quality_score_udf(w, b, 1 << 14)(F.col("text")), 6
        ).alias("quality_p"),
    )


@query("doc_bpe_tokens")
def doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real BPE tokenization over the corpus (operators/bpe.py): merges
    trained on the documents table itself (one word-count shuffle +
    bounded top-N collect + driver-side Sennrich loop), then every doc
    encoded in one Arrow stage. Rows-only — the iterative merge loop has
    no ANSI-SQL twin; the algorithm is pinned by tests/test_bpe.py
    against the published worked example."""
    from ..operators.bpe import encode_corpus, train_bpe

    docs = tfan(spark, sf_dir, "documents")
    merges = train_bpe(docs, n_merges=60, max_words=20_000)
    out = encode_corpus(docs, merges)
    return out.select(
        "doc_id",
        "n_tokens",
        F.array_join(F.slice("tokens", 1, 8), " ").alias("token_preview"),
    )


@query("doc_gopher_repetition")
def doc_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher repetition battery (textstats.gopher_repetition_rules):
    duplicate line/paragraph fractions (count- and character-weighted),
    top-{2,3,4}-gram char fractions, duplicated-{5..10}-gram char
    fractions, and the combined verdict — one Counter pass per document
    in a single Arrow stage. Rows-only (the overlapping-n-gram char
    marking has no tractable ANSI twin); the measures are pinned
    hand-computed by tests/test_textstats.py, and the simpler line/
    top-word pair stays oracle-checked via doc_repetition_stats."""
    from ..operators.textstats import gopher_repetition_rules

    docs = tfan(spark, sf_dir, "documents")
    g = gopher_repetition_rules(F.col("text"))
    return docs.select(
        "doc_id",
        g.getField("dup_line_frac").alias("dup_line_frac"),
        g.getField("dup_para_char_frac").alias("dup_para_char_frac"),
        g.getField("top_2gram_char_frac").alias("top_2gram_char_frac"),
        g.getField("top_3gram_char_frac").alias("top_3gram_char_frac"),
        g.getField("dup_5gram_char_frac").alias("dup_5gram_char_frac"),
        g.getField("dup_10gram_char_frac").alias("dup_10gram_char_frac"),
        g.getField("rep_passes").alias("rep_passes"),
    )


@query("doc_unigram_tokens")
def doc_unigram_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece) tokenization over the corpus
    (operators/unigram.py, Kudo 2018): vocabulary learned on the
    documents table itself (one word-count shuffle + bounded collect +
    driver-side EM/prune loop), then every doc Viterbi-encoded in one
    Arrow stage — the CJK-correct counterpart to doc_bpe_tokens.
    Rows-only: the EM loop has no ANSI-SQL twin; the lattice math is
    pinned by tests/test_unigram.py against a hand-computed
    forward-backward example."""
    from ..operators.unigram import encode_corpus_unigram, train_unigram

    docs = tfan(spark, sf_dir, "documents")
    model = train_unigram(docs, vocab_size=400, max_words=20_000, em_iters=2)
    out = encode_corpus_unigram(docs, model)
    return out.select(
        "doc_id",
        "n_tokens",
        F.array_join(F.slice("tokens", 1, 8), " ").alias("token_preview"),
    )


@query(
    "avi_video_roundtrip",
    """
    SELECT doc_id,
           CAST(2 + doc_id % 4 AS INT) AS n_frames,
           round(CAST(2 + doc_id % 4 AS DOUBLE) / 10.0, 6) AS duration_s,
           round((CAST((doc_id * 31) % 256 AS DOUBLE)
                  + (doc_id * 53) % 256
                  + (doc_id * 11) % 256) / 3.0 / 255.0, 6) AS first_frame_mean
    FROM documents WHERE doc_id < 200
    """,
)
def avi_video_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode under the gate (pure-Python uncompressed-AVI
    codec, multimodal/avi_codec): deterministic uniform-color frames are
    synthesized per doc, containerized as genuine AVI bytes (RIFF lists,
    DIB bottom-up BGR strips with stride padding), decoded back, and
    frame count / duration / first-frame pixel mean computed from the
    DECODED frames; the oracle predicts all three analytically. Frame
    sampling on real pixels is pinned by tests/test_avi_codec.py."""
    from ..multimodal.avi_codec import avi_to_frames, frames_to_avi

    schema = T.StructType(
        [
            T.StructField("n_frames", T.IntegerType(), False),
            T.StructField("duration_s", T.DoubleType(), False),
            T.StructField("first_frame_mean", T.DoubleType(), False),
        ]
    )

    @F.pandas_udf(schema)
    def roundtrip(doc_id: pd.Series) -> pd.DataFrame:
        rows = []
        for d in doc_id:
            d = int(d)
            n, h, w = 2 + d % 4, 4 + d % 4, 4 + d % 5
            frames = np.zeros((n, h, w, 3), dtype=np.uint8)
            for i in range(n):
                frames[i, :, :, 0] = (d * 31 + i * 17) % 256
                frames[i, :, :, 1] = (d * 53 + i * 29) % 256
                frames[i, :, :, 2] = (d * 11 + i * 41) % 256
            back, fps = avi_to_frames(frames_to_avi(frames, fps=10))
            rows.append(
                dict(
                    n_frames=int(back.shape[0]),
                    duration_s=float(back.shape[0] / fps),
                    first_frame_mean=float(
                        back[0].astype(np.float64).mean() / 255.0
                    ),
                )
            )
        return pd.DataFrame(rows)

    docs = tfan(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    e = roundtrip(F.col("doc_id"))
    return docs.select(
        "doc_id",
        e.getField("n_frames").alias("n_frames"),
        F.round(e.getField("duration_s"), 6).alias("duration_s"),
        F.round(e.getField("first_frame_mean"), 6).alias("first_frame_mean"),
    )


@query(
    "dedup_paragraphs",
    r"""
    WITH aug AS (
      SELECT doc_id,
             text || chr(10) || chr(10) || 'shared cookie banner paragraph'
                  || chr(10) || chr(10) || 'unique tail '
                  || CAST(doc_id AS VARCHAR) AS text
      FROM documents),
    split AS (
      SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ps FROM aug),
    paras AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ps) + 1),
                    i -> {'idx': i, 'para': ps[i]})) AS u
      FROM split),
    flat AS (
      SELECT doc_id, u.idx AS idx, u.para AS para
      FROM paras WHERE trim(u.para) <> ''),
    ranked AS (
      SELECT doc_id, idx, para,
             row_number() OVER (PARTITION BY trim(para)
                                ORDER BY doc_id, idx) AS rn
      FROM flat),
    built AS (
      SELECT doc_id,
             string_agg(para, chr(10) || chr(10) ORDER BY idx) AS text
      FROM ranked WHERE rn = 1 GROUP BY doc_id)
    SELECT d.doc_id, coalesce(b.text, '') AS text
    FROM documents d LEFT JOIN built b USING (doc_id)
    """,
)
def dedup_paragraphs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-document paragraph dedup (operators/dedup.py
    ``dedup_paragraphs``): a shared boilerplate paragraph is planted into
    EVERY document plus a unique tail — the banner must survive only in
    the lowest doc_id and every reconstruction must keep original
    paragraph order. The oracle replays split / first-occurrence window /
    ordered reassembly independently in DuckDB."""
    from ..operators.dedup import dedup_paragraphs

    docs = tfan(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\n\nshared cookie banner paragraph\n\nunique tail "),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    return dedup_paragraphs(aug)


@query(
    "doc_lm_quality",
    r"""
    WITH tri_occ AS (
      SELECT doc_id,
             unnest(CASE WHEN length(text) >= 3
                    THEN list_transform(range(1, length(text) - 1),
                         i -> substr(text, CAST(i AS INT), 3))
                    ELSE CAST([] AS VARCHAR[]) END) AS gram
      FROM documents),
    tri AS (
      SELECT gram, COUNT(*) AS n3 FROM tri_occ WHERE doc_id < 50
      GROUP BY gram),
    bi AS (
      SELECT substr(gram, 1, 2) AS prefix, SUM(n3) AS n2 FROM tri
      GROUP BY substr(gram, 1, 2)),
    scored AS (
      SELECT o.doc_id,
             -avg(ln((coalesce(t.n3, 0) + 1) * 1.0
                     / (coalesce(b.n2, 0) + 256))) AS s
      FROM tri_occ o
      LEFT JOIN tri t USING (gram)
      LEFT JOIN bi b ON substr(o.gram, 1, 2) = b.prefix
      GROUP BY o.doc_id)
    SELECT d.doc_id, round(coalesce(s.s, 0.0), 6) AS lm_score
    FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
    """,
)
def doc_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style character-LM quality score (operators/lm_quality.py):
    an add-one-smoothed char-trigram model trained on the first 50
    documents scores every document by cross-entropy — mojibake and
    keyword spam rank high, trusted-like text low. The declarative twin
    runs here (the oracle replays train + score as relational algebra);
    the Arrow path used at scale is pinned equal by tests/test_textstats."""
    from ..operators.lm_quality import lm_quality_score, train_trigram_counts

    docs = tfan(spark, sf_dir, "documents")
    tri, bi = train_trigram_counts(docs.filter(F.col("doc_id") < 50))
    return lm_quality_score(docs, tri, bi).select(
        "doc_id", r6(F.col("lm_score")).alias("lm_score")
    )


@query(
    "doc_perplexity_buckets",
    r"""
    WITH tri_occ AS (
      SELECT doc_id,
             unnest(CASE WHEN length(text) >= 3
                    THEN list_transform(range(1, length(text) - 1),
                         i -> substr(text, CAST(i AS INT), 3))
                    ELSE CAST([] AS VARCHAR[]) END) AS gram
      FROM documents),
    tri AS (
      SELECT gram, COUNT(*) AS n3 FROM tri_occ WHERE doc_id < 50
      GROUP BY gram),
    bi AS (
      SELECT substr(gram, 1, 2) AS prefix, SUM(n3) AS n2 FROM tri
      GROUP BY substr(gram, 1, 2)),
    scored AS (
      SELECT o.doc_id,
             -avg(ln((coalesce(t.n3, 0) + 1) * 1.0
                     / (coalesce(b.n2, 0) + 256))) AS s
      FROM tri_occ o
      LEFT JOIN tri t USING (gram)
      LEFT JOIN bi b ON substr(o.gram, 1, 2) = b.prefix
      GROUP BY o.doc_id),
    sc AS (
      SELECT d.doc_id, round(coalesce(s.s, 0.0), 6) AS lm_score
      FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id),
    dist AS (
      SELECT lm_score AS v, count(*) AS n FROM sc GROUP BY lm_score),
    cum AS (
      SELECT v,
             sum(n) OVER (ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               * 1.0 / (SELECT sum(n) FROM dist) AS f
      FROM dist),
    thr AS (
      SELECT min(CASE WHEN f >= 1.0 / 3 THEN v END) AS t0,
             min(CASE WHEN f >= 2.0 / 3 THEN v END) AS t1
      FROM cum)
    SELECT sc.doc_id, sc.lm_score,
           CASE WHEN sc.lm_score <= thr.t0 THEN 'head'
                WHEN sc.lm_score <= thr.t1 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM sc, thr
    """,
)
def doc_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail corpus split (operators/lm_quality.py
    ``perplexity_buckets``): char-LM cross-entropy scores (trained on the
    first 50 documents, as doc_lm_quality) cut at exact empirical
    1/3 / 2/3 quantiles of the rounded score distribution — the window
    runs over the distinct-score AGGREGATE, never the corpus, and the
    two thresholds ride back as a broadcast row. The oracle replays
    score -> distribution -> CDF -> thresholds -> CASE in DuckDB.
    Demoted from birth: the quality-score algebra is green via the
    in-window doc_lang_quality row and the cumulative-window shape via
    events_sessionization; bucket semantics (boundary ties, custom
    boundaries, degenerate one-value distributions) are pinned by
    tests/test_textstats.py."""
    from ..operators.lm_quality import (
        lm_quality_score,
        perplexity_buckets,
        train_trigram_counts,
    )

    docs = tfan(spark, sf_dir, "documents")
    tri, bi = train_trigram_counts(docs.filter(F.col("doc_id") < 50))
    scored = lm_quality_score(docs, tri, bi)
    return perplexity_buckets(scored).select("doc_id", "lm_score", "bucket")


@query(
    "doc_url_filter",
    r"""
    WITH u AS (
      SELECT doc_id,
             'https://' ||
             CASE doc_id % 4
               WHEN 0 THEN 'ads.tracker.example'
               WHEN 1 THEN 'news.portal.example'
               WHEN 2 THEN 'sub.portal.example'
               ELSE 'clean' || CAST(doc_id % 7 AS VARCHAR) || '.example'
             END || '/' ||
             CASE doc_id % 6
               WHEN 0 THEN 'phishing-kit'
               WHEN 1 THEN 'bet-tips'
               WHEN 3 THEN 'casino/bet'
               ELSE 'article'
             END || '/' || CAST(doc_id AS VARCHAR) AS url
      FROM documents),
    v AS (
      SELECT doc_id, url,
             regexp_replace(
               regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
               '/.*$', '') AS host
      FROM u),
    w AS (
      SELECT doc_id, url, host,
             regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS etld1
      FROM v),
    s AS (
      SELECT doc_id, host, etld1,
             host IN ('news.portal.example')
               OR etld1 IN ('tracker.example', 'news.portal.example')
               AS domain_blocked,
             contains(lower(url), 'phishing') AS subword_blocked,
             round(CAST(
               CASE WHEN regexp_matches(lower(url),
                 '(^|[^a-z0-9])casino([^a-z0-9]|$)') THEN 1.0 ELSE 0.0 END
               + CASE WHEN regexp_matches(lower(url),
                 '(^|[^a-z0-9])bet([^a-z0-9]|$)') THEN 1.5 ELSE 0.0 END
               AS DOUBLE), 6) AS soft_score
      FROM w)
    SELECT doc_id, host, etld1, domain_blocked, subword_blocked,
           soft_score,
           NOT domain_blocked AND NOT subword_blocked
             AND soft_score < 2.0 AS keep
    FROM s
    """,
)
def doc_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level corpus gate (operators/urlfilter.py — the stage-0 filter
    of RefinedWeb/FineWeb-style pipelines: UT1 domain blocklist by host
    AND eTLD+1, hard blocked-subword rule, weighted soft-word score with
    delimited-token matching). URLs with planted blocked domains (one
    matched via its registrable domain, one via an exact host entry, a
    sibling subdomain that must NOT match), a blocked subword, and soft
    words at 1.5 and 2.5 total weight are synthesized per document; the
    oracle replays host/eTLD+1 extraction, both blocklist channels, the
    delimited-token regex (identical in Java regex and RE2 — no \b, no
    lookarounds), and the keep verdict in DuckDB. Demoted from birth:
    the host/eTLD+1 algebra is green via the in-window url_host_normalize
    row and the flag/CASE shape via doc_indicator_flags; broadcast plan
    shape and rule semantics are pinned by tests/test_urlfilter.py."""
    from ..operators.urlfilter import url_filter_verdicts

    docs = tfan(spark, sf_dir, "documents")
    d = F.col("doc_id")
    url = F.concat(
        F.lit("https://"),
        F.when(d % 4 == 0, F.lit("ads.tracker.example"))
        .when(d % 4 == 1, F.lit("news.portal.example"))
        .when(d % 4 == 2, F.lit("sub.portal.example"))
        .otherwise(
            F.concat(F.lit("clean"), (d % 7).cast("string"), F.lit(".example"))
        ),
        F.lit("/"),
        F.when(d % 6 == 0, F.lit("phishing-kit"))
        .when(d % 6 == 1, F.lit("bet-tips"))
        .when(d % 6 == 3, F.lit("casino/bet"))
        .otherwise(F.lit("article")),
        F.lit("/"),
        d.cast("string"),
    )
    pages = docs.select("doc_id", url.alias("url"))
    return url_filter_verdicts(
        pages,
        blocked_domains=["tracker.example", "news.portal.example"],
        blocked_subwords=["phishing"],
        soft_words={"casino": 1.0, "bet": 1.5},
        soft_threshold=2.0,
    ).select(
        "doc_id",
        "host",
        "etld1",
        "domain_blocked",
        "subword_blocked",
        "soft_score",
        "keep",
    )


@query("emb_bitext_mining")
def emb_bitext_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (operators/bitext.py — the CCMatrix /
    WikiMatrix ratio-margin recipe for harvesting translation pairs from
    two monolingual embedding spaces). Source side: the first 40
    embeddings; target side: planted "translations" of the first 20
    (additively perturbed copies, the registry's standard known-positive
    construction) plus 20 unrelated embeddings as junk. Mutual-best
    mining at k=4 must pair every planted twin with its source; the
    ratio-margin semantics are replayed exactly (kNN lists, avgNN
    denominators, rounded margins, window-free argmax, mutual rule) by
    the numpy reference in tests/test_bitext.py. Rows-only."""
    from ..operators.bitext import margin_knn_mine

    emb = t(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    src = emb.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("src_id"), as_double.alias("embedding")
    )
    twins = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000).alias("tgt_id"),
        F.transform("embedding", lambda x: x.cast("double") + 0.01).alias(
            "embedding"
        ),
    )
    junk = emb.filter(
        (F.col("vec_id") >= 50) & (F.col("vec_id") < 70)
    ).select(
        (F.col("vec_id") + 2000).alias("tgt_id"), as_double.alias("embedding")
    )
    tgt = twins.unionByName(junk)
    return margin_knn_mine(src, tgt, k=4, threshold=1.0).select(
        "src_id", "tgt_id", "score", "margin"
    )


@query("doc_url_seen_bloom")
def doc_url_seen_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter seen-set (operators/bloom.py — the Dolma-style
    crawl-frontier membership primitive): build the filter from the
    first 300 synthesized page URLs in one bit_or aggregation, probe
    every URL against it, and report the verdict. Inserted URLs must all
    read maybe_seen (the no-false-negative contract); fresh ones read
    false except for the configured false-positive rate. Rows-only: the
    md5 double-hashing bit pattern is replayed BIT-EXACTLY by the Python
    reference in tests/test_bloom.py, along with the merge algebra and
    the theoretical fp rate."""
    from ..operators.bloom import bloom_build, bloom_probe

    docs = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://site"),
        (F.col("doc_id") % 31).cast("string"),
        F.lit(".example/page/"),
        F.col("doc_id").cast("string"),
    )
    pages = docs.select("doc_id", url.alias("url"))
    seen = bloom_build(
        pages.filter(F.col("doc_id") < 300), m_bits=1 << 16, k_hashes=5
    )
    return bloom_probe(
        pages, seen, m_bits=1 << 16, k_hashes=5
    ).select("doc_id", "url", "maybe_seen")


@query("image_dhash_near_dups")
def image_dhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup detection (multimodal/phash.py): 100
    deterministic random images are synthesized as 50 TRANSCODE TWINS —
    docs 2k and 2k+1 carry the same pixels, one encoded as a real PNG
    and one as a real TIFF (this repo's own pure-Python codecs) — then
    dhash64 + the pigeonhole hamming banding join must pair exactly the
    twins at hamming 0 (unrelated random images sit ~32 bits apart).
    Rows-only: the hash bits, invariances, and the banding join recall
    are pinned by tests/test_phash.py."""
    from ..multimodal.phash import image_near_dups
    from ..multimodal.png_codec import pixels_to_png
    from ..multimodal.tiff_codec import pixels_to_tiff

    @F.pandas_udf(T.BinaryType())
    def make_image(doc_id: pd.Series) -> pd.Series:
        out = []
        for d in doc_id:
            d = int(d)
            px = np.random.RandomState(d // 2).randint(
                0, 256, (24, 27), dtype=np.uint8
            )
            out.append(
                pixels_to_png(px) if d % 2 == 0 else pixels_to_tiff(px)
            )
        return pd.Series(out)

    docs = tfan(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    images = docs.select("doc_id", make_image(F.col("doc_id")).alias("payload"))
    return image_near_dups(images, max_hamming=3).select(
        "id_a", "id_b", "hamming"
    )


@query("audio_afp_near_dups")
def audio_afp_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio fingerprint near-dup detection (multimodal/afp.py): 60 real
    PCM-16 WAV payloads synthesized as 30 VOLUME TWINS — docs 2k and
    2k+1 carry the same deterministic broadband clip at full and half
    amplitude (volume scaling is exactly sign-preserving on the band
    energies, so twins fingerprint hamming-0..4 after int16 rounding) —
    then afp64 + the banding join must pair the twins while unrelated
    clips stay >= 16 bits apart. Rows-only: invariances, separation,
    and the silence/stereo edge cases are pinned by tests/test_afp.py."""
    from ..multimodal.wav_codec import samples_to_wav

    @F.pandas_udf(T.BinaryType())
    def make_wav(doc_id: pd.Series) -> pd.Series:
        out = []
        for d in doc_id:
            d = int(d)
            seed, n = d // 2, 4000
            rng = np.random.RandomState(seed)
            m = n // 2 + 1
            k = np.arange(m)
            mag = (1.0 + k / 40.0) ** -1.5 * (
                1.0 + 0.8 * np.sin(2 * np.pi * k / 37.0 + seed)
            )
            spec = mag * np.exp(1j * rng.uniform(0, 2 * np.pi, m))
            spec[0] = 0
            x = np.fft.irfft(spec, n)
            t = np.arange(n) / n
            x = x * (1.0 + 0.6 * np.sin(2 * np.pi * (3 + seed % 3) * t))
            x = x / np.abs(x).max() * (0.5 if d % 2 == 0 else 0.25)
            samples = np.clip(
                np.round(x * 32767.0), -32768, 32767
            ).astype(np.int16)
            out.append(samples_to_wav(samples, 8000))
        return pd.Series(out)

    docs = tfan(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    audio = docs.select("doc_id", make_wav(F.col("doc_id")).alias("payload"))
    from ..multimodal.afp import audio_near_dups

    return audio_near_dups(audio, max_hamming=6).select(
        "id_a", "id_b", "hamming"
    )


@query("video_dhash_near_dups")
def video_dhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-level near-dup detection (multimodal/phash.py
    video_near_dups): 40 real uncompressed AVIs synthesized as 20
    brightness twins — docs 2k and 2k+1 carry the same deterministic
    10-frame clip, one shifted +12 in every channel (dhash cancels the
    shift per frame) — then per-frame dhash + the position-free banding
    join must pair exactly the twins with all 8 sampled frames
    matching. Rows-only: frame sampling, trim robustness, and the
    threshold semantics are pinned by tests/test_phash.py."""
    from ..multimodal.avi_codec import frames_to_avi
    from ..multimodal.phash import video_near_dups

    @F.pandas_udf(T.BinaryType())
    def make_avi(doc_id: pd.Series) -> pd.Series:
        out = []
        for d in doc_id:
            d = int(d)
            frames = np.random.RandomState(d // 2).randint(
                0, 244, (10, 16, 18, 3), dtype=np.uint8
            )
            if d % 2 == 1:
                frames = (frames.astype(np.int32) + 12).astype(np.uint8)
            out.append(frames_to_avi(frames))
        return pd.Series(out)

    docs = tfan(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    videos = docs.select("doc_id", make_avi(F.col("doc_id")).alias("payload"))
    return video_near_dups(
        videos, n_frames=8, max_hamming=3, min_matching_frames=4
    ).select("id_a", "id_b", "n_frame_matches")
