"""Remaining SURVEY §2 coverage: salted skew aggregation, annotation
flattening (U3), sentence splitting (X3), chunk-image enrichment (C4/J1)."""

from __future__ import annotations

import pandas as pd  # module-level: stringified pandas_udf type hints
# (from __future__ annotations) resolve against module globals

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.enrichment import enrich_chunks_with_images
from ..operators.salting import salted_agg
from .relational import query, r6, t, tfan


@query(
    "salted_supplier_revenue",
    """
    SELECT l_suppkey, count(*) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
    FROM lineitem GROUP BY l_suppkey
    """,
)
def salted_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase SALTED aggregation over a hot-key distribution (north rule
    'explicit salting for skewed hosts'): only 10 suppliers at any SF, so a
    naive groupBy lands 1/10th of the table on one reducer. Salt fans each
    key across 16 partials; the oracle is the plain GROUP BY — results must
    be identical, only the shuffle shape differs."""
    li = t(spark, sf_dir, "lineitem").withColumn(
        "_rev", F.col("l_extendedprice") * (1 - F.col("l_discount"))
    )
    out = salted_agg(
        li,
        key="l_suppkey",
        aggs={"n_items": ("count", "l_orderkey"), "revenue": ("sum", "_rev")},
        fine_col="l_orderkey",
        n_salt=16,
    )
    return out.select("l_suppkey", "n_items", r6(F.col("revenue")).alias("revenue"))


@query(
    "flatten_annotations",
    """
    SELECT label, array_to_string(list_sort(flatten(array_agg(annos))), ',') AS all_annotations
    FROM (
      SELECT label, ['vec-' || CAST(vec_id AS VARCHAR), 'lbl-' || CAST(label AS VARCHAR)] AS annos
      FROM embeddings WHERE vec_id < 50)
    GROUP BY label
    """,
)
def flatten_annotations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 annotation flattening (ref processor.py:416-420:
    all_annotations.extend(...)): flatten(collect_list(array)) per group,
    sorted for deterministic compare."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    annos = F.array(
        F.concat(F.lit("vec-"), F.col("vec_id").cast("string")),
        F.concat(F.lit("lbl-"), F.col("label").cast("string")),
    )
    return (
        emb.select("label", annos.alias("annos"))
        .groupBy("label")
        .agg(
            # joined to one string: the driver canonicalizer can't sort lists
            F.array_join(
                F.array_sort(F.flatten(F.collect_list("annos"))), ","
            ).alias("all_annotations")
        )
    )


@query(
    "sentence_split",
    """
    SELECT doc_id, sent_idx, sentence FROM (
      SELECT doc_id,
             unnest(regexp_split_to_array(text, '[。！？]+')) AS sentence,
             generate_subscripts(regexp_split_to_array(text, '[。！？]+'), 1) - 1 AS sent_idx
      FROM (SELECT doc_id, text || '。テスト文！続き？' AS text FROM documents WHERE doc_id < 50))
    WHERE trim(sentence) <> ''
    """,
)
def sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 Japanese sentence-boundary split (ref late_chunking.py:89-91,
    config.py:263-269): regexp split on [。！？]+, exploded with index,
    blank fragments dropped (F1). A JP suffix is appended so the split is
    exercised on every row."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    with_jp = docs.select(
        "doc_id", F.concat(F.col("text"), F.lit("。テスト文！続き？")).alias("text")
    )
    return (
        with_jp.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), "[。！？]+")).alias(
                "sent_idx", "sentence"
            ),
        )
        .filter(F.trim(F.col("sentence")) != "")
    )


@query(
    "data_uri_roundtrip",
    """
    SELECT doc_id,
           CAST(from_base64(regexp_extract(
             'data:text/plain;base64,' || to_base64(CAST(text AS BLOB)),
             ',(.*)$', 1)) AS VARCHAR) AS decoded
    FROM documents WHERE doc_id < 100
    """,
)
def data_uri_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 base64 data-URI decode (ref image_processor.py:165-171): build a
    data: URI from the text, then recover the payload via the extraction
    regex + unbase64 — byte roundtrip checked by the oracle."""
    from ..functions.text import data_uri_payload

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    # Spark's base64 MIME-chunks long output with \r\n (conf-dependent);
    # real data URIs are single-line, so strip the wrapping at build time
    b64 = F.regexp_replace(F.base64(F.encode("text", "utf-8")), r"[\r\n]", "")
    uri = F.concat(F.lit("data:text/plain;base64,"), b64)
    return docs.select(
        "doc_id", F.decode(data_uri_payload(uri), "utf-8").alias("decoded")
    )


@query(
    "doc_indicator_flags",
    """
    SELECT doc_id,
           regexp_matches(text || ' 縦書き sample', '(?i)(?:sushi|ramen|tempura|yakitori)') AS food_indicator,
           (   contains(lower(text || ' 縦書き sample'), 'vertical')
            OR contains(lower(text || ' 縦書き sample'), 'horizontal')
            OR contains(lower(text || ' 縦書き sample'), '縦書き')
            OR contains(lower(text || ' 縦書き sample'), '横書き')
            OR contains(lower(text || ' 縦書き sample'), 'right-to-left')) AS layout_cue
    FROM documents WHERE doc_id < 100
    """,
)
def doc_indicator_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 keyword indicators + X8 layout-orientation flags
    (ref image_processor.py:338-371), over text with a JP layout marker
    appended so the positive path is exercised on every row."""
    from ..functions.text import layout_cues

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    tagged = F.concat(F.col("text"), F.lit(" 縦書き sample"))
    return docs.select(
        "doc_id",
        tagged.rlike("(?i)(?:sushi|ramen|tempura|yakitori)").alias("food_indicator"),
        layout_cues(tagged).alias("layout_cue"),
    )


@query(
    "chunk_image_enrichment",
    """
    SELECT doc_id, 0 AS chunk_index,
           text || chr(10) || '[Image: ' || sha256(text) || '.png - figure 0]'
                || chr(10) || '  - annotation one'
                || chr(10) || '  - annotation two'
                || chr(10) || '[Image: ' || sha256(reverse(text)) || '.png - figure 1]'
             AS enriched_text
    FROM documents WHERE doc_id < 100
    """,
)
def chunk_image_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/J1 enrichment (ref processor.py:351-401): chunk refs posexploded,
    broadcast-joined to per-doc images on self_ref, enrichment suffix
    re-aggregated in ref order — [Image: hash.png - caption] + first 2
    annotations. Image 0 carries 3 annotations (only 2 survive, ref
    processor.py:364); image 1 none."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    chunks = docs.select(
        "doc_id",
        F.lit(0).alias("chunk_index"),
        "text",
        F.array(
            F.concat(F.lit("pic/"), F.col("doc_id").cast("string"), F.lit("/0")),
            F.concat(F.lit("pic/"), F.col("doc_id").cast("string"), F.lit("/1")),
        ).alias("refs"),
    )
    images = docs.select(
        F.explode(
            F.array(
                F.struct(
                    F.concat(
                        F.lit("pic/"), F.col("doc_id").cast("string"), F.lit("/0")
                    ).alias("self_ref"),
                    F.sha2(F.col("text"), 256).alias("hash"),
                    F.lit("figure 0").alias("caption"),
                    F.array(
                        F.lit("annotation one"),
                        F.lit("annotation two"),
                        F.lit("annotation three"),
                    ).alias("annotations"),
                ),
                F.struct(
                    F.concat(
                        F.lit("pic/"), F.col("doc_id").cast("string"), F.lit("/1")
                    ).alias("self_ref"),
                    F.sha2(F.reverse(F.col("text")), 256).alias("hash"),
                    F.lit("figure 1").alias("caption"),
                    F.array().cast("array<string>").alias("annotations"),
                ),
            )
        ).alias("img")
    ).select("img.*")
    enriched = enrich_chunks_with_images(chunks, images)
    return enriched.select("doc_id", "chunk_index", "enriched_text")


@query(
    "snapshot_time_travel",
    """
    WITH m AS (
      SELECT CAST(doc_id % 25 AS BIGINT) AS bucket,
             CAST(1 + doc_id % 7 AS BIGINT) AS snapshot,
             'r' || CAST(1 + doc_id % 7 AS VARCHAR) AS run_id
      FROM documents),
    cut AS (SELECT * FROM m WHERE snapshot <= 4),
    r AS (
      SELECT bucket, run_id, snapshot,
             row_number() OVER (PARTITION BY bucket ORDER BY snapshot DESC)
               AS rn
      FROM cut)
    SELECT bucket, run_id, snapshot FROM r WHERE rn = 1
    """,
)
def snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Iceberg-style snapshot-log selection behind read_snapshot(as_of)
    (pipeline/driver.live_partitions): per bucket, the manifest entry with
    the highest snapshot <= the as_of cut names the live (bucket, run_id)
    partition. A synthetic snapshot log is derived from the documents table
    (bucket = doc_id % 25, snapshot = 1 + doc_id % 7) and time-traveled to
    as_of = 4; the oracle replays the gaps-and-islands window in SQL."""
    from ..pipeline.driver import live_partitions

    docs = t(spark, sf_dir, "documents")
    snap = (1 + F.col("doc_id") % 7).cast("long")
    manifest = docs.select(
        (F.col("doc_id") % 25).cast("long").alias("bucket"),
        snap.alias("snapshot"),
        F.concat(F.lit("r"), snap.cast("string")).alias("run_id"),
    )
    return live_partitions(manifest, as_of=4)


@query("sitemap_robots_crawl_filter")
def sitemap_robots_crawl_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-selection layer (sources/sitemaps.py): per doc a sitemap
    urlset and a robots.txt are synthesized in-plan, parsed with the
    production mapInPandas/UDF paths, and the candidate url is checked
    against the RFC 9309 rules (doc_id % 3 picks the governing pattern).
    Rows-only; protocol semantics are pinned by tests/test_sitemaps.py."""
    from ..sources.sitemaps import parse_sitemaps, robots_check_udf

    docs = tfan(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    n_urls = (d % 4 + 1).cast("int")
    xml = F.concat(
        F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), n_urls),
                lambda i: F.concat(
                    F.lit("<url><loc>https://site"), s(d % 50),
                    F.lit(".example.com/p/"), s(d), F.lit("-"), s(i),
                    F.lit("</loc><priority>0."), s(i), F.lit("</priority></url>"),
                ),
            ),
            "",
        ),
        F.lit("</urlset>"),
    )
    sm = parse_sitemaps(
        docs.select(
            F.concat(F.lit("https://site"), s(d % 50), F.lit("/sitemap.xml"))
            .alias("url"),
            F.encode(xml, "utf-8").alias("payload"),
        ),
        url_col="url",
    )
    entries = sm.groupBy("sitemap_url").agg(
        F.count(F.when(F.col("status") == "ok", 1)).alias("n_entries"),
        F.max("priority").alias("max_priority"),
    )
    robots = F.concat(
        F.lit("User-agent: corpusbot\nDisallow: /private/\n"
              "Allow: /private/press/\nUser-agent: *\nDisallow: /p/"),
        s(d % 3), F.lit("$\nSitemap: https://site"), s(d % 50),
        F.lit("/sitemap.xml\n"),
    )
    path = F.concat(F.lit("/p/"), s(d % 3))
    checked = docs.select(
        "doc_id",
        F.concat(F.lit("https://site"), s(d % 50), F.lit("/sitemap.xml"))
        .alias("sitemap_url"),
        robots_check_udf("otherbot")(robots, path).alias("e"),
    )
    return checked.join(entries, "sitemap_url").select(
        "doc_id",
        F.col("e.allowed").alias("allowed"),
        F.col("e.n_sitemaps").alias("n_sitemaps"),
        "n_entries",
        F.round("max_priority", 6).alias("max_priority"),
    )


@query(
    "snapshot_delete_travel",
    """
    WITH b AS (
      SELECT CAST(doc_id AS BIGINT) AS bucket FROM documents WHERE doc_id < 25),
    m AS (
      SELECT bucket, 'r1' AS run_id, CAST(1 AS BIGINT) AS snapshot,
             CAST(100 + bucket AS BIGINT) AS n_rows
      FROM b
      UNION ALL
      SELECT bucket, 'del1', CAST(2 AS BIGINT), CAST(90 AS BIGINT)
      FROM b WHERE bucket % 3 = 0),
    sel AS (
      SELECT a.as_of, m.bucket, m.run_id, m.n_rows,
             row_number() OVER (PARTITION BY a.as_of, m.bucket
                                ORDER BY m.snapshot DESC) AS rn
      FROM (SELECT CAST(1 AS BIGINT) AS as_of
            UNION ALL SELECT CAST(2 AS BIGINT)) a
      JOIN m ON m.snapshot <= a.as_of)
    SELECT as_of, bucket, run_id, n_rows AS live_rows FROM sel WHERE rn = 1
    """,
)
def snapshot_delete_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE manifest algebra under the driver gate (the
    semantics behind pipeline/driver.delete_where, ref vector_db.py:422-437
    delete-by-id): snapshot 1 writes 25 buckets ('r1', 100+b rows each);
    snapshot 2 is a delete that rewrote every bucket % 3 == 0 down to 90
    surviving rows ('del1'). For BOTH as_of cuts the production
    ``live_partitions`` selection must serve the pre-delete rows at
    as_of=1 and the rewritten/unaffected mix at as_of=2 — the oracle
    replays the per-(as_of, bucket) latest-snapshot window in SQL."""
    from ..pipeline.driver import live_partitions

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 25)
    b = F.col("doc_id").cast("long")
    base = docs.select(
        b.alias("bucket"),
        F.lit("r1").alias("run_id"),
        F.lit(1).cast("long").alias("snapshot"),
        (b + 100).alias("n_rows"),
    )
    dels = docs.filter(b % 3 == 0).select(
        b.alias("bucket"),
        F.lit("del1").alias("run_id"),
        F.lit(2).cast("long").alias("snapshot"),
        F.lit(90).cast("long").alias("n_rows"),
    )
    manifest = base.unionByName(dels)
    outs = []
    for as_of in (1, 2):
        live = live_partitions(
            manifest.select("bucket", "run_id", "snapshot"), as_of=as_of
        )
        outs.append(
            live.join(manifest, ["bucket", "run_id", "snapshot"]).select(
                F.lit(as_of).cast("long").alias("as_of"),
                "bucket",
                "run_id",
                F.col("n_rows").alias("live_rows"),
            )
        )
    return outs[0].unionByName(outs[1])


@query(
    "url_host_normalize",
    r"""
    WITH u AS (
      SELECT doc_id,
             'HTTPS://WWW.Site' || CAST(doc_id % 97 AS VARCHAR) || '.Example.'
             || CASE doc_id % 3 WHEN 0 THEN 'COM:443'
                                WHEN 1 THEN 'co.JP:8080' ELSE 'org' END
             || '/Path/' || CAST(doc_id AS VARCHAR)
             || CASE WHEN doc_id % 2 = 0
                     THEN '?b=2&a=1&c=' || CAST(doc_id AS VARCHAR)
                     ELSE '' END
             || '#Frag' AS url
      FROM documents),
    p AS (
      SELECT doc_id,
             lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
               AS scheme,
             regexp_replace(
               regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
               '#.*$', '') AS rest
      FROM u),
    r AS (
      SELECT doc_id, scheme, rest,
             regexp_extract(rest, '^([^/?]+)', 1) AS hostport
      FROM p),
    s AS (
      SELECT doc_id, scheme,
             regexp_replace(
               lower(regexp_replace(hostport, ':[0-9]+$', '')), '\.$', '')
               AS host,
             regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
             regexp_extract(rest, '^[^/?]+(/[^?]*)?', 1) AS path,
             array_to_string(
               list_sort(string_split(
                 regexp_extract(rest, '\?(.*)$', 1), '&')), '&') AS sq
      FROM r),
    e AS (
      SELECT doc_id, scheme, host, port, path, sq,
             string_split(host, '.') AS parts
      FROM s)
    SELECT doc_id, host,
           CASE WHEN len(parts) >= 3
                     AND list_contains(
                       ['co','com','ne','net','or','org','ac','go','ed','gr'],
                       parts[-2])
                     AND length(parts[-1]) = 2
                THEN parts[-3] || '.' || parts[-2] || '.' || parts[-1]
                WHEN len(parts) >= 2
                THEN parts[-2] || '.' || parts[-1]
                ELSE host END AS etld1,
           scheme || '://' || host
           || CASE WHEN port <> '' AND NOT (
                     (scheme = 'http' AND port = '80')
                     OR (scheme = 'https' AND port = '443'))
                   THEN ':' || port ELSE '' END
           || CASE WHEN path = '' THEN '/' ELSE path END
           || CASE WHEN sq <> '' THEN '?' || sq ELSE '' END AS normalized
    FROM e
    """,
)
def url_host_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + host / eTLD+1 extraction (functions/urls.py
    — the north rule buckets pages by host(url), which presumes messy
    crawl URLs canonicalize to a stable key). Deterministic messy URLs
    (mixed-case scheme/host, default and explicit ports, unsorted query
    params, fragments, co.JP registry suffixes) are synthesized per doc;
    the oracle replays the whole normalization policy independently in
    DuckDB SQL."""
    from ..functions.urls import etld1_of, host_of, url_normalize

    docs = tfan(spark, sf_dir, "documents")
    d = F.col("doc_id")
    url = F.concat(
        F.lit("HTTPS://WWW.Site"),
        (d % 97).cast("string"),
        F.lit(".Example."),
        F.when(d % 3 == 0, F.lit("COM:443"))
        .when(d % 3 == 1, F.lit("co.JP:8080"))
        .otherwise(F.lit("org")),
        F.lit("/Path/"),
        d.cast("string"),
        F.when(
            d % 2 == 0, F.concat(F.lit("?b=2&a=1&c="), d.cast("string"))
        ).otherwise(F.lit("")),
        F.lit("#Frag"),
    )
    host = host_of(url)
    return docs.select(
        "doc_id",
        host.alias("host"),
        etld1_of(host).alias("etld1"),
        url_normalize(url).alias("normalized"),
    )


@query(
    "cdx_parse",
    r"""
    SELECT doc_id,
           'com,example,site' || CAST(doc_id % 50 AS VARCHAR) || ',www)/p/'
             || CAST(doc_id AS VARCHAR) AS urlkey,
           '2024-01-01 ' || lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0')
             || ':' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')
             || ':' || lpad(CAST((doc_id * 7) % 60 AS VARCHAR), 2, '0')
             AS ts_str,
           'https://www.site' || CAST(doc_id % 50 AS VARCHAR)
             || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
           'www.site' || CAST(doc_id % 50 AS VARCHAR) || '.example.com'
             AS host,
           'text/html' AS mime,
           CAST(200 AS INT) AS status,
           CAST(doc_id * 1000 AS BIGINT) AS warc_offset,
           CAST(100 + doc_id AS BIGINT) AS warc_length,
           'crawl/file' || CAST(doc_id % 7 AS VARCHAR) || '.warc.gz'
             AS warc_filename
    FROM documents
    """,
)
def cdx_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDXJ index parsing (sources/cdx.py — the lookup half of selective
    Common-Crawl ingest): standards-shaped CDXJ lines are synthesized per
    doc in-plan, parsed with the production ``parse_cdxj`` (split +
    from_json + try-casts + host extraction), and every typed field is
    checked against the oracle's ANALYTIC prediction of the same values —
    the oracle never re-parses, so a parsing defect cannot cancel out."""
    from ..sources.cdx import parse_cdxj

    docs = tfan(spark, sf_dir, "documents")
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    ts14 = F.concat(
        F.lit("20240101"),
        F.lpad(s(d % 24), 2, "0"),
        F.lpad(s(d % 60), 2, "0"),
        F.lpad(s((d * 7) % 60), 2, "0"),
    )
    url = F.concat(
        F.lit("https://www.site"), s(d % 50), F.lit(".example.com/p/"), s(d)
    )
    urlkey = F.concat(
        F.lit("com,example,site"), s(d % 50), F.lit(",www)/p/"), s(d)
    )
    block = F.concat(
        F.lit('{"url": "'), url,
        F.lit('", "mime": "text/html", "status": "200", "digest": "sha1:X", '
              '"length": "'), s(F.lit(100) + d),
        F.lit('", "offset": "'), s(d * 1000),
        F.lit('", "filename": "crawl/file'), s(d % 7), F.lit('.warc.gz"}'),
    )
    lines = docs.select(
        "doc_id",
        F.concat(urlkey, F.lit(" "), ts14, F.lit(" "), block).alias("value"),
    )
    parsed = parse_cdxj(lines, keep=("doc_id",))
    return parsed.select(
        "doc_id",
        "urlkey",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        "url",
        "host",
        "mime",
        "status",
        "warc_offset",
        "warc_length",
        "warc_filename",
    )


@query("feed_entries")
def feed_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed-discovery layer (sources/feeds.py): per doc an RSS 2.0 feed
    (even doc_ids, RFC 822 dates) or an Atom feed (odd doc_ids, RFC 3339
    dates) is synthesized in-plan and parsed with the production
    mapInPandas path; the timestamp column proves both date grammars
    normalize identically. Rows-only; format/protocol semantics are
    pinned by tests/test_feeds.py."""
    from ..sources.feeds import parse_feeds

    docs = tfan(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    day = (d % 27 + 1).cast("int")
    rss = F.concat(
        F.lit('<?xml version="1.0"?><rss version="2.0"><channel><title>F'),
        s(d), F.lit("</title><item><title>post "), s(d),
        F.lit("</title><link>https://h"), s(d % 7), F.lit(".example/p/"),
        s(d), F.lit("</link><pubDate>"),
        F.date_format(
            F.make_date(F.lit(2024), F.lit(3), day), "EEE, dd MMM yyyy"
        ),
        F.lit(" 12:00:00 GMT</pubDate></item></channel></rss>"),
    )
    atom = F.concat(
        F.lit('<feed xmlns="http://www.w3.org/2005/Atom"><title>F'), s(d),
        F.lit('</title><entry><title>post '), s(d),
        F.lit('</title><link rel="alternate" href="https://h'), s(d % 7),
        F.lit(".example/p/"), s(d), F.lit('"/><updated>'),
        F.date_format(F.make_date(F.lit(2024), F.lit(3), day), "yyyy-MM-dd"),
        F.lit("T12:00:00Z</updated></entry></feed>"),
    )
    xml = F.when(d % 2 == 0, rss).otherwise(atom)
    parsed = parse_feeds(
        docs.select(
            F.concat(F.lit("https://h"), s(d % 7), F.lit(".example/feed/"),
                     s(d)).alias("url"),
            F.encode(xml, "utf-8").alias("payload"),
        )
    )
    return parsed.select(
        "feed_url", "kind", "entry_url", "title",
        F.date_format("published_ts", "yyyy-MM-dd HH:mm:ss").alias("published"),
        "status",
    )


@query("warc_redirect_resolution")
def warc_redirect_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect-chain canonicalization end to end (sources/warc.py
    ``parse_redirects`` + operators/linkgraph.py ``resolve_redirects``):
    each doc becomes a REAL WARC response record — docs are grouped in
    fours, the first three 301/302-redirect to the next url in the
    group, the fourth serves 200 — parsed back through the redirect
    parser, and the edge list resolved by pointer doubling: every url
    must canonicalize to its group's terminal in log rounds. Rows-only
    (the doubling loop's fixpoint has no bounded ANSI twin; chain/cycle
    semantics are pinned by tests/test_linkgraph.py)."""
    import datetime as _dt

    from pyspark.sql import types as T

    from ..operators.linkgraph import resolve_redirects
    from ..sources.warc import build_warc_record, parse_redirects

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), True),
            T.StructField("status", T.IntegerType(), True),
            T.StructField("location", T.StringType(), True),
        ]
    )
    ts = _dt.datetime(2024, 3, 1, 12, 0, 0)

    @F.pandas_udf(schema)
    def roundtrip(doc_id: pd.Series) -> pd.DataFrame:
        rows = []
        for d in doc_id:
            d = int(d)
            url = f"https://r.example/u/{d}"
            if d % 4 < 3:
                rec = build_warc_record(
                    url, ts, b"", status=301 if d % 2 == 0 else 302,
                    location=f"https://r.example/u/{d + 1}",
                )
            else:
                rec = build_warc_record(url, ts, b"<html><p>landed</p></html>")
            parsed = next(parse_redirects(rec), None) or {}
            rows.append(
                dict(
                    url=parsed.get("url"),
                    status=parsed.get("status"),
                    location=parsed.get("location"),
                )
            )
        return pd.DataFrame(rows)

    docs = tfan(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    parsed = docs.select(
        "doc_id", roundtrip(F.col("doc_id")).alias("r")
    ).select(
        F.col("r.url").alias("url"),
        F.col("r.status").alias("status"),
        F.col("r.location").alias("location"),
    )
    edges = parsed.filter(F.col("location").isNotNull())
    resolved = resolve_redirects(edges)
    return resolved.select("url", "final_url", "resolved").orderBy("url")
