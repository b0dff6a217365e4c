"""Extraction queries (north-rule pipeline), driver-checkable.

``extract_roundtrip`` is the oracle-checkable correctness anchor: wrap each
document's text in a boilerplate-laden HTML template **inside the plan**
(JVM-side concat), run the boilerplate stripper, and require the extracted
text to equal the original — i.e. the oracle is simply ``SELECT doc_id,
text FROM documents``. A wrong keep/drop decision or any byte drift through
the Arrow boundary fails the hash compare.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..extraction.html import extract_pages, extract_udf
from ..extraction.pages import generate_pages
from .relational import query, r6, t, tfan

# boilerplate template around the payload — nav/ads/footer must be stripped
_PRE = (
    "<html><head><style>.x{color:red}</style><script>var q=1;</script></head>"
    "<body><nav><a href='/a'>one</a> <a href='/b'>two</a> <a href='/c'>three</a></nav>"
    "<header><div>site header chrome</div></header><article><p>"
)
_POST = (
    "</p></article><div class='ads'><a href='/ad1'>buy now buy now</a>"
    "<a href='/ad2'>click here click here</a></div>"
    "<footer><div>copyright <a href='/tos'>terms</a></div></footer></body></html>"
)


@query(
    "extract_roundtrip",
    "SELECT doc_id, text AS extracted FROM documents",
)
def extract_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate strip recovers the payload byte-for-byte (north rule).

    r8: fanned scan (tfan) — the Arrow extract UDF ran in one Python worker
    on the single-row-group fixture (2.7 s -> 0.6 s at sf1.0, 32 workers)."""
    docs = tfan(spark, sf_dir, "documents")
    html = F.encode(F.concat(F.lit(_PRE), F.col("text"), F.lit(_POST)), "utf-8")
    return docs.select(
        "doc_id", extract_udf(html).getField("text").alias("extracted")
    )


@query(
    "extract_metrics",
    """
    SELECT 'ok' AS status, count(*) AS n, CAST(1 AS INT) AS blocks_kept
    FROM documents
    """,
)
def extract_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16 extraction metrics: status histogram + kept-block count. On the
    template corpus every row extracts 'ok' with exactly 1 kept block."""
    docs = tfan(spark, sf_dir, "documents")
    html = F.encode(F.concat(F.lit(_PRE), F.col("text"), F.lit(_POST)), "utf-8")
    ext = docs.select(extract_udf(html).alias("e"))
    return (
        ext.groupBy(F.col("e.status").alias("status"))
        .agg(
            F.count("*").alias("n"),
            F.max("e.blocks_kept").alias("blocks_kept"),
        )
    )


@query("extract_pages_pipeline")
def extract_pages_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full north-rule pipeline over the synthetic pages corpus: generate
    (deterministic, distributed) -> extract -> per-status metrics.
    Rows-only check (pages is generated, not a fixture view), but the
    byte-identity of this pipeline is pinned by tests/test_extraction.py."""
    pages = generate_pages(spark, 2000, seed=42)
    extracted = extract_pages(pages)
    return (
        extracted.select(
            "url",
            "lang",
            F.col("extracted.status").alias("status"),
            F.col("extracted.blocks_kept").alias("blocks_kept"),
            F.col("extracted.blocks_dropped").alias("blocks_dropped"),
            (F.col("extracted.text") == F.col("text")).alias("byte_identical"),
        )
        .groupBy("lang", "status")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("byte_identical").cast("int")).alias("n_byte_identical"),
            F.sum("blocks_kept").alias("total_blocks_kept"),
            F.sum("blocks_dropped").alias("total_blocks_dropped"),
        )
    )


@query(
    "warc_roundtrip",
    """
    SELECT doc_id,
           'https://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
           lang,
           true AS body_match
    FROM documents
    """,
)
def warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-Crawl-style source connector under an oracle: each document
    becomes a REAL WARC record (HTTP response payload, ISO 28500 headers —
    sources/warc.py writer), parsed back through the connector; url, lang,
    and byte-identical body must survive. The end-to-end archive->pipeline
    path is pinned by tests/test_warc.py."""
    import datetime as _dt

    from pyspark.sql import types as T

    from ..sources.warc import build_warc_record, parse_warc

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("body_match", T.BooleanType(), True),
        ]
    )
    ts = _dt.datetime(2024, 3, 1, 12, 0, 0)

    @F.pandas_udf(schema)
    def roundtrip(doc_id: pd.Series, text: pd.Series, lang: pd.Series) -> pd.DataFrame:
        rows = []
        for d, t_, l_ in zip(doc_id, text, lang):
            url = f"https://corpus.example/doc/{int(d)}"
            rec = build_warc_record(
                url, ts, (t_ or "").encode("utf-8"), content_language=l_
            )
            parsed = next(parse_warc(rec), None)
            rows.append(
                dict(
                    url=parsed["url"] if parsed else None,
                    lang=parsed["lang"] if parsed else None,
                    body_match=bool(
                        parsed and parsed["html"] == (t_ or "").encode("utf-8")
                    ),
                )
            )
        return pd.DataFrame(rows)

    docs = tfan(spark, sf_dir, "documents")
    e = roundtrip(F.col("doc_id"), F.col("text"), F.col("lang"))
    return docs.select(
        "doc_id",
        e.getField("url").alias("url"),
        e.getField("lang").alias("lang"),
        e.getField("body_match").alias("body_match"),
    )


@query(
    "wet_roundtrip",
    """
    SELECT doc_id,
           'https://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
           true AS text_match
    FROM documents
    """,
)
def wet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common Crawl WET (extracted-text sidecar) connector under an
    oracle: each document becomes a REAL ``conversion`` record behind a
    ``warcinfo`` header (sources/warc.py WET writer), parsed back; url
    and byte-identical text must survive. Demoted from birth — the
    record-walk + mapInPandas shapes are green via warc_roundtrip /
    extract_roundtrip; WET specifics are pinned by tests/test_warc.py."""
    import datetime as _dt

    from pyspark.sql import types as T

    from ..sources.warc import build_wet, parse_wet

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), True),
            T.StructField("text_match", T.BooleanType(), True),
        ]
    )
    ts = _dt.datetime(2024, 3, 1, 12, 0, 0)

    @F.pandas_udf(schema)
    def roundtrip(doc_id: pd.Series, text: pd.Series) -> pd.DataFrame:
        rows = []
        for d, t_ in zip(doc_id, text):
            url = f"https://corpus.example/doc/{int(d)}"
            blob = build_wet([(url, ts, t_ or "")])
            parsed = next(parse_wet(blob), None)
            rows.append(
                dict(
                    url=parsed["url"] if parsed else None,
                    text_match=bool(parsed and parsed["text"] == (t_ or "")),
                )
            )
        return pd.DataFrame(rows)

    docs = tfan(spark, sf_dir, "documents")
    e = roundtrip(F.col("doc_id"), F.col("text"))
    return docs.select(
        "doc_id",
        e.getField("url").alias("url"),
        e.getField("text_match").alias("text_match"),
    )


@query(
    "wat_links",
    """
    SELECT doc_id, 'Doc ' || CAST(doc_id AS VARCHAR) AS title,
           CAST(0 AS INT) AS link_idx,
           'https://host' || CAST(doc_id % 7 AS VARCHAR) || '.example/p/'
             || CAST(doc_id AS VARCHAR) AS link_url,
           'ref ' || CAST(doc_id AS VARCHAR) AS anchor,
           'host' || CAST(doc_id % 7 AS VARCHAR) || '.example' AS dst_host
    FROM documents
    UNION ALL
    SELECT doc_id, 'Doc ' || CAST(doc_id AS VARCHAR),
           CAST(1 AS INT),
           'https://host' || CAST((doc_id * 3 + 2) % 7 AS VARCHAR)
             || '.example/q/' || CAST(doc_id AS VARCHAR),
           'next',
           'host' || CAST((doc_id * 3 + 2) % 7 AS VARCHAR) || '.example'
    FROM documents
    """,
)
def wat_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common Crawl WAT (metadata sidecar) connector under an oracle: each
    document becomes a REAL ``metadata`` record carrying the IIPC JSON
    envelope (sources/warc.py WAT writer) with a title and two
    deterministic outlinks, parsed back through ``parse_wat``, exploded in
    page order, and the per-link host extracted with the JVM-side
    ``functions.urls.host_of`` — the link-graph input path end to end.
    Demoted from birth: the record-walk + mapInPandas + JSON shapes are
    green via warc_roundtrip / events_json_props; WAT specifics
    (envelope navigation, warcinfo skip, malformed-JSON skip) and the
    host_link_edges/host_degrees aggregates are pinned by
    tests/test_warc.py + tests/test_linkgraph.py."""
    import datetime as _dt

    from pyspark.sql import types as T

    from ..functions.urls import host_of
    from ..sources.warc import build_wat_record, parse_wat

    schema = T.StructType(
        [
            T.StructField("title", T.StringType(), True),
            T.StructField(
                "links",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("url", T.StringType(), True),
                            T.StructField("text", T.StringType(), True),
                        ]
                    )
                ),
                True,
            ),
        ]
    )
    ts = _dt.datetime(2024, 3, 1, 12, 0, 0)

    @F.pandas_udf(schema)
    def roundtrip(doc_id: pd.Series) -> pd.DataFrame:
        rows = []
        for d in doc_id:
            d = int(d)
            url = f"https://corpus.example/doc/{d}"
            links = [
                (f"https://host{d % 7}.example/p/{d}", f"ref {d}"),
                (f"https://host{(d * 3 + 2) % 7}.example/q/{d}", "next"),
            ]
            rec = build_wat_record(url, ts, f"Doc {d}", links)
            parsed = next(parse_wat(rec), None)
            rows.append(
                dict(
                    title=parsed["title"] if parsed else None,
                    links=parsed["links"] if parsed else [],
                )
            )
        return pd.DataFrame(rows)

    docs = tfan(spark, sf_dir, "documents")
    parsed = docs.select(
        "doc_id", roundtrip(F.col("doc_id")).alias("w")
    ).select(
        "doc_id",
        F.col("w.title").alias("title"),
        F.posexplode_outer(F.col("w.links")).alias("link_idx", "link"),
    )
    return parsed.select(
        "doc_id",
        "title",
        F.col("link_idx").cast("int").alias("link_idx"),
        F.col("link.url").alias("link_url"),
        F.col("link.text").alias("anchor"),
        host_of(F.col("link.url")).alias("dst_host"),
    )


@query(
    "wat_host_pagerank",
    """
    WITH raw AS (
      SELECT 'host' || CAST(doc_id % 7 AS VARCHAR) || '.example' AS src,
             'host' || CAST((doc_id * 3 + 2) % 7 AS VARCHAR) || '.example' AS dst
      FROM documents
      UNION ALL
      SELECT 'host' || CAST(doc_id % 7 AS VARCHAR) || '.example',
             CASE WHEN doc_id % 13 = 0 THEN 'sink.example'
                  ELSE 'host' || CAST((doc_id * 5 + 1) % 7 AS VARCHAR)
                       || '.example' END
      FROM documents),
    edges AS (
      SELECT src, dst, count(*) AS n FROM raw GROUP BY src, dst),
    outw AS (
      SELECT src, CAST(sum(n) AS DOUBLE) AS o FROM edges GROUP BY src),
    nodes AS (
      SELECT src AS host FROM edges UNION SELECT dst FROM edges),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT host, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
    d1 AS (SELECT coalesce(sum(r.r), 0.0) AS dang
           FROM r0 r LEFT JOIN outw o ON r.host = o.src WHERE o.src IS NULL),
    c1 AS (SELECT e.dst AS host, sum(r.r * e.n / o.o) AS c
           FROM edges e JOIN outw o ON e.src = o.src
                        JOIN r0 r ON r.host = e.src
           GROUP BY e.dst),
    r1 AS (SELECT n.host,
                  (1.0 - 0.85) / (SELECT n FROM nn)
                  + 0.85 * (coalesce(c.c, 0.0)
                            + (SELECT dang FROM d1) / (SELECT n FROM nn)) AS r
           FROM nodes n LEFT JOIN c1 c ON n.host = c.host),
    d2 AS (SELECT coalesce(sum(r.r), 0.0) AS dang
           FROM r1 r LEFT JOIN outw o ON r.host = o.src WHERE o.src IS NULL),
    c2 AS (SELECT e.dst AS host, sum(r.r * e.n / o.o) AS c
           FROM edges e JOIN outw o ON e.src = o.src
                        JOIN r1 r ON r.host = e.src
           GROUP BY e.dst),
    r2 AS (SELECT n.host,
                  (1.0 - 0.85) / (SELECT n FROM nn)
                  + 0.85 * (coalesce(c.c, 0.0)
                            + (SELECT dang FROM d2) / (SELECT n FROM nn)) AS r
           FROM nodes n LEFT JOIN c2 c ON n.host = c.host),
    d3 AS (SELECT coalesce(sum(r.r), 0.0) AS dang
           FROM r2 r LEFT JOIN outw o ON r.host = o.src WHERE o.src IS NULL),
    c3 AS (SELECT e.dst AS host, sum(r.r * e.n / o.o) AS c
           FROM edges e JOIN outw o ON e.src = o.src
                        JOIN r2 r ON r.host = e.src
           GROUP BY e.dst),
    r3 AS (SELECT n.host,
                  (1.0 - 0.85) / (SELECT n FROM nn)
                  + 0.85 * (coalesce(c.c, 0.0)
                            + (SELECT dang FROM d3) / (SELECT n FROM nn)) AS r
           FROM nodes n LEFT JOIN c3 c ON n.host = c.host)
    SELECT host, round(r, 6) AS pr FROM r3
    """,
)
def wat_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted host-level PageRank (operators/linkgraph.py
    ``host_pagerank``) — the crawl-frontier / domain-prior rank Common
    Crawl publishes with its web graph — over a deterministic 8-host
    graph derived from the documents table (7 interlinked hosts plus a
    dangling sink that never links out, so the dangling-mass
    redistribution is actually exercised). Three synchronous power
    iterations from the uniform vector, damping 0.85; the oracle replays
    all three iterations as chained CTEs, including the per-iteration
    dangling aggregate. The SQL spells (1.0 - 0.85), not 0.15: the two
    constants differ in the last ulp and the hash compare would see it.
    Demoted from birth: the contribution join + grouped-sum shape is
    green via the in-window q3_shipping_priority / corpus_stats rows;
    convergence and dangling semantics are pinned by
    tests/test_linkgraph.py."""
    docs = tfan(spark, sf_dir, "documents")
    host = lambda expr: F.concat(  # noqa: E731
        F.lit("host"), expr.cast("string"), F.lit(".example")
    )
    e1 = docs.select(
        host(F.col("doc_id") % 7).alias("src_host"),
        host((F.col("doc_id") * 3 + 2) % 7).alias("dst_host"),
    )
    e2 = docs.select(
        host(F.col("doc_id") % 7).alias("src_host"),
        F.when(F.col("doc_id") % 13 == 0, F.lit("sink.example"))
        .otherwise(host((F.col("doc_id") * 5 + 1) % 7))
        .alias("dst_host"),
    )
    edges = (
        e1.union(e2)
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )
    from ..operators.linkgraph import host_pagerank

    return host_pagerank(edges, iterations=3, damping=0.85).select(
        "host", r6(F.col("rank")).alias("pr")
    )


@query("wat_host_hits")
def wat_host_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg HITS hubs/authorities (operators/linkgraph.py
    ``host_hits``) over the same deterministic 8-host graph as
    wat_host_pagerank — the two-sided crawl signal PageRank folds into
    one score (authorities = hosts worth fetching, hubs = hosts worth
    re-crawling for link discovery). Three weighted sweep pairs with L1
    normalization, lineage truncated every iteration (the operator's
    default — a lazy HITS plan is exponential in sweep count). Rows-only:
    the fixed-point arithmetic is pinned to 1e-12 against a numpy
    adjacency-matrix reference in tests/test_linkgraph.py, which is
    stricter than the 6-dp value hash an SQL twin could carry."""
    docs = tfan(spark, sf_dir, "documents")
    host = lambda expr: F.concat(  # noqa: E731
        F.lit("host"), expr.cast("string"), F.lit(".example")
    )
    e1 = docs.select(
        host(F.col("doc_id") % 7).alias("src_host"),
        host((F.col("doc_id") * 3 + 2) % 7).alias("dst_host"),
    )
    e2 = docs.select(
        host(F.col("doc_id") % 7).alias("src_host"),
        F.when(F.col("doc_id") % 13 == 0, F.lit("sink.example"))
        .otherwise(host((F.col("doc_id") * 5 + 1) % 7))
        .alias("dst_host"),
    )
    edges = (
        e1.union(e2)
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )
    from ..operators.linkgraph import host_hits

    return host_hits(edges, iterations=3).select(
        "host",
        r6(F.col("hub")).alias("hub"),
        r6(F.col("authority")).alias("authority"),
    )


@query(
    "charset_extract",
    """
    SELECT doc_id,
           CASE doc_id % 4 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'shift_jis'
                           WHEN 2 THEN 'euc_jp' ELSE 'iso2022_jp' END
             AS encoding,
           'ok' AS status,
           TRUE AS jp_text_extracted
    FROM documents WHERE doc_id < 400
    """,
)
def charset_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Legacy-encoding extraction end-to-end (extraction/charset.py — the
    Japanese web is heavily Shift_JIS/EUC-JP/ISO-2022-JP): a genuine JP
    page is encoded per doc in one of four charsets WITHOUT a declaration,
    pushed through the REAL extract_main_content (sniff -> decode ->
    boilerplate classify), and the reported encoding, status, and a
    content-survival check are hash-compared to the oracle's analytic
    prediction — a sniffing or decoding defect flips every third row."""
    from ..extraction.html import extract_main_content

    codecs = ["utf-8", "shift_jis", "euc_jp", "iso2022_jp"]
    page = (
        "<html><body><nav><a href='/'>ホーム</a><a href='/x'>リンク</a></nav>"
        "<p>吾輩は猫である。名前はまだ無い。どこで生れたかとんと見当がつかぬ。"
        "何でも薄暗いじめじめした所でニャーニャー泣いていた事だけは記憶している。"
        "吾輩はここで始めて人間というものを見た。{}</p></body></html>"
    )

    schema = T.StructType(
        [
            T.StructField("encoding", T.StringType(), True),
            T.StructField("status", T.StringType(), False),
            T.StructField("jp_text_extracted", T.BooleanType(), False),
        ]
    )

    @F.pandas_udf(schema)
    def roundtrip(doc_id: pd.Series) -> pd.DataFrame:
        rows = []
        for d in doc_id:
            d = int(d)
            codec = codecs[d % 4]
            html = page.format(f"文書番号{d}です。").encode(codec)
            out = extract_main_content(html)
            rows.append(
                dict(
                    encoding=out["encoding"],
                    status=out["status"],
                    jp_text_extracted="吾輩は猫である" in out["text"]
                    and f"文書番号{d}" in out["text"],
                )
            )
        return pd.DataFrame(rows)

    docs = tfan(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    e = roundtrip(F.col("doc_id"))
    return docs.select(
        "doc_id",
        e.getField("encoding").alias("encoding"),
        e.getField("status").alias("status"),
        e.getField("jp_text_extracted").alias("jp_text_extracted"),
    )
