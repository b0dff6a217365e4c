"""CDXJ index source — the lookup side of Common-Crawl-style ingest.

Common Crawl (and any pywb/OpenWayback archive) ships a CDXJ index next
to its WARC archives: one line per capture,

    <SURT urlkey> <14-digit timestamp> <JSON block>

where the JSON carries ``url, mime, status, digest, length, offset,
filename`` — the (filename, offset, length) triple is the byte range of
the record inside its WARC. At 100 TB you never scan archives blindly:
you filter the (tiny, splittable, text) CDX index first — by host, mime,
status, crawl date — and fetch only the matching byte ranges. This
module supplies that first half; ``sources/warc.py`` is the second.

Everything is declarative Spark (text scan -> split -> from_json ->
typed casts; whole-stage codegen, no UDFs), so predicate pushdown and
column pruning apply to index scans for free. ``surt_key`` (the
Sort-friendly URI Reordering Transform that makes same-host captures
sort adjacently) is pure column algebra over ``functions/urls``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.urls import host_of, port_of, scheme_of

CDXJ_JSON_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("length", T.StringType(), True),
        T.StructField("offset", T.StringType(), True),
        T.StructField("filename", T.StringType(), True),
    ]
)


def surt_key(url: Column) -> Column:
    """SURT urlkey: reversed comma-joined host [+ ``:port`` when the port
    is explicit and non-default] + ')' + lowercased path —
    ``https://Sub.Example.COM/A/b?x=1`` -> ``com,example,sub)/a/b?x=1``;
    ``http://example.com:8080/x`` -> ``com,example:8080)/x``.

    Follows the pywb convention (scheme and DEFAULT ports dropped, other
    ports keyed as ``host:port``, host reversed so one host's captures are
    a contiguous index range — the property that makes per-host index
    pruning a range scan, not a full pass). Documented divergence from
    Common Crawl's canonicalizer: the leading ``www`` label is KEPT here
    (CC strips it, pywb's default does not), so keys match real CC index
    lines only for non-www urls; keys built by :func:`build_cdxj_line`
    (same convention both sides) always round-trip."""
    scheme = scheme_of(url)
    host = host_of(url)
    port = port_of(url)
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    keep_port = (port != "") & ~default
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    rest = F.regexp_replace(
        F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://", ""), r"#.*$", ""
    )
    path_q = F.lower(F.regexp_extract(rest, r"^[^/?]+(.*)$", 1))
    return F.concat(
        rev_host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.lit(")"),
        F.when(path_q == "", F.lit("/")).otherwise(path_q),
    )


def parse_cdxj(
    lines: DataFrame, value_col: str = "value", keep: tuple = ()
) -> DataFrame:
    """CDXJ text lines -> typed capture records.

    Returns (urlkey, ts, url, host, mime, status, digest, warc_filename,
    warc_offset, warc_length), preceded by any ``keep`` passthrough
    columns; malformed lines (missing JSON block or unparsable timestamp)
    surface as null fields rather than failing the scan — index files
    from long crawls carry the odd corrupt line."""
    v = F.col(value_col)
    parts = F.split(v, " ", 3)
    j = F.from_json(F.element_at(parts, 3), CDXJ_JSON_SCHEMA)
    url = j.getField("url")
    # try_* variants: under ANSI mode a single corrupt line would
    # otherwise kill the whole index scan instead of yielding nulls
    return lines.select(
        *[F.col(k) for k in keep],
        F.element_at(parts, 1).alias("urlkey"),
        F.try_to_timestamp(
            F.element_at(parts, 2), F.lit("yyyyMMddHHmmss")
        ).alias("ts"),
        url.alias("url"),
        host_of(url).alias("host"),
        j.getField("mime").alias("mime"),
        j.getField("status").try_cast("int").alias("status"),
        j.getField("digest").alias("digest"),
        j.getField("filename").alias("warc_filename"),
        j.getField("offset").try_cast("long").alias("warc_offset"),
        j.getField("length").try_cast("long").alias("warc_length"),
    )


def read_cdxj(spark: SparkSession, path: str) -> DataFrame:
    """Scan a CDXJ index (text, splittable, gzip-transparent) into typed
    capture records. The standard 100 TB flow:

        idx = read_cdxj(spark, "s3://.../indexes/*.cdx.gz")
        wanted = idx.filter((idx.status == 200) & (idx.mime == "text/html")
                            & (idx.host == "example.co.jp"))
        # -> (warc_filename, warc_offset, warc_length) byte ranges to fetch
    """
    return parse_cdxj(spark.read.text(path))


def build_cdxj_line(
    url: str, ts: str, filename: str, offset: int, length: int,
    mime: str = "text/html", status: int = 200, digest: str = "sha1:X",
) -> str:
    """Synthesize one standards-shaped CDXJ line (test/fixture helper —
    same philosophy as the WARC/PDF/PNG writers: real byte formats, no
    external data). The urlkey is computed driver-side with the same SURT
    convention ``surt_key`` implements."""
    import json
    from urllib.parse import urlsplit

    s = urlsplit(url)
    host = (s.hostname or "").rstrip(".").lower()
    port = ""
    if s.port is not None and (s.scheme.lower(), s.port) not in (
        ("http", 80),
        ("https", 443),
    ):
        port = f":{s.port}"
    rest = url.split("://", 1)[-1].split("#", 1)[0]
    path_q = ""
    for i, ch in enumerate(rest):
        if ch in "/?":
            path_q = rest[i:]
            break
    urlkey = (
        ",".join(reversed(host.split("."))) + port + ")" + (path_q.lower() or "/")
    )
    block = {
        "url": url, "mime": mime, "status": str(status), "digest": digest,
        "length": str(length), "offset": str(offset), "filename": filename,
    }
    return f"{urlkey} {ts} {json.dumps(block)}"
