"""WARC source connector — Common-Crawl-style archives to the pages table.

The north star reads "Common-Crawl-style web pages"; Common Crawl ships
WARC (ISO 28500) archives, one gzip member per record. The format is
public and its only compression is gzip — stdlib — so the connector is
pure Python end to end:

- ``build_warc`` / ``build_warc_gz``: a minimal standards-shaped WARC
  writer used by tests and fixtures to synthesize genuine archive bytes
  (same philosophy as the PDF/PNG codecs: exercise REAL byte streams, no
  external data).
- ``parse_warc`` parses WARC/1.x records (plain or multi-member gzip),
  keeps ``response`` records, parses the stored HTTP response (status
  line, headers, optional chunked transfer-encoding), and yields rows of
  the north-rule pages schema ``(url, warc_ts, html, text, lang)``.
- ``read_warc``: the Spark operator — ``binaryFile`` scan over an archive
  glob, then one Arrow-batched ``mapInPandas`` stage parsing each archive
  executor-side (no driver funnel, no shuffle). Feed the result straight
  into ``pipeline.run_extraction_pipeline``.

Scale: one WARC archive is one binaryFile row (~1 GB in Common Crawl), so
parallelism = number of archives; ``spark.sql.files.maxPartitionBytes``
doesn't split binary wholes, which matches how WARC must be read (records
are not splittable mid-member without an index). Malformed records are
skipped, counted per archive via the ``_warc_errors`` accumulator column.
"""

from __future__ import annotations

import datetime as dt
import gzip
import io
import json
import re
from typing import Iterator, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..extraction.pages import PAGES_SCHEMA

CRLF = b"\r\n"


# ---------------------------------------------------------------------------
# writer (tests / fixtures)
# ---------------------------------------------------------------------------


def build_warc_record(
    url: str,
    ts: dt.datetime,
    html: bytes,
    content_language: Optional[str] = None,
    warc_type: str = "response",
    chunked: bool = False,
    content_type: str = "text/html; charset=utf-8",
    status: int = 200,
    location: Optional[str] = None,
) -> bytes:
    """One WARC record wrapping an HTTP/1.1 response payload."""
    if chunked:
        body = (
            f"{len(html):x}".encode("ascii") + CRLF + html + CRLF + b"0" + CRLF + CRLF
        )
        te = b"Transfer-Encoding: chunked" + CRLF
    else:
        body = html
        te = f"Content-Length: {len(html)}".encode("ascii") + CRLF
    reason = {200: "OK", 301: "Moved Permanently", 302: "Found"}.get(
        status, "Status"
    )
    http = (
        f"HTTP/1.1 {status} {reason}".encode("ascii") + CRLF
        + f"Content-Type: {content_type}".encode("latin-1") + CRLF
        + te
        + (
            f"Location: {location}".encode("latin-1") + CRLF
            if location
            else b""
        )
        + (
            f"Content-Language: {content_language}".encode("ascii") + CRLF
            if content_language
            else b""
        )
        + CRLF
        + body
    )
    headers = (
        b"WARC/1.0" + CRLF
        + f"WARC-Type: {warc_type}".encode("ascii") + CRLF
        + f"WARC-Target-URI: {url}".encode("ascii") + CRLF
        + f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}".encode("ascii") + CRLF
        + b"Content-Type: application/http;msgtype=response" + CRLF
        + f"Content-Length: {len(http)}".encode("ascii") + CRLF
        + CRLF
    )
    return headers + http + CRLF + CRLF


def build_warc(records: List[Tuple[str, dt.datetime, bytes]]) -> bytes:
    return b"".join(build_warc_record(u, ts, h) for u, ts, h in records)


def build_warc_gz(records: List[Tuple[str, dt.datetime, bytes]]) -> bytes:
    """Common-Crawl layout: one gzip member per record (random access by
    offset stays possible)."""
    return b"".join(
        gzip.compress(build_warc_record(u, ts, h)) for u, ts, h in records
    )


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def _gunzip_members(payload: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream; GzipFile reads
    concatenated members transparently."""
    with gzip.GzipFile(fileobj=io.BytesIO(payload)) as f:
        return f.read()


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer-encoding."""
    out = bytearray()
    pos = 0
    while True:
        nl = body.find(CRLF, pos)
        if nl < 0:
            raise ValueError("truncated chunked body")
        size = int(body[pos:nl].split(b";")[0], 16)
        if size == 0:
            return bytes(out)
        out += body[nl + 2 : nl + 2 + size]
        pos = nl + 2 + size + 2  # skip chunk data + trailing CRLF


_CHARSET_PARAM_RE = re.compile(rb"charset\s*=\s*\"?([A-Za-z0-9_\-]+)", re.I)


def _parse_http_response(
    payload: bytes,
) -> Tuple[bytes, Optional[str], Optional[str]]:
    """Stored HTTP response -> (body bytes, Content-Language or None,
    Content-Type charset label or None). The header charset outranks any
    in-document <meta> declaration (WHATWG precedence), so it rides along
    as a decode hint for the extraction stage."""
    sep = payload.find(CRLF + CRLF)
    if sep < 0 or not payload[:5] in (b"HTTP/",):
        raise ValueError("not an HTTP response payload")
    head, body = payload[:sep], payload[sep + 4 :]
    lang = None
    charset = None
    chunked = False
    content_length = None
    for line in head.split(CRLF)[1:]:
        k, _, v = line.partition(b":")
        key = k.strip().lower()
        if key == b"content-language":
            lang = v.strip().decode("latin-1") or None
        elif key == b"content-type":
            m = _CHARSET_PARAM_RE.search(v)
            if m:
                charset = m.group(1).decode("ascii").lower()
        elif key == b"transfer-encoding" and b"chunked" in v.lower():
            chunked = True
        elif key == b"content-length":
            try:
                content_length = int(v.strip())
            except ValueError:
                pass
    # RFC 7230 §3.3.3: when both are present, Transfer-Encoding wins and
    # Content-Length must be ignored — truncating at CL before dechunking
    # would corrupt the body (real servers do send both)
    if chunked:
        return _dechunk(body), lang, charset
    if content_length is not None:
        body = body[:content_length]
    return body, lang, charset


def _iter_warc_records(payload: bytes) -> Iterator[Tuple[dict, bytes]]:
    """Walk WARC bytes (plain or gzip) yielding (headers, content) per
    record; records with an unparseable Content-Length are skipped. Shared
    by the WARC (``response``) and WET (``conversion``) parsers."""
    if payload[:2] == b"\x1f\x8b":
        payload = _gunzip_members(payload)
    pos = 0
    n = len(payload)
    while pos < n:
        start = payload.find(b"WARC/", pos)
        if start < 0:
            return
        head_end = payload.find(CRLF + CRLF, start)
        if head_end < 0:
            return
        headers = {}
        for line in payload[start:head_end].split(CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            pos = head_end + 4
            continue
        content = payload[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        yield headers, content


def parse_warc(payload: bytes) -> Iterator[dict]:
    """WARC bytes (plain or gzip) -> pages-schema dicts for each parseable
    ``response`` record; malformed records are skipped (yielded count vs
    input records is the caller's error metric)."""
    for headers, content in _iter_warc_records(payload):
        if headers.get(b"warc-type") != b"response":
            continue
        try:
            url = headers[b"warc-target-uri"].decode("utf-8")
            ts = dt.datetime.strptime(
                headers[b"warc-date"].decode("ascii")[:19], "%Y-%m-%dT%H:%M:%S"
            )
            body, lang, charset = _parse_http_response(content)
        except (KeyError, ValueError, UnicodeDecodeError):
            continue
        yield dict(
            url=url, warc_ts=ts, html=body, text="", lang=lang or "und",
            charset_hint=charset,
        )


# ---------------------------------------------------------------------------
# WET (Common Crawl extracted-text sidecar: WARC with `conversion` records)
# ---------------------------------------------------------------------------


def build_wet_record(url: str, ts: dt.datetime, text: str) -> bytes:
    """One WET ``conversion`` record: the extracted plain text as UTF-8,
    no HTTP envelope (the Common Crawl *.warc.wet layout)."""
    body = text.encode("utf-8")
    headers = (
        b"WARC/1.0" + CRLF
        + b"WARC-Type: conversion" + CRLF
        + f"WARC-Target-URI: {url}".encode("ascii") + CRLF
        + f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}".encode("ascii") + CRLF
        + b"Content-Type: text/plain" + CRLF
        + f"Content-Length: {len(body)}".encode("ascii") + CRLF
        + CRLF
    )
    return headers + body + CRLF + CRLF


def _build_warcinfo(ts: dt.datetime) -> bytes:
    info = b"format: WARC File Format 1.0" + CRLF
    return (
        b"WARC/1.0" + CRLF
        + b"WARC-Type: warcinfo" + CRLF
        + f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}".encode("ascii") + CRLF
        + b"Content-Type: application/warc-fields" + CRLF
        + f"Content-Length: {len(info)}".encode("ascii") + CRLF
        + CRLF
        + info + CRLF + CRLF
    )


def build_wet(records: List[Tuple[str, dt.datetime, str]]) -> bytes:
    """Standards-shaped WET file: a leading ``warcinfo`` record (skipped by
    the parser, present in every real Common Crawl WET) + conversions."""
    ts0 = records[0][1] if records else dt.datetime(2024, 1, 1)
    return _build_warcinfo(ts0) + b"".join(
        build_wet_record(u, ts, x) for u, ts, x in records
    )


def build_wet_gz(records: List[Tuple[str, dt.datetime, str]]) -> bytes:
    """One gzip member per record, like the WARC layout."""
    ts0 = records[0][1] if records else dt.datetime(2024, 1, 1)
    return gzip.compress(_build_warcinfo(ts0)) + b"".join(
        gzip.compress(build_wet_record(u, ts, x)) for u, ts, x in records
    )


def parse_wet(payload: bytes) -> Iterator[dict]:
    """WET bytes (plain or gzip) -> pages-schema dicts per ``conversion``
    record: the stored body IS the extracted text (UTF-8 per the format;
    undecodable bytes are replaced, not fatal — a skipped record would
    hide the page entirely). ``html`` stays empty: these pages enter the
    pipeline downstream of extraction."""
    for headers, content in _iter_warc_records(payload):
        if headers.get(b"warc-type") != b"conversion":
            continue
        try:
            url = headers[b"warc-target-uri"].decode("utf-8")
            ts = dt.datetime.strptime(
                headers[b"warc-date"].decode("ascii")[:19], "%Y-%m-%dT%H:%M:%S"
            )
        except (KeyError, ValueError, UnicodeDecodeError):
            continue
        yield dict(
            url=url,
            warc_ts=ts,
            html=b"",
            text=content.decode("utf-8", errors="replace"),
            lang="und",
        )


_STATUS_RE = re.compile(rb"^HTTP/\d\.\d\s+(\d{3})")


def parse_redirects(payload: bytes) -> Iterator[dict]:
    """WARC bytes -> ``(url, status, location)`` for every stored HTTP
    response, ``location`` populated on 3xx responses (resolved against
    nothing — crawlers store absolute Location urls; relative ones pass
    through for the caller's url-join policy). The redirect edge list
    feeds ``operators.linkgraph.resolve_redirects`` so duplicate-page
    detection can canonicalize crawl urls before hashing."""
    for headers, content in _iter_warc_records(payload):
        if headers.get(b"warc-type") != b"response":
            continue
        try:
            url = headers[b"warc-target-uri"].decode("utf-8")
        except (KeyError, UnicodeDecodeError):
            continue
        m = _STATUS_RE.match(content)
        if not m:
            continue
        status = int(m.group(1))
        location = None
        sep = content.find(CRLF + CRLF)
        head = content[:sep] if sep >= 0 else content
        for line in head.split(CRLF)[1:]:
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"location":
                try:
                    location = v.strip().decode("utf-8") or None
                except UnicodeDecodeError:
                    location = None
                break
        yield dict(url=url, status=status, location=location)


# ---------------------------------------------------------------------------
# WAT (Common Crawl metadata sidecar: WARC with `metadata` + JSON records)
# ---------------------------------------------------------------------------


def build_wat_record(
    url: str,
    ts: dt.datetime,
    title: Optional[str],
    links: List[Tuple[str, str]],
) -> bytes:
    """One WAT ``metadata`` record: the IIPC web-archive-metadata JSON
    envelope for one crawled page (the Common Crawl *.warc.wat layout).
    ``links`` are (href, anchor-text) pairs from the page's <a> tags —
    the payload the link-graph operator consumes."""
    head: dict = {}
    if title is not None:
        head["Title"] = title
    envelope = {
        "Envelope": {
            "WARC-Header-Metadata": {
                "WARC-Type": "response",
                "WARC-Target-URI": url,
                "WARC-Date": ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
            },
            "Payload-Metadata": {
                "HTTP-Response-Metadata": {
                    "HTML-Metadata": {
                        "Head": head,
                        "Links": [
                            {"path": "A@/href", "url": u, "text": x}
                            for u, x in links
                        ],
                    }
                }
            },
        },
        "Container": {"Filename": "crawl.warc.gz"},
    }
    body = json.dumps(envelope, ensure_ascii=False, sort_keys=True).encode(
        "utf-8"
    )
    headers = (
        b"WARC/1.0" + CRLF
        + b"WARC-Type: metadata" + CRLF
        + f"WARC-Target-URI: {url}".encode("ascii") + CRLF
        + f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}".encode("ascii") + CRLF
        + b"Content-Type: application/json" + CRLF
        + f"Content-Length: {len(body)}".encode("ascii") + CRLF
        + CRLF
    )
    return headers + body + CRLF + CRLF


def build_wat(
    records: List[Tuple[str, dt.datetime, Optional[str], List[Tuple[str, str]]]]
) -> bytes:
    """Standards-shaped WAT file: leading ``warcinfo`` + metadata records
    (real Common Crawl WATs also carry warcinfo; the parser skips it)."""
    ts0 = records[0][1] if records else dt.datetime(2024, 1, 1)
    return _build_warcinfo(ts0) + b"".join(
        build_wat_record(u, ts, ti, ls) for u, ts, ti, ls in records
    )


def build_wat_gz(
    records: List[Tuple[str, dt.datetime, Optional[str], List[Tuple[str, str]]]]
) -> bytes:
    """One gzip member per record, like the WARC layout."""
    ts0 = records[0][1] if records else dt.datetime(2024, 1, 1)
    return gzip.compress(_build_warcinfo(ts0)) + b"".join(
        gzip.compress(build_wat_record(u, ts, ti, ls))
        for u, ts, ti, ls in records
    )


def parse_wat(payload: bytes) -> Iterator[dict]:
    """WAT bytes (plain or gzip) -> one dict per parseable ``metadata``
    record: ``(url, warc_ts, title, links)`` with ``links`` a list of
    ``{"url", "text"}`` dicts in page order. Records whose JSON is
    malformed or not a JSON object are skipped (the caller's error
    metric, same contract as the WARC/WET parsers); pages with no
    HTML-Metadata yield an empty link list — absence of links is data,
    not an error."""
    for headers, content in _iter_warc_records(payload):
        if headers.get(b"warc-type") != b"metadata":
            continue
        try:
            url = headers[b"warc-target-uri"].decode("utf-8")
            ts = dt.datetime.strptime(
                headers[b"warc-date"].decode("ascii")[:19], "%Y-%m-%dT%H:%M:%S"
            )
            doc = json.loads(content.decode("utf-8"))
        except (KeyError, ValueError, UnicodeDecodeError):
            continue
        if not isinstance(doc, dict):
            continue
        html_meta = (
            doc.get("Envelope", {})
            .get("Payload-Metadata", {})
            .get("HTTP-Response-Metadata", {})
            .get("HTML-Metadata", {})
        )
        if not isinstance(html_meta, dict):
            html_meta = {}
        head = html_meta.get("Head", {})
        title = head.get("Title") if isinstance(head, dict) else None
        links = []
        raw_links = html_meta.get("Links", [])
        if isinstance(raw_links, list):
            for entry in raw_links:
                if isinstance(entry, dict) and isinstance(entry.get("url"), str):
                    links.append(
                        {"url": entry["url"], "text": entry.get("text") or ""}
                    )
        yield dict(
            url=url,
            warc_ts=ts,
            title=title if isinstance(title, str) else None,
            links=links,
        )


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------


WARC_PAGES_SCHEMA = T.StructType(
    list(PAGES_SCHEMA.fields)
    + [T.StructField("charset_hint", T.StringType(), True)]
)


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC archive glob -> pages DataFrame (+ ``charset_hint`` from the
    HTTP Content-Type header — feed it to ``extract_pages(charset_col=)``
    so decoding honors WHATWG precedence): binaryFile scan (one row per
    archive) + one mapInPandas parse stage, executor-side."""
    raw = spark.read.format("binaryFile").load(path_glob).select("content")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: List[dict] = []
            for payload in pdf["content"]:
                try:
                    rows.extend(parse_warc(bytes(payload)))
                except Exception:
                    continue  # unreadable archive: contributes no pages
            yield pd.DataFrame(
                rows,
                columns=["url", "warc_ts", "html", "text", "lang", "charset_hint"],
            )

    return raw.mapInPandas(op, WARC_PAGES_SCHEMA)


WAT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
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


def read_wat(spark: SparkSession, path_glob: str) -> DataFrame:
    """WAT archive glob -> page-metadata DataFrame ``(url, warc_ts, title,
    links array<struct<url,text>>)``: binaryFile scan + one mapInPandas
    parse stage, executor-side — the same one-row-per-archive parallelism
    contract as ``read_warc``. Feed ``links`` to
    ``operators.linkgraph.host_link_edges`` for the crawl link graph."""
    raw = spark.read.format("binaryFile").load(path_glob).select("content")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: List[dict] = []
            for payload in pdf["content"]:
                try:
                    rows.extend(parse_wat(bytes(payload)))
                except Exception:
                    continue  # unreadable archive: contributes no pages
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "title", "links"]
            )

    return raw.mapInPandas(op, WAT_SCHEMA)


def write_wet(
    pages: DataFrame,
    out_dir: str,
    url_col: str = "url",
    text_col: str = "text",
    ts_col: Optional[str] = None,
) -> DataFrame:
    """Export sink: curated pages -> Common Crawl WET archives (one
    ``*.warc.wet.gz`` per partition, warcinfo + one gzip member per
    ``conversion`` record) — the interchange format downstream consumers
    of extracted text already read.

    Same contract as the image blob sink: a ``mapInPandas`` stage writes
    each archive executor-side (no driver funnel) and yields one manifest
    row per file; materializing the returned frame performs the writes.
    Files are content-addressed (`{sha256 of uncompressed records}.warc
    .wet.gz`), so task retries, duplicate partitions, and re-runs publish
    idempotently via tmp-file + atomic rename. Partitioning is the
    caller's knob: ``pages.repartition(n)`` picks the archive count,
    ``sortWithinPartitions`` the record order. ``ts_col`` stamps each
    record from a timestamp column; without it a fixed epoch keeps the
    output byte-deterministic (this engine stamps no wall clocks).
    ``out_dir`` must be reachable by every executor (local dir on
    local[*], shared/object storage on a cluster)."""
    import hashlib
    import os

    schema = T.StructType(
        [
            T.StructField("path", T.StringType(), True),
            T.StructField("n_records", T.LongType(), True),
            T.StructField("n_bytes", T.LongType(), True),
        ]
    )
    fixed_ts = dt.datetime(2024, 1, 1)
    cols = [url_col, text_col] + ([ts_col] if ts_col else [])

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # streamed: one gzip member to disk per record as batches arrive —
        # the partition's text is never held in memory; the content hash
        # accumulates over the UNcompressed record bytes so the name is
        # independent of gzip framing
        import tempfile

        os.makedirs(out_dir, exist_ok=True)
        h = hashlib.sha256()
        n_records = 0
        f = None
        tmp = None
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                ts = getattr(row, ts_col) if ts_col else fixed_ts
                if hasattr(ts, "to_pydatetime"):
                    ts = ts.to_pydatetime()
                rec = build_wet_record(
                    getattr(row, url_col), ts, getattr(row, text_col) or ""
                )
                if f is None:
                    fd, tmp = tempfile.mkstemp(
                        dir=out_dir, suffix=".wet.tmp"
                    )
                    f = os.fdopen(fd, "wb")
                    f.write(gzip.compress(_build_warcinfo(ts)))
                h.update(rec)
                f.write(gzip.compress(rec))
                n_records += 1
        if f is None:  # empty partition: no file, no manifest row
            yield pd.DataFrame(
                {
                    "path": pd.Series(dtype=object),
                    "n_records": pd.Series(dtype="int64"),
                    "n_bytes": pd.Series(dtype="int64"),
                }
            )
            return
        f.close()
        n_bytes = os.path.getsize(tmp)
        path = os.path.join(out_dir, f"{h.hexdigest()}.warc.wet.gz")
        if os.path.exists(path):  # content-addressed: retry already landed
            os.remove(tmp)
        else:
            os.replace(tmp, path)  # atomic publish
        yield pd.DataFrame(
            [dict(path=path, n_records=n_records, n_bytes=n_bytes)]
        )

    return pages.select(*cols).mapInPandas(op, schema)


def read_wet(spark: SparkSession, path_glob: str) -> DataFrame:
    """WET archive glob -> pages DataFrame with ``text`` already populated
    (extraction already happened upstream at Common Crawl): binaryFile
    scan + one mapInPandas parse stage, executor-side — the same
    one-row-per-archive parallelism contract as ``read_warc``."""
    raw = spark.read.format("binaryFile").load(path_glob).select("content")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: List[dict] = []
            for payload in pdf["content"]:
                try:
                    rows.extend(parse_wet(bytes(payload)))
                except Exception:
                    continue  # unreadable archive: contributes no pages
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return raw.mapInPandas(op, PAGES_SCHEMA)
