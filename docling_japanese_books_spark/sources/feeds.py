"""RSS / Atom feed source — the third crawl-discovery channel.

Sitemaps say what a site publishes, robots.txt what may be fetched;
feeds say what is NEW — production crawlers poll them to find fresh
urls between full recrawls. Same contract as the sitemaps module: feeds
are tiny XML documents parsed by the million, so the shape is one
Arrow-batched ``mapInPandas`` over (url, payload) rows — no shuffle, no
driver round-trips, malformed documents yield ``status='parse_error'``
rows instead of task failures.

Format handling (both public specs):
- **RSS 2.0**: ``<rss><channel>`` with ``<item>`` children; entry url
  from ``<link>``, timestamp from ``<pubDate>`` (RFC 822 dates).
- **Atom (RFC 4287)**: ``<feed>`` with ``<entry>`` children; entry url
  from ``<link rel="alternate" href>`` (or the first link), timestamp
  from ``<updated>``/``<published>`` (RFC 3339 dates).

Tags match by local name, so namespaced Atom, unnamespaced fixtures,
and RSS-with-atom:link extensions all parse alike. Gzip payloads
decompress transparently (feeds are served compressed in practice).
Timestamps parse to a real timestamp column (None when unparseable —
the raw string rides along for forensics).
"""

from __future__ import annotations

import datetime as dt
import gzip
from email.utils import parsedate_to_datetime
from typing import Iterator, List, Optional
from xml.etree import ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEED_ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("feed_url", T.StringType(), True),
        T.StructField("kind", T.StringType(), True),  # rss | atom
        T.StructField("feed_title", T.StringType(), True),
        T.StructField("entry_url", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("published_raw", T.StringType(), True),
        T.StructField("published_ts", T.TimestampType(), True),
        T.StructField("status", T.StringType(), False),
    ]
)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _text(el) -> Optional[str]:
    return el.text.strip() if el is not None and el.text else None


def _parse_when(raw: Optional[str]) -> Optional[dt.datetime]:
    """RFC 822 (RSS) or RFC 3339 (Atom) -> naive UTC datetime; None when
    unparseable (the raw string is preserved separately)."""
    if not raw:
        return None
    try:  # RFC 822: 'Mon, 01 Jan 2024 12:00:00 GMT'
        parsed = parsedate_to_datetime(raw)
    except (TypeError, ValueError):
        parsed = None
    if parsed is None:
        try:  # RFC 3339: '2024-01-01T12:00:00Z'
            parsed = dt.datetime.fromisoformat(raw.replace("Z", "+00:00"))
        except ValueError:
            return None
    if parsed.tzinfo is not None:
        parsed = parsed.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return parsed


def _find_child(el, name: str):
    for child in el:
        if _local(child.tag) == name:
            return child
    return None


def _atom_link(entry) -> Optional[str]:
    first = None
    for child in entry:
        if _local(child.tag) != "link":
            continue
        href = child.get("href")
        if href is None:
            continue
        if first is None:
            first = href
        if child.get("rel", "alternate") == "alternate":
            return href
    return first


def parse_feed(payload: bytes) -> List[dict]:
    """Feed bytes (plain or gzip) -> entry dicts (without feed_url).
    A malformed document returns one status='parse_error' row."""
    try:
        if payload[:2] == b"\x1f\x8b":
            payload = gzip.decompress(payload)
        root = ET.fromstring(payload)
    except (ET.ParseError, EOFError, OSError, ValueError):
        return [dict(kind=None, feed_title=None, entry_url=None, title=None,
                     published_raw=None, published_ts=None,
                     status="parse_error")]
    rows: List[dict] = []
    root_name = _local(root.tag)
    if root_name == "rss":
        channel = _find_child(root, "channel")
        feed_title = _text(_find_child(channel, "title")) if channel is not None else None
        items = [c for c in channel if _local(c.tag) == "item"] if channel is not None else []
        for item in items:
            raw = _text(_find_child(item, "pubDate"))
            rows.append(
                dict(
                    kind="rss",
                    feed_title=feed_title,
                    entry_url=_text(_find_child(item, "link")),
                    title=_text(_find_child(item, "title")),
                    published_raw=raw,
                    published_ts=_parse_when(raw),
                    status="ok",
                )
            )
    elif root_name == "feed":
        feed_title = _text(_find_child(root, "title"))
        for entry in (c for c in root if _local(c.tag) == "entry"):
            raw = _text(_find_child(entry, "updated")) or _text(
                _find_child(entry, "published")
            )
            rows.append(
                dict(
                    kind="atom",
                    feed_title=feed_title,
                    entry_url=_atom_link(entry),
                    title=_text(_find_child(entry, "title")),
                    published_raw=raw,
                    published_ts=_parse_when(raw),
                    status="ok",
                )
            )
    else:
        return [dict(kind=None, feed_title=None, entry_url=None, title=None,
                     published_raw=None, published_ts=None,
                     status="parse_error")]
    if not rows:  # a well-formed but empty feed: that's data, one row
        rows.append(
            dict(kind="rss" if root_name == "rss" else "atom",
                 feed_title=None if root_name == "rss" else _text(_find_child(root, "title")),
                 entry_url=None, title=None, published_raw=None,
                 published_ts=None, status="empty")
        )
    return rows


def parse_feeds(
    feeds: DataFrame, url_col: str = "url", payload_col: str = "payload"
) -> DataFrame:
    """(url, payload) rows -> one row per feed entry, Arrow-batched."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FEED_ENTRY_SCHEMA.fields]
        for pdf in batches:
            rows: List[dict] = []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                for entry in parse_feed(payload):
                    entry["feed_url"] = url
                    rows.append(entry)
            yield pd.DataFrame(rows, columns=cols)

    return feeds.select(
        F.col(url_col).alias("url"), F.col(payload_col).alias("payload")
    ).mapInPandas(op, FEED_ENTRY_SCHEMA)


# ---------------------------------------------------------------------------
# writers (tests / fixtures)
# ---------------------------------------------------------------------------


def build_rss(
    feed_title: str, items: List[tuple], gz: bool = False
) -> bytes:
    """items: (url, title, rfc822_date_str)."""
    body = "".join(
        f"<item><title>{t}</title><link>{u}</link>"
        f"<pubDate>{d}</pubDate></item>"
        for u, t, d in items
    )
    xml = (
        '<?xml version="1.0"?><rss version="2.0"><channel>'
        f"<title>{feed_title}</title>{body}</channel></rss>"
    ).encode("utf-8")
    return gzip.compress(xml) if gz else xml


def build_atom(
    feed_title: str, entries: List[tuple], gz: bool = False
) -> bytes:
    """entries: (url, title, rfc3339_date_str)."""
    body = "".join(
        f"<entry><title>{t}</title>"
        f'<link rel="alternate" href="{u}"/>'
        f"<updated>{d}</updated></entry>"
        for u, t, d in entries
    )
    xml = (
        '<feed xmlns="http://www.w3.org/2005/Atom">'
        f"<title>{feed_title}</title>{body}</feed>"
    ).encode("utf-8")
    return gzip.compress(xml) if gz else xml
