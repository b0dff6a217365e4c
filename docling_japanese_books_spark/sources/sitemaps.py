"""Sitemap and robots.txt sources — the crawl-selection layer.

The CDX index (sources/cdx.py) answers "what did the crawl capture";
sitemaps answer "what does the site itself publish" and robots.txt
answers "what may be fetched". Both are tiny text/XML documents that a
100 TB pipeline parses by the million, so the shapes here are one
Arrow-batched UDF per format over (url, payload) rows — no shuffle, no
driver round-trips.

- **Sitemaps** (sitemaps.org protocol): ``<urlset>`` leaf documents and
  ``<sitemapindex>`` index documents, both with ``loc`` + optional
  ``lastmod``/``changefreq``/``priority``. Namespace handled by local
  name so the 0.9 namespace and unnamespaced test fixtures parse alike.
  Gzip-wrapped payloads (the protocol's standard delivery) decompress
  transparently.
- **robots.txt** (REP, RFC 9309): user-agent groups with Allow/Disallow
  rules, Crawl-delay, and the Sitemap cross-links that bootstrap
  sitemap discovery. ``robots_allows`` implements the RFC's
  longest-match-wins rule evaluation (Allow beats Disallow on ties) with
  ``*`` wildcards and the ``$`` end anchor.

Parsers raise nothing row-level: malformed documents yield
status='parse_error' rows, the same isolation contract as every other
source.
"""

from __future__ import annotations

import gzip
import re
from typing import Iterator, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from xml.etree import ElementTree as ET

SITEMAP_ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("sitemap_url", T.StringType(), True),
        T.StructField("kind", T.StringType(), True),  # urlset | sitemapindex
        T.StructField("loc", T.StringType(), True),
        T.StructField("lastmod", T.StringType(), True),
        T.StructField("changefreq", T.StringType(), True),
        T.StructField("priority", T.DoubleType(), True),
        T.StructField("status", T.StringType(), False),
    ]
)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_sitemap(payload: bytes) -> List[dict]:
    """Sitemap bytes (optionally gzipped) -> entry dicts. Raises
    ValueError on malformed input (wrapped per-row by the UDF)."""
    if payload[:2] == b"\x1f\x8b":
        try:
            payload = gzip.decompress(payload)
        except (OSError, EOFError) as ex:  # BadGzipFile / truncated stream
            raise ValueError(f"bad gzip sitemap: {ex}") from ex
    try:
        root = ET.fromstring(payload)
    except ET.ParseError as ex:
        raise ValueError(f"malformed sitemap XML: {ex}") from ex
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(f"not a sitemap document: <{kind}>")
    child_tag = "url" if kind == "urlset" else "sitemap"
    out: List[dict] = []
    for child in root:
        if _local(child.tag) != child_tag:
            continue
        fields = {}
        for el in child:
            fields[_local(el.tag)] = (el.text or "").strip()
        loc = fields.get("loc")
        if not loc:
            continue
        pr = fields.get("priority")
        try:
            priority = float(pr) if pr not in (None, "") else None
        except ValueError:
            priority = None
        out.append(
            dict(
                kind=kind,
                loc=loc,
                lastmod=fields.get("lastmod") or None,
                changefreq=fields.get("changefreq") or None,
                priority=priority,
            )
        )
    return out


def parse_sitemaps(
    docs: DataFrame, url_col: str = "url", payload_col: str = "payload"
) -> DataFrame:
    """(url, payload) rows -> one row per sitemap entry; a malformed
    sitemap yields a single status='parse_error' row for lineage."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                try:
                    entries = parse_sitemap(data)
                except ValueError:
                    rows.append(
                        dict(
                            sitemap_url=url, kind=None, loc=None, lastmod=None,
                            changefreq=None, priority=None, status="parse_error",
                        )
                    )
                    continue
                for e in entries:
                    rows.append(dict(sitemap_url=url, status="ok", **e))
                if not entries:
                    rows.append(
                        dict(
                            sitemap_url=url, kind=None, loc=None, lastmod=None,
                            changefreq=None, priority=None, status="empty",
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "sitemap_url", "kind", "loc", "lastmod", "changefreq",
                    "priority", "status",
                ],
            )

    return docs.select(url_col, payload_col).mapInPandas(op, SITEMAP_ENTRY_SCHEMA)


# ---------------------------------------------------------------------------
# robots.txt (RFC 9309 Robots Exclusion Protocol)
# ---------------------------------------------------------------------------


def parse_robots(text: str) -> dict:
    """robots.txt -> {groups: [{agents: [...], rules: [(allow, pattern)],
    crawl_delay: float|None}], sitemaps: [...]}. Lines are
    case-insensitive on the field name; comments (#) stripped; a group =
    consecutive user-agent lines followed by its rules (RFC 9309 §2.1)."""
    groups: List[dict] = []
    sitemaps: List[str] = []
    current: Optional[dict] = None
    agents_open = False  # collecting consecutive user-agent lines
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "sitemap":
            if value:
                sitemaps.append(value)
        elif field == "user-agent":
            if current is None or not agents_open:
                current = dict(agents=[], rules=[], crawl_delay=None)
                groups.append(current)
                agents_open = True
            current["agents"].append(value.lower())
        elif field in ("allow", "disallow"):
            agents_open = False
            if current is not None:
                if value:  # empty Disallow = allow-all no-op per RFC
                    current["rules"].append((field == "allow", value))
        elif field == "crawl-delay":
            agents_open = False
            if current is not None:
                try:
                    current["crawl_delay"] = float(value)
                except ValueError:
                    pass
        else:
            agents_open = False
    return dict(groups=groups, sitemaps=sitemaps)


def _rule_matches(pattern: str, path: str) -> Optional[int]:
    """RFC 9309 matching: '*' wildcards, '$' end anchor; returns the
    pattern's specificity (its literal length) when it matches, else
    None."""
    anchored = pattern.endswith("$")
    pat = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in pat)
    rx = "^" + rx + ("$" if anchored else "")
    return len(pattern) if re.match(rx, path) else None


def robots_allows(robots: dict, agent: str, path: str) -> bool:
    """May ``agent`` fetch ``path``? The matched group is the most
    specific user-agent match ('*' as fallback); within it the
    longest-matching rule wins, Allow beating Disallow on equal length.
    No matching rule (or no group) = allowed (RFC 9309 §2.2.2)."""
    agent = agent.lower()
    best_group, best_spec = None, -1
    for g in robots.get("groups", []):
        for ga in g["agents"]:
            if ga == "*":
                spec = 0
            elif ga and ga in agent:
                spec = len(ga)
            else:
                continue
            if spec > best_spec:
                best_group, best_spec = g, spec
    if best_group is None:
        return True
    best: Tuple[int, bool] = (-1, True)  # (match length, allow)
    for allow, pattern in best_group["rules"]:
        m = _rule_matches(pattern, path)
        if m is None:
            continue
        if m > best[0] or (m == best[0] and allow and not best[1]):
            best = (m, allow)
    return best[1]


ROBOTS_CHECK_SCHEMA = T.StructType(
    [
        T.StructField("allowed", T.BooleanType(), False),
        T.StructField("crawl_delay", T.DoubleType(), True),
        T.StructField("n_sitemaps", T.IntegerType(), False),
    ]
)


def robots_check_udf(agent: str):
    """(robots_txt, path) -> (allowed, crawl_delay, n_sitemaps) as one
    Arrow stage; the per-host robots documents are small and Zipf-reused,
    so parses are memoized per batch."""

    @F.pandas_udf(ROBOTS_CHECK_SCHEMA)
    def check(robots_txt: pd.Series, path: pd.Series) -> pd.DataFrame:
        cache: dict = {}
        rows = []
        for txt, p in zip(robots_txt, path):
            txt = txt or ""
            parsed = cache.get(txt)
            if parsed is None:
                parsed = cache[txt] = parse_robots(txt)
            g_allowed = robots_allows(parsed, agent, p or "/")
            delay = None
            # the delay of the group that governed the decision
            agent_l = agent.lower()
            best, spec_best = None, -1
            for g in parsed["groups"]:
                for ga in g["agents"]:
                    spec = 0 if ga == "*" else (len(ga) if ga in agent_l else -1)
                    if spec >= 0 and spec > spec_best:
                        best, spec_best = g, spec
            if best is not None:
                delay = best["crawl_delay"]
            rows.append(
                dict(
                    allowed=bool(g_allowed),
                    crawl_delay=delay,
                    n_sitemaps=len(parsed["sitemaps"]),
                )
            )
        return pd.DataFrame(rows)

    return check
