"""URL column functions: canonicalization + host/eTLD+1 extraction.

The north rule partitions pages by a bucketed hash of host(url) and calls
for explicit salting of skewed hosts — which presumes the engine can
actually extract and canonicalize hosts. The reference keys documents by
file stem (processor.py:482-483); at web scale the key is the url, and a
crawl's urls arrive messy (mixed-case schemes/hosts, default ports,
fragments, unsorted query strings), so the same page would land in
different buckets without canonicalization.

Everything here is pure Spark SQL regexp/string algebra (whole-stage
codegen, no UDFs) with identical RE2-safe patterns on the DuckDB oracle
side. Scope: absolute ``scheme://host[:port][/path][?query][#fragment]``
URLs — the shape a WARC/CDX crawl yields.

Canonicalization policy (documented, deliberately conservative):
- scheme and host lowercased; trailing dot stripped from the host;
- default ports dropped (http:80, https:443), other ports kept;
- fragment removed; empty path becomes "/" (path CASE IS PRESERVED —
  paths are case-sensitive);
- query parameters sorted lexicographically (byte order); an empty query
  drops its "?". No percent-decoding and no www-stripping — both change
  identity in ways that need site-specific knowledge.

``etld1_of`` is a public-suffix HEURISTIC, not the full PSL (a data file
this container doesn't ship): registrable domain = last two labels,
or last three when the second-level label is a common registry SLD
(co/com/ne/net/or/org/ac/go/ed/gr) under a 2-letter ccTLD — covering
co.jp / co.uk / ne.jp / or.jp / ac.jp-style suffixes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
# common registry second-level labels under 2-letter ccTLDs
REGISTRY_SLDS = ("co", "com", "ne", "net", "or", "org", "ac", "go", "ed", "gr")


def _after_scheme(url: Column) -> Column:
    return F.regexp_replace(url, _SCHEME_RE, "")


def _no_fragment(url: Column) -> Column:
    return F.regexp_replace(_after_scheme(url), r"#.*$", "")


def scheme_of(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def host_of(url: Column) -> Column:
    """Lowercased host with any port and trailing dot stripped."""
    hostport = F.regexp_extract(_no_fragment(url), r"^([^/?]+)", 1)
    return F.regexp_replace(
        F.lower(F.regexp_replace(hostport, r":[0-9]+$", "")), r"\.$", ""
    )


def port_of(url: Column) -> Column:
    """Explicit port string, '' when absent."""
    hostport = F.regexp_extract(_no_fragment(url), r"^([^/?]+)", 1)
    return F.regexp_extract(hostport, r":([0-9]+)$", 1)


def url_normalize(url: Column) -> Column:
    """Canonical form per the module policy — pure column algebra."""
    scheme = scheme_of(url)
    host = host_of(url)
    port = port_of(url)
    rest = _no_fragment(url)
    path = F.regexp_extract(rest, r"^[^/?]+(/[^?]*)?", 1)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    keep_port = (port != "") & ~default
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )


def etld1_of(host: Column) -> Column:
    """Registrable domain (eTLD+1) via the documented heuristic."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    tld = F.element_at(parts, -1)
    sld = F.element_at(parts, -2)
    registry = (
        (n >= 3) & sld.isin(*REGISTRY_SLDS) & (F.length(tld) == 2)
    )
    return (
        F.when(
            registry,
            F.concat_ws(".", F.element_at(parts, -3), sld, tld),
        )
        .when(n >= 2, F.concat_ws(".", sld, tld))
        .otherwise(host)
    )
