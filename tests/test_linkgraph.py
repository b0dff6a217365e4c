"""Crawl link-graph aggregates (operators/linkgraph.py) over the WAT
source schema: host-level edges, degree summaries, and the WAT -> edges
end-to-end path."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from docling_japanese_books_spark.operators.linkgraph import (
    host_degrees,
    host_link_edges,
)

TS = dt.datetime(2024, 3, 1, 12, 0, 0)


def _pages(spark):
    rows = [
        Row(
            url="https://a.example/1",
            links=[
                Row(url="https://b.example/x", text="b"),
                Row(url="https://b.example/y", text="b again"),
                Row(url="https://C.Example:443/z", text="case+port"),
                Row(url="/relative", text="no host"),
            ],
        ),
        Row(url="https://a.example/2", links=[Row(url="https://b.example/z", text="b")]),
        Row(url="https://b.example/1", links=[Row(url="https://a.example/", text="back")]),
        Row(url="https://lonely.example/1", links=[]),
    ]
    return spark.createDataFrame(rows)


def test_host_link_edges_aggregates_and_normalizes_hosts(spark):
    edges = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_link_edges(_pages(spark)).collect()
    }
    assert edges == {
        ("a.example", "b.example"): 3,  # two from page 1, one from page 2
        ("a.example", "c.example"): 1,  # lowercased, port stripped
        ("a.example", ""): 1,  # relative href: empty dst_host, kept
        ("b.example", "a.example"): 1,
    }


def test_host_degrees_full_outer_zeros(spark):
    deg = {
        r.host: r for r in host_degrees(host_link_edges(_pages(spark))).collect()
    }
    a, b, c = deg["a.example"], deg["b.example"], deg["c.example"]
    assert (a.out_degree, a.in_degree) == (5, 1)
    assert (a.out_hosts, a.in_hosts) == (3, 1)
    assert (b.out_degree, b.in_degree) == (1, 3)
    # c never links out: zeros on the out side, not a dropped row
    assert (c.out_degree, c.in_degree, c.out_hosts, c.in_hosts) == (0, 1, 0, 1)
    assert deg[""].in_degree == 1  # hostless hrefs aggregate under ''


def test_wat_to_link_graph_end_to_end(spark, tmp_path):
    from docling_japanese_books_spark.sources.warc import build_wat_gz, read_wat

    recs = [
        (
            f"https://src{i % 2}.example/p/{i}",
            TS,
            f"T{i}",
            [(f"https://dst{i % 3}.example/x", "a")],
        )
        for i in range(12)
    ]
    (tmp_path / "crawl.warc.wat.gz").write_bytes(build_wat_gz(recs))
    pages = read_wat(spark, str(tmp_path / "*.warc.wat.gz"))
    edges = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_link_edges(pages).collect()
    }
    # i%2 x i%3 over 0..11: each (src,dst) pair appears exactly twice
    assert len(edges) == 6
    assert all(n == 2 for n in edges.values())
    assert edges[("src0.example", "dst0.example")] == 2


# ---------------------------------------------------------------------------
# host PageRank
# ---------------------------------------------------------------------------


def _edges(spark, triples):
    return spark.createDataFrame(
        triples, "src_host string, dst_host string, n_links long"
    )


def test_pagerank_symmetric_cycle_is_uniform(spark):
    from docling_japanese_books_spark.operators.linkgraph import host_pagerank

    # a 4-cycle: perfectly symmetric, every iteration keeps uniform 1/4
    e = _edges(
        spark, [("a", "b", 1), ("b", "c", 1), ("c", "d", 1), ("d", "a", 1)]
    )
    got = {r.host: r.rank for r in host_pagerank(e, iterations=5).collect()}
    assert all(abs(v - 0.25) < 1e-12 for v in got.values())


def test_pagerank_mass_conserved_with_dangling_sink(spark):
    from docling_japanese_books_spark.operators.linkgraph import host_pagerank

    # 'sink' has no outlinks: its mass must be redistributed, total mass 1
    e = _edges(
        spark,
        [("a", "sink", 3), ("b", "a", 1), ("a", "b", 1), ("b", "sink", 1)],
    )
    got = {r.host: r.rank for r in host_pagerank(e, iterations=4).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # the heavily-linked sink outranks its feeders
    assert got["sink"] > got["a"] > 0 and got["sink"] > got["b"]


def test_pagerank_weighted_edges_split_proportionally(spark):
    from docling_japanese_books_spark.operators.linkgraph import host_pagerank

    # hub splits mass 3:1 between x and y; x must outrank y after 1 iter
    e = _edges(
        spark,
        [
            ("hub", "x", 3),
            ("hub", "y", 1),
            ("x", "hub", 1),
            ("y", "hub", 1),
        ],
    )
    got = {r.host: r.rank for r in host_pagerank(e, iterations=1).collect()}
    assert got["x"] > got["y"]
    # exact one-iteration values: hub's 1/3 splits (3/4, 1/4)
    assert abs(got["x"] - ((1 - 0.85) / 3 + 0.85 * (1 / 3) * 0.75)) < 1e-12
    assert abs(got["y"] - ((1 - 0.85) / 3 + 0.85 * (1 / 3) * 0.25)) < 1e-12


def test_pagerank_checkpoint_mode_matches_plain(spark):
    from docling_japanese_books_spark.operators.linkgraph import host_pagerank

    e = _edges(
        spark,
        [("a", "b", 2), ("b", "c", 1), ("c", "a", 3), ("a", "sink", 1)],
    )
    plain = {
        r.host: r.rank for r in host_pagerank(e, iterations=6).collect()
    }
    ckpt = {
        r.host: r.rank
        for r in host_pagerank(e, iterations=6, checkpoint_every=2).collect()
    }
    assert plain.keys() == ckpt.keys()
    for h in plain:
        assert abs(plain[h] - ckpt[h]) < 1e-15


def test_top_anchors_rank_and_blank_filtering(spark):
    from pyspark.sql import Row

    from docling_japanese_books_spark.operators.linkgraph import top_anchors

    def page(url, pairs):
        return Row(
            url=url, links=[Row(url=u, text=t) for u, t in pairs]
        )

    pages = spark.createDataFrame(
        [
            page("https://s1.example/a", [
                ("https://t.example/1", "docs"),
                ("https://t.example/2", "docs"),
                ("https://t.example/3", "home"),
                ("https://t.example/4", "  "),      # blank: dropped
                ("/relative", "whatever"),           # hostless: dropped
            ]),
            page("https://s2.example/b", [
                ("https://t.example/5", "docs"),
                ("https://t.example/6", "api"),
                ("https://other.example/1", "zzz"),
            ]),
        ]
    )
    got = [
        (r.dst_host, r.anchor, r.n, r.rank)
        for r in top_anchors(pages, k=2).orderBy("dst_host", "rank").collect()
    ]
    assert got == [
        ("other.example", "zzz", 1, 1),
        ("t.example", "docs", 3, 1),   # 3 mentions across both pages
        ("t.example", "api", 1, 2),    # count tie with 'home': lexicographic
    ]


# ---------------------------------------------------------------------------
# redirect resolution (pointer doubling)
# ---------------------------------------------------------------------------


def _redirects(spark, pairs):
    return spark.createDataFrame(pairs, "url string, location string")


def test_resolve_redirects_chains_and_cycles(spark):
    from docling_japanese_books_spark.operators.linkgraph import (
        resolve_redirects,
    )

    e = _redirects(
        spark,
        [
            ("a", "b"), ("b", "c"), ("c", "d"),     # 3-hop chain -> d
            ("x", "y"),                             # 1 hop -> y
            ("p", "q"), ("q", "p"),                 # 2-cycle
            ("s", "s"),                             # self-redirect
        ],
    )
    got = {r.url: (r.final_url, r.resolved)
           for r in resolve_redirects(e).collect()}
    assert got["a"] == ("d", True)
    assert got["b"] == ("d", True)
    assert got["c"] == ("d", True)
    assert got["x"] == ("y", True)
    assert got["p"][1] is False and got["q"][1] is False  # cycle
    assert got["s"] == ("s", False)  # degenerate self-cycle


def test_resolve_redirects_long_chain_log_rounds(spark):
    from docling_japanese_books_spark.operators.linkgraph import (
        resolve_redirects,
    )

    # 40-hop chain: 6 doubling rounds reach 2^6=64 hops
    pairs = [(f"u{i}", f"u{i+1}") for i in range(40)]
    got = {r.url: (r.final_url, r.resolved)
           for r in resolve_redirects(_redirects(spark, pairs)).collect()}
    assert got["u0"] == ("u40", True)
    assert got["u39"] == ("u40", True)
    # but 3 rounds (2^3 = 8 hops) cannot finish a 40-hop chain
    got3 = {r.url: r.resolved
            for r in resolve_redirects(
                _redirects(spark, pairs), max_rounds=3).collect()}
    assert got3["u0"] is False


def test_parse_redirects_from_real_warc_bytes(spark):
    import datetime as dtm

    from docling_japanese_books_spark.operators.linkgraph import (
        resolve_redirects,
    )
    from docling_japanese_books_spark.sources.warc import (
        build_warc_record,
        parse_redirects,
    )

    ts = dtm.datetime(2024, 3, 1)
    blob = (
        build_warc_record("https://old.example/a", ts, b"",
                          status=301, location="https://mid.example/b")
        + build_warc_record("https://mid.example/b", ts, b"",
                            status=302, location="https://new.example/c")
        + build_warc_record("https://new.example/c", ts,
                            b"<html><p>final body</p></html>")
    )
    rows = list(parse_redirects(blob))
    assert [(r["url"], r["status"]) for r in rows] == [
        ("https://old.example/a", 301),
        ("https://mid.example/b", 302),
        ("https://new.example/c", 200),
    ]
    edges = spark.createDataFrame(
        [(r["url"], r["location"]) for r in rows if r["location"]],
        "url string, location string",
    )
    got = {r.url: r.final_url for r in resolve_redirects(edges).collect()}
    assert got == {
        "https://old.example/a": "https://new.example/c",
        "https://mid.example/b": "https://new.example/c",
    }


def _edges_df(spark, triples):
    return spark.createDataFrame(
        [(s, d, int(n)) for s, d, n in triples],
        "src_host string, dst_host string, n_links long",
    )


def _np_hits(triples, iterations):
    """Textbook weighted HITS with L1 normalization, numpy reference."""
    import numpy as np

    hosts = sorted({s for s, _, _ in triples} | {d for _, d, _ in triples})
    idx = {h: i for i, h in enumerate(hosts)}
    w = np.zeros((len(hosts), len(hosts)))
    for s, d, n in triples:
        w[idx[s], idx[d]] += n
    hub = np.ones(len(hosts))
    auth = np.ones(len(hosts))
    for _ in range(iterations):
        auth = w.T @ hub
        tot = auth.sum()
        auth = auth / tot if tot else auth * 0.0
        hub = w @ auth
        tot = hub.sum()
        hub = hub / tot if tot else hub * 0.0
    return {h: (hub[idx[h]], auth[idx[h]]) for h in hosts}


def test_hits_matches_numpy_weighted(spark):
    from docling_japanese_books_spark.operators.linkgraph import host_hits

    triples = [
        ("hub1", "authA", 3),
        ("hub1", "authB", 1),
        ("hub2", "authA", 2),
        ("authA", "hub1", 1),   # back-link: nothing forces bipartite
        ("hub2", "dangling", 1),
        ("isolated_src", "hub2", 1),
    ]
    got = {
        r.host: (r.hub, r.authority)
        for r in host_hits(_edges_df(spark, triples), iterations=3).collect()
    }
    want = _np_hits(triples, 3)
    assert set(got) == set(want)
    for h in want:
        assert abs(got[h][0] - want[h][0]) < 1e-12, h
        assert abs(got[h][1] - want[h][1]) < 1e-12, h
    # the pure source has authority exactly 0, the pure sink hub exactly 0
    assert got["isolated_src"][1] == 0.0
    assert got["dangling"][0] == 0.0


def test_hits_hub_authority_separation(spark):
    """A star: one page linking to many targets must be the top hub,
    the most-linked target the top authority — the signal PageRank's
    single score cannot separate."""
    from docling_japanese_books_spark.operators.linkgraph import host_hits

    triples = [("directory", f"site{i}", 1) for i in range(5)] + [
        ("other", "site0", 2)
    ]
    got = {
        r.host: (r.hub, r.authority)
        for r in host_hits(_edges_df(spark, triples), iterations=2).collect()
    }
    top_hub = max(got, key=lambda h: got[h][0])
    top_auth = max(got, key=lambda h: got[h][1])
    assert top_hub == "directory"
    assert top_auth == "site0"


def test_hits_checkpoint_mode_matches_plain(spark):
    """Truncation cadence never changes values: pure-lazy (0) vs the
    default every-iteration truncation at 1 iteration (the lazy plan is
    exponential in sweep count — see the operator docstring — so the
    plain arm stays at 1), and cadence 1 vs 2 at 4 iterations."""
    from docling_japanese_books_spark.operators.linkgraph import host_hits

    triples = [("a", "b", 2), ("b", "c", 1), ("c", "a", 1), ("a", "c", 3)]
    edges = _edges_df(spark, triples)

    def run(iters, every):
        return {
            r.host: (r.hub, r.authority)
            for r in host_hits(
                edges, iterations=iters, checkpoint_every=every
            ).collect()
        }

    assert run(1, 0) == run(1, 1)
    assert run(4, 1) == run(4, 2)


def test_hits_empty_graph_all_zero(spark):
    """A graph whose only edges carry weight 0 must read all-zero (the
    normalization guard), never NaN or a divide-by-zero error."""
    from docling_japanese_books_spark.operators.linkgraph import host_hits

    got = host_hits(
        _edges_df(spark, [("a", "b", 0)]), iterations=2
    ).collect()
    for r in got:
        assert r.hub == 0.0 and r.authority == 0.0, r
