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
