"""Fast tokenizer path must be byte-equivalent to the HTMLParser path."""

from __future__ import annotations

import random

from docling_japanese_books_spark.extraction.html import extract_main_content
from docling_japanese_books_spark.extraction.pages import make_page


def both(payload: bytes):
    return extract_main_content(payload, fast=True), extract_main_content(
        payload, fast=False
    )


def test_equivalent_on_generator_corpus():
    for i in range(3000):
        row = make_page(42, i, 2, 8)
        fast, slow = both(row["html"])
        assert fast == slow, f"divergence at row {i}"


def test_equivalent_on_heavy_pages():
    for i in range(300):
        row = make_page(7, i, 10, 30)
        fast, slow = both(row["html"])
        assert fast == slow


EDGE_CASES = [
    b"",
    b"plain text no tags at all, long enough to be a kept block",
    b"<p>unclosed paragraph with plenty of text to keep around here",
    b"<P>UPPERCASE TAGS WITH ENOUGH TEXT TO BE KEPT IN THE OUTPUT</P>",
    b"<p>a &amp; b &lt; c &gt; d &quot;quoted&quot; &#65; &#x42; entity soup</p>",
    b"<script>var x = '<p>not content</p>';</script><p>real content stays here</p>",
    b"<style>p { color: red }</style><p>styled content text long enough</p>",
    b"<script>unterminated script swallows the rest <p>gone</p>",
    b"<!-- comment --><p>after comment there is enough text to keep</p>",
    b"<!DOCTYPE html><p>doctype ignored, content kept, long enough text</p>",
    b"<br/><hr/><p>self-closing void tags before a real paragraph here</p>",
    b"<div><div><div>nested divs with enough text in the innermost one</div></div></div>",
    b"<a href='x'>link text</a><p>paragraph after a bare link, long enough</p>",
    b"<nav><p>inside nav dropped</p></nav><p>outside nav kept, long text</p>",
    b"<p>text with <b>inline</b> markup <i>kept</i> as running text flow</p>",
    b"<td>table cell one</td><td>table cell two with enough text here</td>",
    "<p>日本語の段落。ここに十分な長さの本文があります。</p>".encode(),
    "<p>entities &amp; 全角文字ＡＢＣ mixed ｶﾀｶﾅ with enough text</p>".encode(),
    b"<p class='a' data-x=\"y>z\">attribute with gt inside quotes, text kept</p>",
    b"< p>space before tag name is not a tag, shown as text, long enough<",
    b"<p>trailing lone bracket <",
    b"<![CDATA[ raw ]]><p>after cdata enough text to keep this block</p>",
]


def test_equivalent_on_edge_cases():
    for case in EDGE_CASES:
        fast, slow = both(case)
        assert fast == slow, f"divergence on {case[:60]!r}"


def test_unterminated_comment_semantics():
    """Pathological input where HTMLParser's close() half-parses the tail —
    the FAST path is canonical here: the broken '<!--' becomes literal text
    and well-formed markup after it still parses."""
    out = extract_main_content(b"<!-- unterminated <p>this text is long enough to keep</p>")
    assert out["status"] == "ok"
    assert "this text is long enough to keep" in out["text"]


def test_equivalent_on_tag_soup_fuzz():
    rng = random.Random(42)
    atoms = [
        "<p>", "</p>", "<div>", "</div>", "<a href='/x'>", "</a>", "<nav>",
        "</nav>", "<script>", "</script>", "<br/>", "<!-- c -->", "&amp;",
        "text ", "longer run of text here ", "日本語 ", "<h1>", "</h1>",
        "<", ">", "</", "<!",
    ]
    for _ in range(400):
        soup = "".join(rng.choice(atoms) for _ in range(rng.randint(1, 40)))
        fast, slow = both(soup.encode())
        assert fast == slow, f"divergence on {soup[:80]!r}"
