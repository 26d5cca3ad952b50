"""Boilerplate-aware main-content extraction
(functions.text.html_main_content): link-density block gating on a
nav-heavy fixture page, edge cases, and Spark/DuckDB twin parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.text import (
    MAX_LINK_DENSITY,
    MIN_BLOCK_CHARS,
    html_main_content,
    html_main_content_sql,
    html_to_text,
)

NAV_HEAVY_PAGE = """<html><head><title>Widget Review</title>
<style>a{color:blue}</style></head><body>
<nav><ul><li><a href="/">Home</a></li><li><a href="/news">News</a></li>
<li><a href="/about">About Us</a></li><li><a href="/contact">Contact</a></li></ul></nav>
<div class="breadcrumb"><a href="/">Home</a> &gt; <a href="/reviews">Reviews</a> &gt; Widget</div>
<article><h1>The Widget 3000 reviewed in depth</h1>
<p>The Widget 3000 performs admirably under sustained load, and its firmware
improves on the <a href="/w2000">previous generation</a> in every measurable way.</p>
<p>Battery life exceeds twelve hours of continuous use, which is remarkable
for a device in this price class &amp; weight category.</p></article>
<aside><h3>Related</h3><ul><li><a href="/a">Widget 2000 long review</a></li>
<li><a href="/b">Best widgets of 2024 list</a></li><li><a href="/c">Widget buying guide now</a></li></ul></aside>
<footer><a href="/tos">Terms</a> | <a href="/privacy">Privacy</a> | <a href="/sitemap">Sitemap</a></footer>
<script>track();</script><!-- analytics --></body></html>"""

EDGE_PAGES = [
    NAV_HEAVY_PAGE,
    "plain text with no markup that is long enough to keep around here",
    "",
    '<div><a href="x">one link</a><a href="y">two link</a></div>',
    # boundary: block exactly at MIN_BLOCK_CHARS with zero links survives
    "<p>" + "x" * MIN_BLOCK_CHARS + "</p><p>" + "y" * (MIN_BLOCK_CHARS - 1) + "</p>",
]


def _extract(spark, pages):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pages)], "i int, html string"
    )
    return {
        r["i"]: r["t"]
        for r in df.select("i", html_main_content("html").alias("t")).collect()
    }


def test_nav_heavy_page_keeps_article_only(spark):
    out = _extract(spark, [NAV_HEAVY_PAGE])[0]
    # article prose survives, including the paragraph containing a
    # low-density inline link
    assert "performs admirably under sustained load" in out
    assert "previous generation" in out
    assert "Battery life exceeds twelve hours" in out
    assert "price class & weight category" in out  # entity decoded
    assert out.startswith("The Widget 3000 reviewed in depth")
    # navigation chrome is gone: nav, breadcrumb, sidebar, footer, title
    for boilerplate in (
        "About Us", "Contact", "Reviews", "Widget 2000", "buying guide",
        "Terms", "Privacy", "Sitemap", "Widget Review", "track();",
    ):
        assert boilerplate not in out, boilerplate
    # the plain tag strip, by contrast, keeps all of it (the gate is
    # what separates the two operators)
    plain = spark.createDataFrame([(NAV_HEAVY_PAGE,)], "html string").select(
        html_to_text("html").alias("t")
    ).collect()[0]["t"]
    assert "About Us" in plain and "Sitemap" in plain


def test_edge_cases(spark):
    out = _extract(spark, EDGE_PAGES)
    assert out[1] == EDGE_PAGES[1]  # blockless text passes through whole
    assert out[2] == ""
    assert out[3] == ""  # all-anchor block dies on density
    assert out[4] == "x" * MIN_BLOCK_CHARS  # >= keeps, < drops


def test_duckdb_twin_parity(spark):
    got = _extract(spark, EDGE_PAGES)
    con = duckdb.connect()
    con.execute("CREATE TABLE p(i INT, html VARCHAR)")
    con.executemany(
        "INSERT INTO p VALUES (?,?)", [(i, p) for i, p in enumerate(EDGE_PAGES)]
    )
    want = dict(
        con.execute(f"SELECT i, {html_main_content_sql('html')} FROM p").fetchall()
    )
    assert got == want


def test_density_constant_is_the_gate(spark):
    # a block whose anchor share sits just above the threshold dies;
    # just below survives — the shared constants are load-bearing
    n_anchor = 30
    lo_pad = int(n_anchor / MAX_LINK_DENSITY - n_anchor) + 2
    hi_pad = max(int(n_anchor / MAX_LINK_DENSITY - n_anchor) - 2, 0)
    anchor = '<a href="/l">' + "a" * n_anchor + "</a>"
    lo = f"<p>{anchor}{'b' * lo_pad}</p>"   # density < MAX
    hi = f"<p>{anchor}{'b' * hi_pad}</p>"   # density > MAX
    out = _extract(spark, [lo, hi])
    assert out[0] != ""
    assert out[1] == ""
