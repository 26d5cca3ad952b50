"""Sitemap discovery (functions/sitemap.py): urlset/index extraction,
entity unescape, one-level recursion, robots gating, lastmod merge."""

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.sitemap import (
    sitemap_index_children,
    sitemap_page_entries,
    sitemap_seed_table,
    xml_unescape,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://a.com/p/1?x=1&amp;y=2</loc>
    <lastmod>2024-03-01</lastmod>
  </url>
  <url><loc> https://a.com/p/2 </loc></url>
  <url><priority>0.5</priority></url>
</urlset>
"""

INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap>
    <loc>https://b.com/maps/child-1.xml</loc>
    <lastmod>2024-01-01T00:00:00Z</lastmod>
  </sitemap>
  <sitemap><loc>https://b.com/maps/child-2.xml</loc></sitemap>
</sitemapindex>
"""

CHILD1 = "<urlset><url><loc>https://b.com/x</loc><lastmod>2024-05-05</lastmod></url></urlset>"
CHILD2 = "<urlset><url><loc>https://b.com/y/</loc></url></urlset>"


def test_page_entries_extraction_and_unescape(spark):
    df = spark.createDataFrame(
        [("https://a.com/sitemap.xml", URLSET)], "url string, body string"
    )
    got = {
        r["loc"]: r["lastmod"] for r in sitemap_page_entries(df).collect()
    }
    # entity-unescaped loc, whitespace-trimmed loc, loc-less entry dropped
    assert got == {
        "https://a.com/p/1?x=1&y=2": "2024-03-01",
        "https://a.com/p/2": None,
    }


def test_index_children_and_non_index_zero_rows(spark):
    df = spark.createDataFrame(
        [
            ("https://b.com/sitemap.xml", INDEX),
            ("https://a.com/sitemap.xml", URLSET),  # not an index
        ],
        "url string, body string",
    )
    got = sitemap_index_children(df).collect()
    assert {r["child_url"] for r in got} == {
        "https://b.com/maps/child-1.xml",
        "https://b.com/maps/child-2.xml",
    }
    assert all(r["url"] == "https://b.com/sitemap.xml" for r in got)


def test_xml_unescape_double_escape_order(spark):
    df = spark.createDataFrame([("a&amp;lt;b&amp;amp;c&lt;d",)], "s string")
    # &amp; unescaped LAST: '&amp;lt;' -> '&lt;' (NOT '<')
    assert (
        df.select(xml_unescape("s").alias("u")).first()["u"]
        == "a&lt;b&amp;c<d"
    )


def _seed_fixture(spark):
    robots = spark.createDataFrame(
        [
            (
                "a.com",
                "User-agent: *\nDisallow: /private/\n"
                "Sitemap: https://a.com/sitemap.xml\n",
            ),
            ("b.com", "# seeds only\nSitemap: https://b.com/sitemap.xml\n"),
            ("c.com", "User-agent: *\nDisallow: /\n"),  # no sitemap
        ],
        "host string, body string",
    )
    bodies = spark.createDataFrame(
        [
            (
                "https://a.com/sitemap.xml",
                "<urlset>"
                "<url><loc>https://a.com/p/1?b=2&amp;a=1</loc>"
                "<lastmod>2024-03-01</lastmod></url>"
                "<url><loc>https://a.com/private/x</loc></url>"
                "<url><loc>HTTPS://A.COM:443/p/1?a=1&amp;b=2</loc>"
                "<lastmod>2024-06-01</lastmod></url>"
                "</urlset>",
            ),
            ("https://b.com/sitemap.xml", INDEX.replace("b.com/maps", "b.com/m")),
            ("https://b.com/m/child-1.xml", CHILD1),
            ("https://b.com/m/child-2.xml", CHILD2),
        ],
        "url string, body string",
    )
    return robots, bodies


def test_seed_table_recursion_canon_and_lastmod_merge(spark):
    robots, bodies = _seed_fixture(spark)
    got = {
        (r["host"], r["url"]): r["lastmod"]
        for r in sitemap_seed_table(robots, bodies).collect()
    }
    # a.com: the two spellings of /p/1 collapse to ONE canonical seed,
    # max lastmod wins; /private/x present (no rules passed)
    # b.com: entries come only through the index's children, child-2's
    # trailing slash canonicalized away
    assert got == {
        ("a.com", "https://a.com/p/1?a=1&b=2"): "2024-06-01",
        ("a.com", "https://a.com/private/x"): None,
        ("b.com", "https://b.com/x"): "2024-05-05",
        ("b.com", "https://b.com/y"): None,
    }


def test_seed_table_robots_gate(spark):
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.robots import (
        parse_robots_rules,
    )

    robots, bodies = _seed_fixture(spark)
    rules = parse_robots_rules(robots)
    got = {
        (r["host"], r["url"])
        for r in sitemap_seed_table(robots, bodies, robots_rules=rules).collect()
    }
    # the sitemap advertises /private/x but robots forbids it: gated out
    assert got == {
        ("a.com", "https://a.com/p/1?a=1&b=2"),
        ("b.com", "https://b.com/x"),
        ("b.com", "https://b.com/y"),
    }


def test_parse_w3c_datetime_scope(spark):
    """Date-only and UTC forms parse; non-UTC offsets are null by
    documented scope (conservative for the recrawl consumer)."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.sitemap import (
        parse_w3c_datetime,
    )

    rows = [
        ("2024-06-03", "2024-06-03 00:00:00"),
        ("2024-06-03T06:30:00Z", "2024-06-03 06:30:00"),
        ("2024-06-03T06:30:00.250Z", "2024-06-03 06:30:00.250000"),
        # any 1-9 fractional digits parse (normalized to micros) — a
        # fixed .SSS pattern silently NULLed these valid W3C forms and
        # the page was never recrawled (r14 advice)
        ("2024-06-03T06:30:00.25Z", "2024-06-03 06:30:00.250000"),
        ("2024-06-03T06:30:00.1Z", "2024-06-03 06:30:00.100000"),
        ("2024-06-03T06:30:00.123456Z", "2024-06-03 06:30:00.123456"),
        ("2024-06-03T06:30:00.123456789Z", "2024-06-03 06:30:00.123456"),
        ("2024-06-03T06:30:00.Z", None),
        ("2024-06-03T06:30:00+02:00", None),
        ("not a date", None),
        (None, None),
    ]
    df = spark.createDataFrame([(i, r) for i, (r, _) in enumerate(rows)], "i long, lm string")
    got = {
        r["i"]: (str(r["ts"]) if r["ts"] is not None else None)
        for r in df.select("i", parse_w3c_datetime("lm").alias("ts")).collect()
    }
    assert got == {i: want for i, (_, want) in enumerate(rows)}


def test_recrawl_candidates_freshness_edges(spark):
    """Strictly-newer lastmod triggers; same-instant does not; absent
    or unparseable claims never do; unfetched URLs are not recrawl
    candidates."""
    from pyspark.sql import functions as F

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.sitemap import (
        recrawl_candidates,
    )

    seeds = spark.createDataFrame(
        [
            ("h.example", "https://h.example/newer", "2024-06-20"),
            ("h.example", "https://h.example/same", "2024-06-15"),
            ("h.example", "https://h.example/sameday-tz", "2024-06-15T01:00:00Z"),
            ("h.example", "https://h.example/older", "2024-06-01"),
            ("h.example", "https://h.example/noclaim", None),
            ("h.example", "https://h.example/offset", "2024-06-20T10:00:00+02:00"),
            ("h.example", "https://h.example/unfetched", "2024-06-20"),
        ],
        "host string, url string, lastmod string",
    )
    fetched = spark.createDataFrame(
        [(u,) for u in (
            "https://h.example/newer", "https://h.example/same",
            "https://h.example/sameday-tz", "https://h.example/older",
            "https://h.example/noclaim", "https://h.example/offset",
        )],
        "canonical_url string",
    ).withColumn("fetched_at", F.to_timestamp(F.lit("2024-06-15 00:00:00")))
    got = {r["url"] for r in recrawl_candidates(fetched, seeds).collect()}
    assert got == {
        "https://h.example/newer",
        "https://h.example/sameday-tz",  # 01:00Z beats the midnight fetch
    }


def test_seed_table_child_declared_by_two_hosts(spark):
    """Round-15 optimization contract: carrying the declaring host
    through the explodes (instead of re-joining it afterwards) must
    keep the deduped seed set identical when the SAME child sitemap is
    declared by index files on TWO hosts — each host keeps its own
    seed row, exactly once."""
    robots = spark.createDataFrame(
        [
            ("a.com", "Sitemap: https://cdn.example/shared-index.xml"),
            ("b.com", "Sitemap: https://cdn.example/shared-index.xml"),
        ],
        "host string, body string",
    )
    index_body = (
        '<?xml version="1.0"?><sitemapindex>'
        "<sitemap><loc>https://cdn.example/child.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    child_body = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>https://site.example/page</loc>"
        "<lastmod>2024-03-01</lastmod></url>"
        "</urlset>"
    )
    bodies = spark.createDataFrame(
        [
            ("https://cdn.example/shared-index.xml", index_body),
            ("https://cdn.example/child.xml", child_body),
        ],
        "url string, body string",
    )
    rows = sitemap_seed_table(robots, bodies).collect()
    got = sorted((r["host"], r["url"], r["lastmod"]) for r in rows)
    assert got == [
        ("a.com", "https://site.example/page", "2024-03-01"),
        ("b.com", "https://site.example/page", "2024-03-01"),
    ]
