"""Link-graph extraction (functions/links.py): href extraction,
RFC 3986-scoped resolution, edge canonicalization, host projection,
fixed-k PageRank."""

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.links import (
    extract_hrefs,
    host_degrees,
    host_graph,
    host_pagerank,
    page_links,
    resolve_href,
)

BASE = "https://a.com/dir/sub/page.html?x=1"

RESOLVE_CASES = [
    ("https://b.com/abs", "https://b.com/abs"),  # absolute passthrough
    ("//b.com/p", "https://b.com/p"),  # scheme-relative
    ("/rooted", "https://a.com/rooted"),  # root-relative
    ("sibling.html", "https://a.com/dir/sub/sibling.html"),  # relative
    ("./same", "https://a.com/dir/sub/same"),  # ./ collapse
    ("../up", "https://a.com/dir/up"),  # ../ collapse
    ("../../up2", "https://a.com/up2"),  # two levels
    ("../../../over", "https://a.com/over"),  # over-pop clamps at root
    ("?y=2", "https://a.com/dir/sub/page.html?y=2"),  # query-only
    ("x#frag", "https://a.com/dir/sub/x"),  # fragment never survives
    ("rel?q=1", "https://a.com/dir/sub/rel?q=1"),  # relative with query
]


def test_resolve_href_cases(spark):
    df = spark.createDataFrame(
        [(i, BASE, h) for i, (h, _) in enumerate(RESOLVE_CASES)],
        "i long, base string, href string",
    )
    got = {
        r["i"]: r["u"]
        for r in df.select(
            "i", resolve_href("base", "href").alias("u")
        ).collect()
    }
    for i, (h, want) in enumerate(RESOLVE_CASES):
        assert got[i] == want, f"{h!r}: {got[i]!r} != {want!r}"
    # non-absolute base -> null
    rel = spark.createDataFrame([("not-a-url", "x")], "base string, href string")
    assert rel.select(resolve_href("base", "href").alias("u")).first()["u"] is None


HTML = (
    '<p>text <a href="/a">one</a> <A HREF=\'b.html\'>two</A>'
    '<a class="x" href="https://ext.com/p">three</a>'
    '<a href="#frag">skip</a><a href="javascript:void(0)">skip</a>'
    '<a href="mailto:x@y.z">skip</a><a href="">skip</a></p>'
)


def test_extract_hrefs_filters_and_case(spark):
    pages = spark.createDataFrame(
        [("https://a.com/d/p", HTML)], "url string, html string"
    )
    got = sorted(r["href"] for r in extract_hrefs(pages).collect())
    assert got == ["/a", "b.html", "https://ext.com/p"]


def test_page_links_canonical_dedup_no_self_loops(spark):
    pages = spark.createDataFrame(
        [
            (
                "HTTPS://A.COM:443/d/p",
                '<a href="/a">x</a><a href="/a/">dup-after-canon</a>'
                '<a href="/d/p">self</a><a href="//B.com/q?utm_source=s">ext</a>',
            )
        ],
        "url string, html string",
    )
    got = sorted(
        (r["src"], r["dst"]) for r in page_links(pages).collect()
    )
    assert got == [
        ("https://a.com/d/p", "https://a.com/a"),
        ("https://a.com/d/p", "https://b.com/q"),
    ]


def _hg(spark):
    edges = spark.createDataFrame(
        [
            ("https://a.com/1", "https://b.com/1"),
            ("https://a.com/2", "https://b.com/2"),  # same host pair
            ("https://b.com/1", "https://c.com/1"),
            ("https://c.com/1", "https://a.com/1"),
            ("https://a.com/1", "https://a.com/2"),  # intra-host: dropped
        ],
        "src string, dst string",
    )
    return host_graph(edges)


def test_host_graph_and_degrees(spark):
    hg = _hg(spark)
    assert sorted(map(tuple, hg.collect())) == [
        ("a.com", "b.com"),
        ("b.com", "c.com"),
        ("c.com", "a.com"),
    ]
    degs = {r["host"]: (r["out_degree"], r["in_degree"]) for r in host_degrees(hg).collect()}
    assert degs == {"a.com": (1, 1), "b.com": (1, 1), "c.com": (1, 1)}


def test_pagerank_ring_uniform_and_star_ordering(spark):
    # 3-ring: symmetric -> uniform 1/3 at any k
    pr = {r["host"]: r["pagerank"] for r in host_pagerank(_hg(spark), k=5).collect()}
    for v in pr.values():
        assert abs(v - 1 / 3) < 1e-9
    # DAG a->{b,c}, b->c: authority accumulates downstream; c is
    # dangling so its mass leaks (documented scope) but its rank still
    # dominates. Monotone convergence -> no iteration-parity wobble.
    dag = host_graph(
        spark.createDataFrame(
            [
                ("https://a.com/p", "https://b.com/p"),
                ("https://a.com/p", "https://c.com/p"),
                ("https://b.com/p", "https://c.com/p"),
            ],
            "src string, dst string",
        )
    )
    pr2 = {r["host"]: r["pagerank"] for r in host_pagerank(dag, k=10).collect()}
    assert pr2["c.com"] > pr2["b.com"] > pr2["a.com"]
    # a receives nothing: exactly the teleport floor
    assert abs(pr2["a.com"] - 0.15 / 3) < 1e-12
    with pytest.raises(ValueError, match="k must be"):
        host_pagerank(dag, k=0)


def test_python_resolver_matches_column_form(spark):
    """resolve_href_py (the kernel twin) is contract-identical to the
    resolve_href Column form across the golden cases + a null base."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.links import (
        resolve_href_py,
    )

    rows = [(i, BASE, h) for i, (h, _) in enumerate(RESOLVE_CASES)]
    rows.append((len(rows), "no-scheme", "x/y"))
    rows.append((len(rows), "https://a.com", ""))  # empty href, rootless base
    df = spark.createDataFrame(rows, "i long, base string, href string")
    col_form = {
        r["i"]: r["u"]
        for r in df.select("i", resolve_href("base", "href").alias("u")).collect()
    }
    py_form = {i: resolve_href_py(b, h) for i, b, h in rows}
    assert py_form == col_form
