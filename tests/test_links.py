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
    # query containing '?': split at the FIRST '?' (RFC 3986 — later
    # '?' are literal query chars); the r13-advice divergence where the
    # Column form cut at the LAST '?' is pinned closed here
    ("rel?next=/s?q=1", "https://a.com/dir/sub/rel?next=/s?q=1"),
    ("../p?a=1?b=2", "https://a.com/dir/p?a=1?b=2"),  # multi-'?' + dot-pop
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


def test_pagerank_dangling_redistribution(spark):
    """dangling='redistribute' conserves total rank at 1.0 where the
    droppable form leaks it; on a dangling-free graph the two forms
    are identical; an unknown mode raises."""
    # DAG a->{b,c}, b->c: c is dangling
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
    dropped = {r["host"]: r["pagerank"] for r in host_pagerank(dag, k=10).collect()}
    redist = {
        r["host"]: r["pagerank"]
        for r in host_pagerank(dag, k=10, dangling="redistribute").collect()
    }
    assert sum(dropped.values()) < 0.999  # the leak is real
    assert abs(sum(redist.values()) - 1.0) < 1e-9  # conservation
    assert redist["c.com"] > redist["b.com"] > redist["a.com"]
    # a's floor now includes the redistributed share: strictly above
    # the teleport floor the droppable form pins it to
    assert redist["a.com"] > dropped["a.com"]
    # ring has no dangling host: forms identical
    ring = _hg(spark)
    a = sorted(map(tuple, host_pagerank(ring, k=5).collect()))
    b = sorted(map(tuple, host_pagerank(ring, k=5, dangling="redistribute").collect()))
    assert a == b
    with pytest.raises(ValueError, match="dangling"):
        host_pagerank(dag, k=2, dangling="nope")


def test_url_link_authority_distinct_host_votes(spark):
    """Per-URL authority = sum of DISTINCT linking hosts' rank: a
    thousand pages from one host are one recommendation; URLs linked
    by nobody in the rank table simply don't appear."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.links import (
        url_link_authority,
    )

    edges = spark.createDataFrame(
        [
            ("https://a.com/1", "https://t.com/x"),
            ("https://a.com/2", "https://t.com/x"),  # same host: one vote
            ("https://b.com/1", "https://t.com/x"),
            ("https://b.com/1", "https://t.com/y"),
            ("https://ghost.com/1", "https://t.com/z"),  # unranked src
        ],
        "src string, dst string",
    )
    ranks = spark.createDataFrame(
        [("a.com", 0.5), ("b.com", 0.25)], "host string, pagerank double"
    )
    got = {
        r["url"]: r["priority"]
        for r in url_link_authority(edges, ranks).collect()
    }
    assert got == {
        "https://t.com/x": 0.75,
        "https://t.com/y": 0.25,
    }


def test_fetch_schedule_priority_orders_waves(spark):
    """fetch_schedule(priority=...): within-host waves go priority
    DESC (nulls last, URL on ties); wave spacing (fetch_at) is
    untouched; the bytewise default survives when no table is given."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.robots import (
        fetch_schedule,
    )

    frontier = spark.createDataFrame(
        [("https://h.com/a",), ("https://h.com/b",), ("https://h.com/c",),
         ("https://h.com/d",), ("https://other.com/x",)],
        "url string",
    )
    delays = spark.createDataFrame([("h.com", 2.0)], "host string, crawl_delay double")
    prio = spark.createDataFrame(
        # /c outranks /b outranks /a; /d unscored -> last; tie b==b2 n/a
        [("https://h.com/a", 0.1), ("https://h.com/b", 0.5), ("https://h.com/c", 0.9)],
        "url string, priority double",
    )
    out = fetch_schedule(frontier, delays, priority=prio)
    got = {r["url"]: (r["wave"], r["fetch_at"]) for r in out.collect()}
    assert got["https://h.com/c"] == (0, 0.0)
    assert got["https://h.com/b"] == (1, 2.0)
    assert got["https://h.com/a"] == (2, 4.0)
    assert got["https://h.com/d"] == (3, 6.0)  # unscored: after all scored
    assert got["https://other.com/x"] == (0, 0.0)  # spacing per host only
    # bad priority table shape is loud
    with pytest.raises(ValueError, match="priority"):
        fetch_schedule(frontier, delays, priority=frontier)
    # default (no priority): bytewise waves unchanged
    base = fetch_schedule(frontier, delays)
    got2 = {r["url"]: r["wave"] for r in base.collect()}
    assert got2["https://h.com/a"] == 0 and got2["https://h.com/d"] == 3


def test_resolver_twins_fuzz_parity(spark):
    """Seeded structured fuzz for the RFC 3986 resolver twins: random
    absolute bases × every href shape (absolute, scheme-relative,
    rooted, relative with arbitrary dot-segments, query-only,
    fragment-heavy, multi-'?', empty) — the Column form and the
    Python twin (the page_links kernel path) must agree everywhere."""
    import random

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.links import (
        resolve_href_py,
    )

    rng = random.Random(823)
    bases = [
        "https://a.com/d/s/p.html?x=1",
        "http://B.org:8080/one/two/",
        "https://h.io",
        "https://h.io/?q=2",
        "ftp://f.net/a/b/c",
    ]
    seg = ["x", ".", "..", "p q", "y\nz", ""]
    hrefs = ["", "#only", "?q=1?r=2", "//other.com/p", "https://abs.example/q?a=1#f"]
    for _ in range(120):
        parts = "/".join(rng.choice(seg) for _ in range(rng.randrange(1, 6)))
        lead = rng.choice(["/", "./", "../", "../../", ""])
        tail = rng.choice(["", "?a=1", "?a=1?b=2", "#f", "?x=2#f", "/"])
        hrefs.append(f"{lead}{parts}{tail}")
    rows = [
        (i, rng.choice(bases), h) for i, h in enumerate(hrefs)
    ]
    df = spark.createDataFrame(rows, "i long, base string, href string")
    col_form = {
        r["i"]: r["u"]
        for r in df.select("i", resolve_href("base", "href").alias("u")).collect()
    }
    for i, b, h in rows:
        py = resolve_href_py(b, h)
        assert col_form[i] == py, (
            f"divergence: base={b!r} href={h!r}: column={col_form[i]!r} py={py!r}"
        )


def test_page_anchor_texts_and_index(spark):
    """Anchor extraction goldens: nested tags strip, whitespace
    collapses, unterminated anchors yield no row, non-navigational
    schemes and self-links drop, and the index counts DISTINCT hosts
    (one host repeating an anchor is one vote) while empty anchors
    drop."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.links import (
        anchor_text_index,
        page_anchor_texts,
    )

    pages = spark.createDataFrame(
        [
            (
                "https://a.com/p1",
                '<a href="/t"><b>Bold</b>  link\ntext</a>'
                '<a href="/img"><img src="x.png"/></a>'
                '<a href="mailto:x@y.z">mail</a>'
                '<a href="/p1">self</a>'
                '<a href="/unterminated">no close',
            ),
            ("https://a.com/p2", '<a href="/t">Bold link text</a>'),
            ("https://b.com/q", '<A HREF="https://a.com/t">other words</A>'),
        ],
        "url string, html string",
    )
    links = {
        (r["src"], r["dst"], r["anchor"])
        for r in page_anchor_texts(pages).collect()
    }
    assert links == {
        ("https://a.com/p1", "https://a.com/t", "Bold link text"),
        ("https://a.com/p1", "https://a.com/img", ""),
        ("https://a.com/p2", "https://a.com/t", "Bold link text"),
        ("https://b.com/q", "https://a.com/t", "other words"),
    }
    idx = {
        (r["dst"], r["anchor"]): r["n_hosts"]
        for r in anchor_text_index(page_anchor_texts(pages)).collect()
    }
    # a.com's two pages = ONE host vote; b.com adds its own anchor row;
    # the empty image anchor is gone
    assert idx == {
        ("https://a.com/t", "Bold link text"): 1,
        ("https://a.com/t", "other words"): 1,
    }


def test_pagerank_checkpoint_cadence_value_invariant(spark):
    """Round-15 optimization contract: ckpt_every changes where
    lineage is cut, never the ranks — every cadence must produce
    bit-identical values in BOTH dangling modes."""
    dag = spark.createDataFrame(
        [("a.com", "b.com"), ("a.com", "c.com"), ("b.com", "c.com")],
        "src_host string, dst_host string",
    )
    for mode in ("drop", "redistribute"):
        base = sorted(
            map(tuple, host_pagerank(dag, k=7, dangling=mode).collect())
        )
        for ck in (1, 2, 7, 100):
            got = sorted(
                map(
                    tuple,
                    host_pagerank(
                        dag, k=7, dangling=mode, ckpt_every=ck
                    ).collect(),
                )
            )
            assert got == base, (mode, ck)
