"""URL canonicalization (functions/url.py) — the web-crawl dedup key."""

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.url import (
    canonicalize_url,
    url_host,
)

CASES = [
    # (raw, canonical)
    ("HTTP://WWW.Example.COM:80/A/b?b=2&a=1#frag", "http://www.example.com/A/b?a=1&b=2"),
    ("https://x.org:443/", "https://x.org/"),
    ("https://x.org:8443/p", "https://x.org:8443/p"),  # non-default port kept
    ("http://x.org/a/", "http://x.org/a"),  # trailing slash off non-root
    ("http://x.org/", "http://x.org/"),  # root slash kept
    ("http://x.org", "http://x.org/"),  # empty path -> root
    ("http://x.org/p?utm_source=a&utm_medium=b", "http://x.org/p"),
    ("http://x.org/p?gclid=Z&keep=1&fbclid=Q", "http://x.org/p?keep=1"),
    ("http://x.org/CaseSensitive/Path", "http://x.org/CaseSensitive/Path"),
    ("http://x.org/p?z=1&a=2&m=3", "http://x.org/p?a=2&m=3&z=1"),  # sorted
    ("/relative/path?x=1", "/relative/path?x=1"),  # no scheme: passthrough
    ("not a url at all", "not a url at all"),
]


def test_canonicalize_url(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i long, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonicalize_url("url").alias("c")).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_url_host(spark):
    df = spark.createDataFrame(
        [(0, "HTTPS://Sub.Example.COM:8080/p?q=1")], "i long, url string"
    )
    assert df.select(url_host("url").alias("h")).first()["h"] == "sub.example.com"


def test_canonical_is_idempotent(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i long, url string"
    )
    once = df.select("i", canonicalize_url("url").alias("u"))
    twice = once.select("i", canonicalize_url("u").alias("u"))
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_both_forms_agree_on_newline_fragment(spark):
    """The Column form and the staged form share one contract — the
    r12-advice divergence (regex '#.*$' kept a fragment containing a
    newline; substring_index strips it) is closed: both now cut at the
    first '#' regardless of control characters."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.url import (
        with_canonical_url,
    )

    df = spark.createDataFrame(
        [(0, "http://x.org/p#frag\nmore"), (1, "http://x.org/p#plain")],
        "i long, url string",
    )
    col_form = {
        r["i"]: r["c"]
        for r in df.select("i", canonicalize_url("url").alias("c")).collect()
    }
    staged = {
        r["i"]: r["canonical_url"]
        for r in with_canonical_url(df).select("i", "canonical_url").collect()
    }
    assert col_form == staged == {0: "http://x.org/p", 1: "http://x.org/p"}


def test_all_forms_agree_on_newline_path_and_query(spark):
    """r13-advice: a '\\n' in the path or query made the Column form's
    anchored '(.*)$' regexes unmatchable (path collapsed to '/', query
    dropped) and made the Python twin's scheme-split regex fail
    entirely (raw pass-through) — while the staged form canonicalized
    normally. All three now share (?s)/substring semantics; newline
    URLs are reachable via extracted hrefs ([^\"']* crosses newlines)
    and takedowns canonicalized by the Column form must hit frontier
    rows written by the staged form."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.url import (
        canonicalize_url_py,
        with_canonical_url,
    )

    raws = [
        "HTTP://X.org:80/a\nb?q=1",  # newline in path
        "http://x.org/p?q=\n1&a=2",  # newline in query value
        "http://x.org/a\nb/?z=1&q=\n2#f\nrag",  # both + newline fragment
    ]
    want = [
        "http://x.org/a\nb?q=1",
        "http://x.org/p?a=2&q=\n1",
        "http://x.org/a\nb?q=\n2&z=1",
    ]
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(raws)], "i long, url string"
    )
    col_form = {
        r["i"]: r["c"]
        for r in df.select("i", canonicalize_url("url").alias("c")).collect()
    }
    staged = {
        r["i"]: r["canonical_url"]
        for r in with_canonical_url(df).select("i", "canonical_url").collect()
    }
    py_form = {i: canonicalize_url_py(r) for i, r in enumerate(raws)}
    assert col_form == staged == py_form == dict(enumerate(want))


def test_with_canonical_url_output_collision_raises(spark):
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.url import (
        with_canonical_url,
    )

    df = spark.createDataFrame(
        [("http://x.org/p", "already")], "url string, canonical_url string"
    )
    with pytest.raises(ValueError, match="canonical_url"):
        with_canonical_url(df)
    with pytest.raises(ValueError, match="'host'"):
        with_canonical_url(df.drop("canonical_url").withColumn("host", F.lit("h")), host_col="host")


def test_python_canonicalizer_matches_column_form(spark):
    """canonicalize_url_py (the kernel twin used by the link-graph
    kernel) is contract-identical to the Column form on the golden
    cases plus the newline-fragment and idempotence probes."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.url import (
        canonicalize_url_py,
    )

    raws = [raw for raw, _ in CASES] + ["http://x.org/p#frag\nmore"]
    df = spark.createDataFrame([(i, r) for i, r in enumerate(raws)], "i long, url string")
    col_form = {
        r["i"]: r["c"]
        for r in df.select("i", canonicalize_url("url").alias("c")).collect()
    }
    py_form = {i: canonicalize_url_py(r) for i, r in enumerate(raws)}
    assert py_form == col_form
    assert canonicalize_url_py(None) is None
    for r in raws:
        once = canonicalize_url_py(r)
        assert canonicalize_url_py(once) == once


def test_url_trap_signals_and_host_profile(spark):
    """Per-URL trap features (depth, max repeated segment, params)
    and the per-host blocklist flag at the 30% share threshold."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.url import (
        host_trap_profile,
        url_trap_signals,
    )

    urls = [
        # calendar loop: 'ev' x5 -> trap by repeat
        ("https://t.example/cal/ev/ev/ev/ev/ev", (6, 5, 0)),
        # faceted explosion: 9 params -> trap by params
        ("https://t.example/q?" + "&".join(f"k{i}=v" for i in range(9)), (1, 1, 9)),
        ("https://t.example/dir1/page2", (2, 1, 0)),  # normal
        ("https://t.example/", (0, 0, 0)),  # root
        ("https://ok.example/a/b?x=1#frag", (2, 1, 1)),  # fragment off
    ]
    df = spark.createDataFrame([(u,) for u, _ in urls], "url string")
    sig = {
        r["url"]: (r["path_depth"], r["max_segment_repeat"], r["n_params"])
        for r in url_trap_signals(df).collect()
    }
    assert sig == dict(urls)
    prof = {
        r["host"]: (r["n_urls"], r["n_trap_urls"], r["trap_host"])
        for r in host_trap_profile(df).collect()
    }
    # t.example: 2 trap URLs of 4 (50% > 30%) -> flagged; ok.example clean
    assert prof == {"t.example": (4, 2, 1), "ok.example": (1, 0, 0)}


def test_canonicalizer_twins_fuzz_parity(spark):
    """Seeded structured fuzz over the canonicalizer's full input
    surface — schemes (valid/invalid/case), hosts, ports, deep and
    dotted paths, multi-'?'/multi-'#' tails, tracking params, '\\n'
    and '%' and unicode in every slot — asserting the Column form,
    the staged form, and the Python twin agree on EVERY input. The
    goldens pin intent; this pins the long tail."""
    import random

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.url import (
        canonicalize_url_py,
        with_canonical_url,
    )

    rng = random.Random(1404)
    schemes = ["http", "HTTP", "https", "HtTpS", "ftp", "a+b-c.d", "9bad", ""]
    hosts = ["Ex.COM", "x.org:80", "X.ORG:443", "h.io:8080", "h\nost.com", "café.example", ""]
    segs = ["a", "B", ".", "..", "p%20q", "s\nt", "ss", "über", ""]
    tails = ["", "?", "?a=1", "?utm_source=x", "?b=2&a=1&a=0", "?q=a?b", "?x=\n1",
             "#f", "#f#g", "#f\ng", "?gclid=1&keep=2#z"]

    def mk():
        s = rng.choice(schemes)
        sep = rng.choice(["://", ":/", "//", ""]) if rng.random() < 0.2 else "://"
        path = "/".join(rng.choice(segs) for _ in range(rng.randrange(0, 5)))
        lead = rng.choice(["/", ""])
        trail = rng.choice(["/", ""])
        return f"{s}{sep}{rng.choice(hosts)}{lead}{path}{trail}{rng.choice(tails)}"

    raws = [mk() for _ in range(400)]
    df = spark.createDataFrame([(i, r) for i, r in enumerate(raws)], "i long, url string")
    col_form = {
        r["i"]: r["c"]
        for r in df.select("i", canonicalize_url("url").alias("c")).collect()
    }
    staged = {
        r["i"]: r["canonical_url"]
        for r in with_canonical_url(df).select("i", "canonical_url").collect()
    }
    for i, raw in enumerate(raws):
        py = canonicalize_url_py(raw)
        assert col_form[i] == staged[i] == py, (
            f"divergence on {raw!r}: column={col_form[i]!r} "
            f"staged={staged[i]!r} py={py!r}"
        )
        # idempotence holds for every fuzzed input too
        assert canonicalize_url_py(py) == py, f"non-idempotent on {raw!r}"
