"""Link-graph extraction — the authority/quality-prior side of the
crawl front end.

A crawl does three things with the pages it fetches: index their text
(the ingest funnel), discover new URLs (sitemaps + the hrefs here),
and score hosts (link authority feeds crawl prioritization and spam
filtering — Common Crawl publishes exactly this as its host-level
ranking). This module gives the DataFrame form:

- :func:`extract_hrefs` — page HTML → one row per ``<a href>`` value,
  codegen ``regexp_extract_all`` (attribute-order tolerant, single- or
  double-quoted), non-navigational schemes (``javascript:``,
  ``mailto:``, ``tel:``, ``data:``) and pure-fragment refs dropped;
- :func:`resolve_href` — RFC 3986 reference resolution. Documented
  scope (the DuckDB oracle in ``queries.web_queries`` derives its
  expectations from the planted fixture's arithmetic; the generic
  resolver is pinned by unit goldens): absolute URLs pass through;
  ``//authority/...`` takes the base scheme; ``/path`` roots at the
  base authority; relative paths merge onto the base path's directory
  with dot segments removed by the actual RFC 3986 §5.2.4 stack
  algorithm (arbitrary ``../`` depth, over-pops clamp at root);
  query-only (``?q``) refs replace the base query. Fragments never
  survive (the canonicalizer drops them anyway). Exists as a Column
  expression (composable) and as :func:`resolve_href_py`, the Python
  twin the scan path uses — parity pinned in ``tests/test_links.py``;
- :func:`page_links` — pages → canonicalized ``(src, dst)`` edge
  table, deduped, self-loops dropped (a page linking itself carries
  no authority signal). The resolve+canonicalize hot path runs in an
  ARROW KERNEL, not expressions — a deliberate exception to the
  codegen-first rule with a measured reason: composing the staged
  resolver chain with the staged canonicalizer chains sends Catalyst's
  project-collapsing/canonicalization super-linear (observed: 310 s of
  driver plan time and near-OOM for a ONE-row input; the plain Column
  composition survives but pays ~55 s plan time per query and ~0.1 M
  edges/s). The kernel plans in milliseconds and the per-row Python
  cost is amortized across 32 cores — measured numbers in SCALE.md
  round 13;
- :func:`host_graph` / :func:`host_degrees` /
  :func:`host_pagerank` — the host-level projection: distinct host
  edges, in/out degrees, and damped PageRank by fixed-k power
  iteration. PageRank scope: ``PR = (1-d)/N + d * Σ PR(src)/out(src)``
  with dangling mass DROPPED by default (hosts without outlinks leak
  their rank; the ranking ORDER is what the crawler consumes, and a
  recursive-CTE oracle can replay this form exactly) or REDISTRIBUTED
  uniformly per iteration (``dangling="redistribute"`` — the standard
  correction and the form behind Common Crawl's published host ranks;
  equally oracle-replayable).

Scale shape: extraction rides the page scan (codegen regexp, one
explode bounded by hrefs/page); the edge table shuffles once on the
groupBy-dedup; host projection is a second, much smaller shuffle.
PageRank iterations shuffle the EDGE table k times — at web scale
that is the canonical Spark join-loop, partitioned by src host, and k
stays single-digit (rank order stabilizes long before values).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: href schemes that are not crawlable navigation
_SKIP_SCHEMES = ("javascript:", "mailto:", "tel:", "data:")

_HREF_RX = r"""(?i)<a\s[^>]*href\s*=\s*["']([^"']*)["']"""


def extract_hrefs(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """One row per ``<a href>`` value: ``(<url_col>, href)``. Empty
    and pure-fragment refs and non-navigational schemes drop."""
    href = F.col("href")
    lower = F.lower(href)
    skip = (href == "") | href.startswith("#")
    for s in _SKIP_SCHEMES:
        skip = skip | lower.startswith(s)
    return (
        pages.select(
            F.col(url_col),
            F.explode(
                F.regexp_extract_all(F.col(html_col), F.lit(_HREF_RX), 1)
            ).alias("href"),
        )
        .filter(~skip)
    )


def _dirname(path: Column) -> Column:
    """Base path's directory per RFC 3986 §5.3 merge: everything up to
    and including the last '/' ('/' when the path has none)."""
    cut = F.length(path) - F.length(F.substring_index(path, "/", -1))
    d = F.substring(path, F.lit(1), cut)
    return F.when(d == "", F.lit("/")).otherwise(d)


def _collapse_dots(path: Column) -> Column:
    """RFC 3986 §5.2.4 remove-dot-segments as a segment-stack fold
    (higher-order ``aggregate``, no regex): ``.``/empty segments drop,
    ``..`` pops, over-pops clamp at root, arbitrary depth. The
    rebuild keeps a trailing slash when the input had one."""
    segs = F.split(path, "/")
    stack = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: (
            F.when((s == "") | (s == "."), acc)
            .when(
                s == "..",
                F.slice(acc, F.lit(1), F.greatest(F.size(acc) - 1, F.lit(0))),
            )
            .otherwise(F.concat(acc, F.array(s)))
        ),
    )
    flat = F.concat(F.lit("/"), F.array_join(stack, "/"))
    return F.when(
        path.endswith("/") & (flat != "/"), F.concat(flat, F.lit("/"))
    ).otherwise(flat)


def resolve_href(base: Column | str, href: Column | str) -> Column:
    """RFC 3986 reference resolution in the module's documented scope;
    returns the absolute URL (no fragment), or null when the base is
    not absolute. Stays pure codegen: scheme/authority/path splits are
    the same staged shapes the canonicalizer uses."""
    b = F.col(base) if isinstance(base, str) else base
    h = F.col(href) if isinstance(href, str) else href
    h = F.substring_index(h, "#", 1)  # fragments never survive
    scheme = F.regexp_extract(b, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    auth = F.regexp_extract(b, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    rest = F.regexp_extract(b, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    bpath = F.substring_index(rest, "?", 1)
    bpath = F.when(bpath == "", F.lit("/")).otherwise(bpath)
    root = F.concat(scheme, F.lit("://"), auth)

    is_abs = h.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://")
    merged = F.concat(_dirname(bpath), h)
    out = (
        F.when(h == "", F.concat(root, bpath))
        .when(is_abs, h)
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(root, _collapse_dots(h)))
        .when(h.startswith("?"), F.concat(root, bpath, h))
        .otherwise(
            F.concat(
                root,
                _collapse_dots(F.substring_index(merged, "?", 1)),
                # Query = everything from the FIRST '?' (RFC 3986: later
                # '?' are literal query characters, e.g. '?next=/s?q=1').
                # substring_index(..., -1) would cut at the LAST '?' and
                # diverge from resolve_href_py.
                F.when(
                    F.instr(merged, "?") > 0,
                    F.substring(
                        merged, F.instr(merged, "?"), F.length(merged)
                    ),
                ).otherwise(F.lit("")),
            )
        )
    )
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(out)


import re as _re

_SCHEME_RX_PY = _re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")
_BASE_RX_PY = _re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$")


def _collapse_dots_py(path: str) -> str:
    """Python twin of :func:`_collapse_dots` — same stack algorithm,
    same trailing-slash preservation."""
    stack: list[str] = []
    for seg in path.split("/"):
        if seg in ("", "."):
            continue
        if seg == "..":
            if stack:
                stack.pop()
        else:
            stack.append(seg)
    flat = "/" + "/".join(stack)
    if path.endswith("/") and flat != "/":
        flat += "/"
    return flat


def resolve_href_py(base: str | None, href: str | None) -> str | None:
    """Python twin of :func:`resolve_href` — same contract, same
    branch structure; parity pinned in ``tests/test_links.py``. Used
    by the :func:`page_links` kernel (module doc for why the scan
    path is a kernel and not expressions)."""
    if base is None or href is None:
        return None
    h = href.split("#", 1)[0]
    m = _BASE_RX_PY.match(base)
    if m is None:
        return None
    scheme, auth, rest = m.group(1), m.group(2), m.group(3)
    bpath = rest.split("?", 1)[0] or "/"
    root = f"{scheme}://{auth}"
    if h == "":
        return root + bpath
    if _SCHEME_RX_PY.match(h):
        return h
    if h.startswith("//"):
        return f"{scheme}:{h}"
    if h.startswith("/"):
        return root + _collapse_dots_py(h)
    if h.startswith("?"):
        return root + bpath + h
    cut = len(bpath) - len(bpath.rsplit("/", 1)[-1])
    mdir = bpath[:cut] or "/"
    merged = mdir + h
    qpos = merged.find("?")
    mpath, mq = (merged, "") if qpos < 0 else (merged[:qpos], merged[qpos:])
    return root + _collapse_dots_py(mpath) + mq


def page_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Pages → canonicalized, deduped ``(src, dst)`` edges, self-loops
    dropped. Src and dst share the crawl's dedup key (the URL
    canonicalizer contract), so the edge table joins cleanly against
    the frontier and the seed table.

    Shape: href extraction rides the scan as codegen (explode +
    skip-filter); resolve + canonicalize run in ONE Arrow-batched
    kernel (``resolve_href_py`` + ``canonicalize_url_py``, both
    parity-pinned twins of the Column contracts) that also drops
    null-resolution rows and self-loops before they reach the wire;
    the dedup is one JVM-side distinct shuffle. Module doc for why
    the kernel beats the expression composition here — this is the
    measured exception, not the rule."""
    from pyspark.sql import types as T

    hrefs = extract_hrefs(pages, url_col=url_col, html_col=html_col)
    schema = T.StructType(
        [T.StructField("src", T.StringType()), T.StructField("dst", T.StringType())]
    )
    ucol = url_col

    def kernel(batches):
        import pandas as pd

        from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.url import (
            canonicalize_url_py,
        )

        canon_cache: dict[str, str] = {}

        def canon_src(u):
            got = canon_cache.get(u)
            if got is None:
                got = canonicalize_url_py(u)
                canon_cache[u] = got
            return got

        for pdf in batches:
            srcs, dsts = [], []
            for base, href in zip(pdf[ucol], pdf["href"]):
                dst_raw = resolve_href_py(base, href)
                if dst_raw is None:
                    continue
                src = canon_src(base)
                dst = canonicalize_url_py(dst_raw)
                if dst != src:
                    srcs.append(src)
                    dsts.append(dst)
            yield pd.DataFrame({"src": srcs, "dst": dsts})

    return hrefs.mapInPandas(kernel, schema=schema).distinct()


#: full <a> elements: href value (group 1) and inner content (group 2)
_ANCHOR_RX = r"""(?is)<a\s[^>]*href\s*=\s*["']([^"']*)["'][^>]*>([\s\S]*?)</a>"""


def page_anchor_texts(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Pages → canonicalized ``(src, dst, anchor)`` rows: each link
    edge with its ANCHOR TEXT — "what the linking page calls the
    target", the classic web-search relevance signal (anchor text
    describes the destination better than the destination describes
    itself) and a link-spam feature (one host mass-linking with one
    repeated anchor). Same resolution/canonicalization contract and
    Arrow-kernel shape as :func:`page_links`; additionally the anchor
    content is cleaned JVM-side (inner tags stripped, whitespace
    collapsed, trimmed) before the kernel. Scope: only CLOSED ``<a
    href=...>…</a>`` elements yield rows (an unterminated anchor has
    no extractable text); self-loops and non-navigational schemes
    drop exactly as in ``page_links``. Dedup on the full (src, dst,
    anchor) row — the same page linking the same target under two
    different texts keeps both."""
    from pyspark.sql import types as T

    href = F.col("href")
    lower = F.lower(href)
    skip = (href == "") | href.startswith("#")
    for s in _SKIP_SCHEMES:
        skip = skip | lower.startswith(s)
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("_raw"), r"<[^>]*>", " "), r"\s+", " "
        )
    )
    pairs = (
        pages.select(
            F.col(url_col),
            F.explode(
                F.arrays_zip(
                    F.regexp_extract_all(
                        F.col(html_col), F.lit(_ANCHOR_RX), 1
                    ).alias("href"),
                    F.regexp_extract_all(
                        F.col(html_col), F.lit(_ANCHOR_RX), 2
                    ).alias("_raw"),
                )
            ).alias("_a"),
        )
        .select(url_col, F.col("_a.href").alias("href"), F.col("_a._raw").alias("_raw"))
        .filter(~skip)
        .select(url_col, "href", clean.alias("anchor"))
    )
    schema = T.StructType(
        [
            T.StructField("src", T.StringType()),
            T.StructField("dst", T.StringType()),
            T.StructField("anchor", T.StringType()),
        ]
    )
    ucol = url_col

    def kernel(batches):
        import pandas as pd

        from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.url import (
            canonicalize_url_py,
        )

        canon_cache: dict[str, str] = {}

        def canon_src(u):
            got = canon_cache.get(u)
            if got is None:
                got = canonicalize_url_py(u)
                canon_cache[u] = got
            return got

        for pdf in batches:
            srcs, dsts, anchors = [], [], []
            for base, href_v, anchor in zip(pdf[ucol], pdf["href"], pdf["anchor"]):
                dst_raw = resolve_href_py(base, href_v)
                if dst_raw is None:
                    continue
                src = canon_src(base)
                dst = canonicalize_url_py(dst_raw)
                if dst != src:
                    srcs.append(src)
                    dsts.append(dst)
                    anchors.append(anchor)
            yield pd.DataFrame({"src": srcs, "dst": dsts, "anchor": anchors})

    return pairs.mapInPandas(kernel, schema=schema).distinct()


def anchor_text_index(links: DataFrame) -> DataFrame:
    """Anchor rows → the anchor-text INDEX: per ``(dst, anchor)`` the
    count of DISTINCT linking hosts — "how many independent hosts call
    this page that". Distinct hosts, not links: one host repeating an
    anchor across a thousand pages is one vote (the same
    farm-resistance rule as :func:`url_link_authority`); empty anchors
    (image links, cleaned-away markup) carry no descriptive signal and
    drop. ``(dst, anchor, n_hosts)`` — feed the per-dst top anchor to
    a retrieval index as an auxiliary text field, or the per-(host,
    anchor) concentration to a spam profile. One dedup shuffle on
    (src_host, dst, anchor) + one count aggregate on the same key
    prefix — both AQE-sized, no row explosion beyond anchors/page."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.url import (
        url_host,
    )

    return (
        links.filter(F.col("anchor") != "")
        .select(
            url_host(F.col("src")).alias("src_host"), "dst", "anchor"
        )
        .distinct()
        .groupBy("dst", "anchor")
        .agg(F.count(F.lit(1)).alias("n_hosts"))
    )


def url_link_authority(edges: DataFrame, ranks: DataFrame) -> DataFrame:
    """Per-URL authority prior from the host-level ranking: for each
    ``dst`` URL, the SUM of its distinct linking hosts' pagerank —
    "how much authority recommends this URL". ``(url, priority)``,
    the shape :func:`functions.robots.fetch_schedule` consumes for
    PageRank-ordered waves. Distinct (src_host, dst) first: one host
    linking a URL from a thousand pages is one recommendation, not a
    thousand (the same farm-resistance rule as the host graph).

    Shape: one dedup shuffle on (src_host, dst), one join against the
    (hosts-sized) rank table, one groupBy on dst — all frontier-scale
    keys, AQE-sized, no row explosion."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.url import (
        url_host,
    )

    src_hosts = edges.select(
        url_host(F.col("src")).alias("src_host"), F.col("dst")
    ).distinct()
    return (
        src_hosts.join(ranks, src_hosts["src_host"] == ranks["host"])
        .groupBy("dst")
        .agg(F.sum("pagerank").alias("priority"))
        .select(F.col("dst").alias("url"), "priority")
    )


def host_graph(edges: DataFrame) -> DataFrame:
    """Page edges → distinct host-level ``(src_host, dst_host)``
    edges, intra-host links dropped (self-authority is noise)."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.url import (
        url_host,
    )

    return (
        edges.select(
            url_host(F.col("src")).alias("src_host"),
            url_host(F.col("dst")).alias("dst_host"),
        )
        .filter(F.col("src_host") != F.col("dst_host"))
        .distinct()
    )


def host_degrees(hg: DataFrame) -> DataFrame:
    """Per-host fan-out/fan-in over the host graph: ``(host,
    out_degree, in_degree)``; hosts appearing on either side show up."""
    out_d = hg.groupBy(F.col("src_host").alias("host")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_d = hg.groupBy(F.col("dst_host").alias("host")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        out_d.join(in_d, "host", "full_outer")
        .select(
            "host",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def host_pagerank(
    hg: DataFrame,
    k: int = 10,
    damping: float = 0.85,
    dangling: str = "drop",
    ckpt_every: int = 3,
) -> DataFrame:
    """Damped PageRank over the host graph by fixed-``k`` power
    iteration: ``(host, pagerank)`` for every host on either edge
    side. Deterministic — fixed iteration count, no convergence test —
    so a recursive-CTE oracle replays it value-exact. Each iteration
    is one shuffle of the (host-level, tiny-next-to-page-level) edge
    table.

    ``ckpt_every`` controls how often the running rank table is
    eagerly ``localCheckpoint``-ed (plus always once at the end, so
    the returned frame stays materialized for multi-consumer callers).
    The round-14 form checkpointed EVERY iteration — k eager Spark
    jobs of fixed scheduling overhead for a k-stage chain whose
    intermediates nobody reads (bench: ~15 jobs per pagerank query at
    sf0.1, guide §1/§2 fixed-cost profile). Checkpointing every few
    iterations keeps the un-truncated plan span short (the
    ``redistribute`` variant references ``pr`` twice per iteration, so
    an unbounded span grows the logical tree ~2^span before exchange
    reuse collapses it physically) while cutting the job count ~3x.
    Values are unchanged — checkpoint placement never changes the
    float arithmetic, only where lineage is cut.

    ``dangling`` picks the treatment of hosts with no out-links:

    - ``"drop"`` (default, module doc): their rank mass simply leaks —
      the simplest replayable form, fine when only the ORDER feeds the
      crawler;
    - ``"redistribute"``: the standard correction (and the form behind
      Common Crawl's published host ranks): each iteration sums the
      dangling hosts' mass and spreads it uniformly over all N hosts,
      so total rank is conserved at 1.0. Rank ORDER can differ from
      the droppable form on hub-poor graphs. The dangling sum rides
      the SAME iteration job as a one-row cross-joined aggregate —
      no per-iteration driver round-trip."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if dangling not in ("drop", "redistribute"):
        raise ValueError(
            f"dangling must be 'drop' or 'redistribute', got {dangling!r}"
        )
    if ckpt_every < 1:
        raise ValueError(f"ckpt_every must be >= 1, got {ckpt_every}")
    hosts = (
        hg.select(F.col("src_host").alias("host"))
        .union(hg.select(F.col("dst_host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = hosts.count()
    if n == 0:  # empty graph: empty ranking, not a ZeroDivisionError
        return hosts.select("host", F.lit(0.0).alias("pagerank"))
    out_deg = hg.groupBy(F.col("src_host").alias("host")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    base = float(1.0 - damping) / n
    pr = hosts.select("host", F.lit(1.0 / n).alias("pagerank"))
    contrib_edges = (
        hg.join(out_deg, hg["src_host"] == out_deg["host"])
        .select("src_host", "dst_host", "out_degree")
        .localCheckpoint(eager=True)
    )
    if dangling == "redistribute":
        # The dangling host SET is static across iterations — it
        # depends only on the graph, never on pr — so materialize it
        # once (hosts-sized, tiny) instead of re-deriving
        # ``pr ANTI out_deg`` inside every iteration: out_deg's
        # lineage (the page-link explode + distinct + groupBy under
        # hg) re-ran as a fresh leaf stage in each checkpoint job —
        # AQE exchange reuse does not dedupe leaf stages (round 16's
        # central diagnosis), and this was the only per-iteration
        # subtree still reaching past the two checkpoints above.
        # Equivalence: pr's host set is exactly ``hosts`` on every
        # iteration (pr starts from hosts and every step is
        # ``hosts LEFT JOIN contrib``), so
        # ``pr ANTI out_deg`` ≡ ``pr SEMI (hosts ANTI out_deg)`` —
        # the same row set enters the same sum.
        dangling_hosts = hosts.join(
            out_deg.select("host"), "host", "left_anti"
        ).localCheckpoint(eager=True)
    # Zero row per host seeded into each iteration's contribution
    # aggregate so EVERY host survives the groupBy: the round-15 form
    # re-attached no-in-link hosts with ``hosts LEFT JOIN contrib``,
    # which planned as a per-iteration SortMergeJoin with two more
    # exchanges (contrib is an unsized aggregate, so no auto-
    # broadcast). The union rides the SAME groupBy exchange — one
    # shuffle per iteration instead of three (guide §2.4). Values are
    # unchanged: dst_host ⊆ hosts, summing one extra 0.0 term is
    # exact (contributions are positive finite doubles), and a host
    # with no contributions gets sum{0.0} = 0.0 ≡ the old
    # coalesce(in_mass, 0.0).
    zero_mass = hosts.select("host", F.lit(0.0).alias("c"))
    for it in range(k):
        contrib = (
            contrib_edges.join(pr, contrib_edges["src_host"] == pr["host"])
            .select(
                F.col("dst_host").alias("host"),
                (F.col("pagerank") / F.col("out_degree")).alias("c"),
            )
            .unionByName(zero_mass)
            .groupBy("host")
            .agg(F.sum("c").alias("in_mass"))
        )
        nxt = contrib
        extra = F.lit(base)
        if dangling == "redistribute":
            # dangling mass this iteration: rank held by hosts with no
            # out-links (semi-join on the once-materialized dangling
            # set — see above), folded into the SAME iteration job as
            # a one-row cross-joined aggregate — no per-iteration
            # driver round-trip. Association order (base + d·dm/n) +
            # d·mass is mirrored by the recursive-CTE oracle.
            dm = pr.join(dangling_hosts, "host", "left_semi").agg(
                F.coalesce(F.sum("pagerank"), F.lit(0.0)).alias("_dm")
            )
            nxt = nxt.crossJoin(dm)
            extra = extra + F.lit(damping) * F.col("_dm") / F.lit(float(n))
        pr = nxt.select(
            "host",
            (extra + F.lit(damping) * F.col("in_mass")).alias("pagerank"),
        )
        if (it + 1) % ckpt_every == 0 or it == k - 1:
            pr = pr.localCheckpoint(eager=True)
    return pr
