"""Sitemap discovery — the crawl-SEED side of the web front end.

``functions/robots.py`` gives the crawl its PERMISSION gate; this
module gives it the seed table: ``Sitemap:`` records per host
(:func:`robots.robots_sitemaps`) point at XML documents in the public
sitemaps.org protocol — either a ``<urlset>`` of page entries
(``<loc>``, optional ``<lastmod>``) or a ``<sitemapindex>`` whose
``<loc>`` children are further sitemap files (the protocol caps one
file at 50,000 URLs / 50 MB, so large sites always go through an
index). :func:`sitemap_seed_table` composes the whole discovery:

    robots bodies → declared sitemap URLs → fetched XML bodies →
    (index recursion, one level per the protocol's common depth) →
    page entries → canonicalized seed URLs, optionally gated by
    ``robots_verdicts``.

Reference lifecycle analog: the reference ingests documents the
operator already fetched (scripts/ingest_documents.py:108-233); a
100 TB crawl needs to DISCOVER the fetch list first, and sitemaps are
the publisher-sanctioned discovery channel.

Documented scope (mirrored by the DuckDB oracle in
``queries.web_queries``):

- plain-element extraction: ``<url>``/``<sitemap>`` blocks and their
  ``<loc>``/``<lastmod>`` children are matched with attribute-tolerant
  tags (``<loc ...>``) via non-greedy DOTALL regexes — full XML
  (CDATA, namespaced child tags, comments splitting an element) is
  out of contract, as in every production sitemap parser that
  predates a real XML reader in the hot path;
- the five predefined XML entities are unescaped in ``<loc>``
  (sitemaps.org REQUIRES entity-escaped URLs), ``&amp;`` last so a
  double-escaped ``&amp;lt;`` correctly yields ``&lt;``;
- ``<lastmod>`` passes through as the raw W3C-datetime string (date
  or timestamp precision varies by publisher; parsing to a timestamp
  is the consumer's call), null when absent;
- index recursion is ONE level (index → urlset), matching the
  protocol's "a sitemap index may not reference another index".

Scale shape: all extraction is codegen regexp over per-host sitemap
bodies — a table bounded by hosts × 50k entries, tiny next to the
frontier. The explode is the only row expansion and it is
protocol-bounded; the body joins key on exact URL equality and are
AQE-sized (sitemap tables are the small, growing-with-hosts side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: the five predefined XML entities; ``&amp;`` LAST (module doc)
_XML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def xml_unescape(col: Column | str) -> Column:
    """Predefined-entity unescape for sitemap ``<loc>`` values."""
    c = F.col(col) if isinstance(col, str) else col
    for ent, ch in _XML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _blocks(body: Column, tag: str) -> Column:
    """All ``<tag ...>...</tag>`` inner bodies, DOTALL + non-greedy.
    The open tag requires '>' or whitespace-then-attrs right after the
    name, so ``<url>`` never matches the ``<urlset>`` opener (nor
    ``<sitemap>`` the ``<sitemapindex>`` one)."""
    return F.regexp_extract_all(
        body, F.lit(rf"(?s)<{tag}(?:\s[^>]*)?>(.*?)</{tag}>"), 1
    )


def _child(block: Column, tag: str) -> Column:
    """First ``<tag>`` child's trimmed inner text, '' when absent."""
    return F.trim(
        F.regexp_extract(block, rf"(?s)<{tag}(?:\s[^>]*)?>(.*?)</{tag}>", 1)
    )


def _check_carry_cols(
    carry_cols: tuple[str, ...], reserved: tuple[str, ...], url_col: str
) -> None:
    """carry_cols ride the explode verbatim, so a carry name that
    collides with an output column (or with the aliased ``url_col``)
    would silently produce duplicate/ambiguous columns — fail loudly
    instead (ADVICE r15)."""
    clash = sorted(set(carry_cols) & set(reserved))
    if clash:
        raise ValueError(
            f"carry_cols {clash} collide with reserved output columns "
            f"{sorted(reserved)}"
        )
    if url_col in carry_cols:
        raise ValueError(
            f"carry_cols may not repeat url_col ({url_col!r}); it is "
            "already aliased to 'url' in the output"
        )


def sitemap_page_entries(
    bodies: DataFrame,
    url_col: str = "url",
    body_col: str = "body",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """``<urlset>`` documents → one row per page entry:
    ``(url, loc, lastmod)`` where ``url`` is the sitemap's own URL,
    ``loc`` the entity-unescaped page URL, ``lastmod`` the raw
    W3C-datetime string or null. Non-urlset bodies (indexes, junk)
    contribute zero rows — ``<url>`` blocks simply don't match.
    ``carry_cols`` ride the explode unchanged (e.g. the declaring
    host), so callers keep context without a re-join against the
    body table (each join is an exchange + build at scale)."""
    _check_carry_cols(carry_cols, ("url", "loc", "lastmod"), url_col)
    block = F.col("_sm_block")
    loc = _child(block, "loc")
    lastmod = _child(block, "lastmod")
    return (
        bodies.select(
            *[F.col(c) for c in carry_cols],
            F.col(url_col).alias("url"),
            F.explode(_blocks(F.col(body_col), "url")).alias("_sm_block"),
        )
        .select(
            *carry_cols,
            "url",
            xml_unescape(loc).alias("loc"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
        )
        .filter(F.col("loc") != "")
    )


def sitemap_index_children(
    bodies: DataFrame,
    url_col: str = "url",
    body_col: str = "body",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """``<sitemapindex>`` documents → one row per child sitemap:
    ``(url, child_url)``. Plain ``<urlset>`` bodies contribute zero
    rows (no ``<sitemap>`` blocks). ``carry_cols`` as in
    :func:`sitemap_page_entries`."""
    _check_carry_cols(carry_cols, ("url", "child_url"), url_col)
    block = F.col("_sm_block")
    loc = _child(block, "loc")
    return (
        bodies.select(
            *[F.col(c) for c in carry_cols],
            F.col(url_col).alias("url"),
            F.explode(_blocks(F.col(body_col), "sitemap")).alias("_sm_block"),
        )
        .select(*carry_cols, "url", xml_unescape(loc).alias("child_url"))
        .filter(F.col("child_url") != "")
    )


def parse_w3c_datetime(col: Column | str) -> Column:
    """sitemaps.org ``<lastmod>`` (W3C datetime) → timestamp.
    Documented scope: date-only (``YYYY-MM-DD`` → midnight) and UTC
    forms (``...Z``, with or without fractional seconds — any 1-9
    fractional digits, truncated to microseconds). Non-UTC offsets
    parse to NULL — conservative for the recrawl consumer (an
    unparseable claim never triggers a refetch), and it keeps the
    DuckDB oracle byte-exact (offset handling differs across strptime
    dialects).

    The fraction is NORMALIZED to exactly 6 digits before the parse
    (right-padded/truncated) because a fixed-width pattern like
    ``.SSS`` silently NULLs valid W3C forms such as ``...T06:30:00.25Z``
    or ``...T06:30:00.123456Z`` — and a lastmod that parses NULL is a
    page that never gets recrawled."""
    c = F.col(col) if isinstance(col, str) else col
    _full = r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})\.(\d{1,9})Z$"
    frac = F.regexp_extract(c, _full, 2)
    norm = F.concat(
        F.regexp_extract(c, _full, 1),
        F.lit("."),
        F.rpad(F.substring(frac, 1, 6), 6, "0"),
        F.lit("Z"),
    )
    return F.coalesce(
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
        F.try_to_timestamp(
            F.when(frac != "", norm),
            F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
        ),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd")),
    )


def recrawl_candidates(
    fetched: DataFrame,
    seeds: DataFrame,
    url_col: str = "canonical_url",
    fetched_at_col: str = "fetched_at",
) -> DataFrame:
    """The FRESHNESS side of the crawl loop: URLs whose
    publisher-claimed ``lastmod`` (the seed table's sitemap claim) is
    NEWER than our fetch — the recrawl list. ``fetched`` carries
    ``(url_col, fetched_at_col)`` (a timestamp); ``seeds`` is the
    :func:`sitemap_seed_table` shape ``(host, url, lastmod)``. URLs
    never fetched are not recrawl candidates (they are ADMISSION
    candidates — ``streaming.frontier_admit``); absent/unparseable
    lastmod never triggers (the sitemap made no credible claim).
    Output: ``(host, url, lastmod)`` — feed it back through
    ``fetch_schedule`` like any other wave.

    Shape: one equi-join on the canonical URL (both sides share the
    crawl's dedup key), the timestamp parse rides the seed scan —
    no shuffle beyond the join, which AQE sizes (seed tables are
    hosts × 50k protocol-bounded)."""
    lm = parse_w3c_datetime(F.col("lastmod"))
    f = fetched.select(
        F.col(url_col).alias("url"), F.col(fetched_at_col).alias("_fetched_at")
    )
    return (
        seeds.join(f, "url")
        .filter(lm > F.col("_fetched_at"))
        .select("host", "url", "lastmod")
    )


def sitemap_seed_table(
    robots_pages: DataFrame,
    sitemap_bodies: DataFrame,
    robots_rules: DataFrame | None = None,
    agent: str = "*",
) -> DataFrame:
    """The crawl-seed discovery composition (module doc):
    ``robots_pages`` (host, body — robots.txt) and ``sitemap_bodies``
    (url, body — fetched sitemap XML) → one seed row per
    ``(host, url, lastmod)``, where ``url`` is the CANONICALIZED page
    URL (``functions.url.with_canonical_url`` contract — seeds feed
    the same frontier the ingest dedups on, so they must share its
    key). Index files recurse one level through ``sitemap_bodies``.
    With ``robots_rules`` the seeds are gated by
    ``robots_verdicts(agent)`` — a polite crawl never schedules a URL
    its own permission table forbids, even when a sitemap advertises
    it (sitemaps and robots rules are routinely out of sync).

    Dedup: the same page advertised by two sitemaps (or an index AND
    its child) collapses to one row; conflicting ``lastmod`` values
    take the MAX (latest claim wins — the scheduler uses lastmod for
    recrawl priority, and the freshest claim is the conservative
    choice)."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.robots import (
        robots_sitemaps,
        robots_verdicts,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.url import (
        with_canonical_url,
    )

    declared = robots_sitemaps(robots_pages)  # (host, sitemap_url)
    bodies = sitemap_bodies.select(
        F.col(sitemap_bodies.columns[0]).alias("url"),
        F.col(sitemap_bodies.columns[1]).alias("body"),
    )
    level0 = declared.join(
        bodies, declared["sitemap_url"] == bodies["url"]
    ).select("host", "url", "body")
    # one-level index recursion: children inherit the declaring host.
    # The host RIDES each explode (carry_cols) instead of being
    # re-joined from the body table afterwards — the round-14 form
    # paid three extra self-joins (parent-host recovery + one
    # host-recovery join per entry leg), each an exchange at scale;
    # the final (host, seed_url) dedup below makes the two forms
    # value-identical even when one child sitemap is declared by
    # several hosts (multiplicity differs, the deduped set does not).
    children = (
        sitemap_index_children(level0, carry_cols=("host",))
        .select("host", F.col("child_url").alias("_curl"))
        .join(bodies, F.col("_curl") == bodies["url"])
        .select("host", "url", "body")
    )
    entries = (
        sitemap_page_entries(level0, carry_cols=("host",))
        .select("host", "loc", "lastmod")
        .unionByName(
            sitemap_page_entries(children, carry_cols=("host",)).select(
                "host", "loc", "lastmod"
            )
        )
    )
    seeds = (
        with_canonical_url(entries, url_col="loc", out_col="seed_url")
        .groupBy("host", "seed_url")
        .agg(F.max("lastmod").alias("lastmod"))
        .select("host", F.col("seed_url").alias("url"), "lastmod")
    )
    if robots_rules is not None:
        seeds = (
            robots_verdicts(seeds, robots_rules, agent=agent)
            .filter(F.col("allowed") == 1)
            .select("host", "url", "lastmod")
        )
    return seeds
