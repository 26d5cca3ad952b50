"""URL canonicalization — the dedup key of a web-crawl pipeline.

The same page is captured under syntactically different URLs (case
variants, default ports, fragments, tracking params, param order);
crawl dedup keys on the CANONICAL form before any content hashing.
All pure SQL expressions (split / filter / array_sort / regexp), zero
Python — at 100 TB this runs at scan bandwidth next to the WARC
record parse (``sources.warc``).

Canonical form (documented contract, mirrored by the DuckDB oracle in
``queries.text_queries.web_url_dedup``):

- scheme and host lowercased (path/query stay case-sensitive);
- default ports stripped (``:80`` for http, ``:443`` for https);
- fragment dropped;
- tracking params dropped (``utm_*`` prefixes + the exact names in
  ``TRACKING_PARAMS``), remaining query params SORTED bytewise (the
  usual canonicalizer choice: order-insensitive equality beats the
  rare order-sensitive endpoint);
- an emptied query string drops its ``?``;
- trailing slash stripped from non-root paths (``/a/`` == ``/a``,
  root ``/`` kept).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: exact param names treated as tracking (plus every ``utm_`` prefix)
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "ref_src", "mc_eid")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def canonicalize_url(url: Column | str) -> Column:
    """Canonical URL per the module contract — one codegen'd
    expression tree (regexp splits + array ops), no UDF."""
    u = _c(url)
    # 1. drop the fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 2. split: scheme :// authority rest
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    auth = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    # 3. strip the scheme's default port
    auth = F.when(
        (scheme == "http") & auth.endswith(":80"),
        F.substring(auth, 1, F.length(auth) - 3),
    ).otherwise(auth)
    auth = F.when(
        (scheme == "https") & auth.endswith(":443"),
        F.substring(auth, 1, F.length(auth) - 4),
    ).otherwise(auth)
    # 4. path / query split
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # trailing slash off non-root paths
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    # 5. drop tracking params, sort the rest bytewise
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~F.substring_index(p, "=", 1).isin(*TRACKING_PARAMS),
    )
    canon_q = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(F.lit("")),
    )
    # best-effort contract: anything that isn't an absolute URL
    # (no scheme://) passes through unchanged rather than collapsing
    # to a '://...' artifact — relative refs and junk rows stay
    # distinct instead of colliding into one dedup group
    return F.when(scheme == "", _c(url)).otherwise(canon)


def url_host(url: Column | str) -> Column:
    """Lowercased host (port stripped) — the grouping key for
    host-level corpus stats and per-host mixing/caps."""
    auth = F.lower(
        F.regexp_extract(_c(url), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    return F.regexp_replace(auth, r":\d+$", "")
