"""Scale check (round 13): link-graph extraction and host PageRank
beyond fixtures.

1. **Extraction + resolution** (`functions.links.page_links`): n_pages
   synthesized HTML pages × 8 hrefs each (root-relative, sibling,
   ``../``, scheme-relative, absolute-with-canon-work, query-only,
   self-link, mailto) → canonical deduped edges. Baseline = count over
   the synthesized pages; own cost reported in pages/s and edges/s.
   The whole path is codegen (regexp explode → stack-fold resolution →
   staged canonicalizer → one dedup shuffle).

2. **Host PageRank** (`functions.links.host_pagerank`): n_hosts hosts
   with 5 deterministic pseudo-random out-edges each, k=10 damped
   iterations. Each iteration = one join + one groupBy of the host
   edge table; the measurement pins the per-iteration cost so the
   module-doc claim has a number.

Interleaved min-of-K with a GEMM canary (SCALE.md round-10 protocol).

Usage: python tools/scale_check_links.py [n_pages] [n_hosts] [passes]
Defaults: 1_000_000 pages, 1_000_000 hosts, 3 passes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.links import (
    host_pagerank,
    page_links,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (
    get_spark,
)
from tools.benchutil import gemm_canary as _gemm_canary  # noqa: E402


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("scale_links")
    spark.sparkContext.setLogLevel("ERROR")
    did = F.col("id")

    # --- 1. extraction + resolution ---------------------------------------
    ph = (did % 10_000).cast("string")
    ds = did.cast("string")
    url = F.concat(
        F.lit("https://ph"), ph, F.lit(".com/a"), (did % 5).cast("string"),
        F.lit("/b/page"), ds,
    )
    html = F.concat(
        F.lit('<p><a href="/top'), (did % 7).cast("string"), F.lit('">t</a>'),
        F.lit('<a href="sib'), (did % 3).cast("string"), F.lit('.html">s</a>'),
        F.lit('<a href="../up'), (did % 4).cast("string"), F.lit('">u</a>'),
        F.lit('<a href="//ph'), ((did + 1) % 10_000).cast("string"),
        F.lit('.com/x'), (did % 6).cast("string"), F.lit('">r</a>'),
        F.lit('<a href="https://EXT'), (did % 3).cast("string"),
        F.lit(".COM:443/p/"), (did % 9).cast("string"), F.lit('/">e</a>'),
        F.lit('<a href="?o='), (did % 2).cast("string"), F.lit('">q</a>'),
        F.lit('<a href="page'), ds, F.lit('">self</a>'),
        F.lit('<a href="mailto:x@y.z">m</a></p>'),
    )
    pages = spark.range(n_pages).select(url.alias("url"), html.alias("html"))

    def run_base() -> float:
        t0 = time.time()
        pages.agg(F.sum(F.length("html"))).first()
        return time.time() - t0

    def run_links() -> tuple[float, int]:
        t0 = time.time()
        n = page_links(pages).count()
        return time.time() - t0, n

    run_links()  # warm
    bt, lt, canaries = [], [], []
    for _ in range(passes):
        canaries.append(_gemm_canary())
        bt.append(round(run_base(), 2))
        dt, n_edges = run_links()
        lt.append(round(dt, 2))
    base, links = min(bt), min(lt)
    own = max(links - base, 1e-9)
    print(
        f"[links] pages={n_pages} edges={n_edges} canary_gflops={canaries}"
    )
    print(f"  page synth scan: {base:7.2f} s")
    print(
        f"  page_links:      {links:7.2f} s  own {own:.2f} s "
        f"({n_pages / own / 1e6:.2f} M pages/s, {n_edges / own / 1e6:.2f} M edges/s)"
        f"  attempts={lt}"
    )

    # --- 2. host pagerank ---------------------------------------------------
    hs = did.cast("string")
    hg = spark.range(n_hosts).select(
        F.concat(F.lit("h"), hs).alias("src_host"),
        F.explode(
            F.array(
                *[
                    F.concat(F.lit("h"), ((did * m + a) % n_hosts).cast("string"))
                    for m, a in ((7, 1), (13, 3), (31, 7), (101, 11), (211, 17))
                ]
            )
        ).alias("dst_host"),
    ).filter(F.col("src_host") != F.col("dst_host")).localCheckpoint(eager=True)
    n_edges2 = hg.count()

    def run_pr() -> tuple[float, float]:
        t0 = time.time()
        s = host_pagerank(hg, k=10).agg(F.sum("pagerank")).first()[0]
        return time.time() - t0, s

    run_pr()  # warm
    pt = []
    for _ in range(passes):
        canaries.append(_gemm_canary())
        dt, total = run_pr()
        pt.append(round(dt, 2))
    pr_t = min(pt)
    print(
        f"[pagerank] hosts={n_hosts} edges={n_edges2} k=10 "
        f"sum_pr={total:.4f} canary_gflops={canaries[passes:]}"
    )
    print(
        f"  pagerank:        {pr_t:7.2f} s  ({pr_t / 10:.2f} s/iteration, "
        f"{n_edges2 * 10 / pr_t / 1e6:.2f} M edge-visits/s)  attempts={pt}"
    )


if __name__ == "__main__":
    main()
