"""Scale check (round 13): the crawl-seed side — sitemap extraction
and the politeness scheduler — measured beyond fixtures.

Two independent measurements, interleaved min-of-K with a GEMM canary
(SCALE.md round-10 host-noise protocol):

1. **Sitemap seed extraction** (``functions.sitemap.sitemap_seed_table``):
   n_hosts × per_host entries of synthesized urlset XML (entity-escaped
   query params, lastmod on half the entries, a /private/ share that the
   robots gate must drop) run through the full composition — Sitemap:
   record parse, block extraction, entity unescape, canonicalization,
   lastmod-max merge, robots gate. Baseline = count over the bodies
   (synthesis cost); reported own-cost throughput is entries/s.
   The protocol caps a sitemap at 50k entries; per_host=500 with 2k
   hosts exercises 1M entries without pretending one file holds them.

2. **Fetch schedule** (``functions.robots.fetch_schedule``): n_rows
   frontier URLs over n_hosts hosts, half the hosts carrying a
   Crawl-delay. The operator's whole cost is ONE hash shuffle on host
   + window arithmetic; this pins the rows/s of that shuffle so the
   claim in the module doc has a number.

Usage: python tools/scale_check_seed_schedule.py [n_hosts] [per_host] [n_rows] [passes]
Defaults: 2_000 hosts, 500 entries/host (1M seeds), 10_000_000 frontier rows, 3 passes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.robots import (
    fetch_schedule,
    parse_robots_rules,
    robots_crawl_delays,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.sitemap import (
    sitemap_seed_table,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (
    get_spark,
)
from tools.benchutil import gemm_canary as _gemm_canary  # noqa: E402


def main() -> None:
    n_hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000
    per_host = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    n_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000_000
    passes = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    spark = get_spark("scale_seed_schedule")
    spark.sparkContext.setLogLevel("ERROR")
    did = F.col("id")

    # --- 1. sitemap seed extraction at n_hosts x per_host ------------------
    n_entries = n_hosts * per_host
    h = (did % n_hosts).cast("string")
    i = (did.cast("long") / n_hosts).cast("long").cast("string")
    entry = F.concat(
        F.lit("<url><loc>https://s"), h,
        F.when(did % 10 == 0, F.lit(".com/private/")).otherwise(F.lit(".com/art/")),
        i,
        F.lit("?b=2&amp;a=1</loc>"),
        F.when(
            did % 2 == 0,
            F.concat(F.lit("<lastmod>2024-01-"), F.lpad((did % 28 + 1).cast("string"), 2, "0"), F.lit("</lastmod>")),
        ).otherwise(F.lit("")),
        F.lit("</url>"),
    )
    bodies = (
        spark.range(n_entries)
        .select((did % n_hosts).alias("hh"), entry.alias("e"))
        .groupBy("hh")
        .agg(F.array_join(F.collect_list("e"), "").alias("inner"))
        .select(
            F.concat(F.lit("https://s"), F.col("hh").cast("string"), F.lit(".com/sitemap.xml")).alias("url"),
            F.concat(F.lit("<urlset>"), F.col("inner"), F.lit("</urlset>")).alias("body"),
        )
        .localCheckpoint(eager=True)
    )
    robots = spark.range(n_hosts).select(
        F.concat(F.lit("s"), did.cast("string"), F.lit(".com")).alias("host"),
        F.concat(
            F.lit("User-agent: *\nDisallow: /private/\nSitemap: https://s"),
            did.cast("string"),
            F.lit(".com/sitemap.xml\n"),
        ).alias("body"),
    ).localCheckpoint(eager=True)
    rules = parse_robots_rules(robots).localCheckpoint(eager=True)

    def run_base() -> float:
        t0 = time.time()
        bodies.agg(F.sum(F.length("body"))).first()
        return time.time() - t0

    def run_seeds() -> tuple[float, int]:
        t0 = time.time()
        n = sitemap_seed_table(robots, bodies, robots_rules=rules, agent="crawler").count()
        return time.time() - t0, n

    run_seeds()  # warm
    bt, st, canaries = [], [], []
    for _ in range(passes):
        canaries.append(_gemm_canary())
        bt.append(round(run_base(), 2))
        dt, n_seeds = run_seeds()
        st.append(round(dt, 2))
    base, seeds = min(bt), min(st)
    own = max(seeds - base, 1e-9)
    expected = n_entries - n_entries // 10  # /private/ gated
    print(
        f"[sitemap] hosts={n_hosts} entries={n_entries} seeds={n_seeds} "
        f"(expected {expected}) canary_gflops={canaries}"
    )
    print(f"  body synth scan: {base:7.2f} s")
    print(
        f"  seed table:      {seeds:7.2f} s  own {own:.2f} s "
        f"({n_entries / own / 1e6:.2f} M entries/s)  attempts={st}"
    )
    assert n_seeds == expected, f"seed count {n_seeds} != {expected}"

    # --- 2. fetch schedule at n_rows ---------------------------------------
    sched_hosts = 10_000
    frontier = spark.range(n_rows).select(
        F.concat(
            F.lit("https://h"), (did % sched_hosts).cast("string"),
            F.lit(".com/p/"), did.cast("string"),
        ).alias("url")
    )
    delays = spark.range(sched_hosts // 2).select(
        F.concat(F.lit("h"), (did * 2).cast("string"), F.lit(".com")).alias("host"),
        (did % 10 / 2 + 0.5).alias("crawl_delay"),
    ).localCheckpoint(eager=True)

    def run_fbase() -> float:
        t0 = time.time()
        frontier.agg(F.count(F.lit(1))).first()
        return time.time() - t0

    def run_sched() -> float:
        t0 = time.time()
        r = fetch_schedule(frontier, delays).agg(
            F.count(F.lit(1)).alias("c"), F.sum("fetch_at").alias("s")
        ).first()
        assert r["c"] == n_rows
        return time.time() - t0

    run_sched()  # warm
    fbt, sct = [], []
    for _ in range(passes):
        canaries.append(_gemm_canary())
        fbt.append(round(run_fbase(), 2))
        sct.append(round(run_sched(), 2))
    fbase, sched = min(fbt), min(sct)
    own2 = max(sched - fbase, 1e-9)
    print(f"[schedule] rows={n_rows} hosts={sched_hosts} canary_gflops={canaries[passes:]}")
    print(f"  frontier synth:  {fbase:7.2f} s")
    print(
        f"  schedule:        {sched:7.2f} s  own {own2:.2f} s "
        f"({n_rows / own2 / 1e6:.2f} M rows/s)  attempts={sct}"
    )


if __name__ == "__main__":
    main()
