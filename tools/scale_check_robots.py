"""Scale check (round 12): the robots gate at 10M frontier URLs.

``functions.robots.robots_verdicts`` claims "the gate rides the
frontier scan": rules collapse to one broadcast array row per host
and the winner is picked with higher-order array expressions — no
shuffle, no row explosion. The risk is NOT the join; it is that
``rlike`` with a per-element (non-foldable) pattern recompiles the
regex for every (url × host-rule) evaluation: Spark's RLike caches
only the LAST pattern, and iterating a host's rules array changes the
pattern on every element, so the cache never hits. This measures the
real throughput:

- baseline: count+sum over the synthesized frontier (synthesis cost)
- gate:     robots_verdicts() -> agg sum(allowed) (no collect)

N hosts get a realistic mixed rule-set (prefix rules, a wildcard +
'$' anchor, an exact-agent group, a block-all with carve-out, and
rule-free hosts). Interleaved min-of-K with a GEMM canary per pass
(SCALE.md round-10 host-noise protocol).

Usage: python tools/scale_check_robots.py [n_rows] [n_hosts] [passes]
Defaults: 10_000_000 rows, 1_000 hosts, 3 passes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.robots import (
    parse_robots_rules,
    robots_verdicts,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (
    get_spark,
)

BODIES = [
    # mode 0: prefix rules + exact-agent group
    "User-agent: crawler\nDisallow: /private/\nAllow: /private/pub/\n"
    "\nUser-agent: *\nDisallow: /\n",
    # mode 1: wildcard + anchor + allow floor
    "User-agent: *\nDisallow: /*.json$\nDisallow: /tmp/\nAllow: /\n",
    # mode 2: block-all with carve-out
    "User-agent: *\nDisallow: /\nAllow: /docs/\n",
    # mode 3: rule-free (comments only)
    "# nothing\n",
]


from tools.benchutil import gemm_canary as _gemm_canary  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("scale_robots")
    spark.sparkContext.setLogLevel("ERROR")

    pages = spark.range(n_hosts).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".com")).alias(
            "host"
        ),
        F.element_at(
            F.array(*[F.lit(b) for b in BODIES]),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("body"),
    )
    rules = parse_robots_rules(pages).localCheckpoint(eager=True)
    n_rules = rules.count()

    did = F.col("id")
    path = (
        F.when(did % 5 == 0, F.concat(F.lit("/private/"), did.cast("string")))
        .when(did % 5 == 1, F.concat(F.lit("/private/pub/"), did.cast("string")))
        .when(did % 5 == 2, F.concat(F.lit("/d/f"), did.cast("string"), F.lit(".json")))
        .when(did % 5 == 3, F.concat(F.lit("/docs/"), did.cast("string")))
        .otherwise(F.concat(F.lit("/x/"), did.cast("string"), F.lit("?q=1")))
    )
    frontier = spark.range(n).select(
        F.concat(
            F.lit("https://h"),
            (did % n_hosts).cast("string"),
            F.lit(".com"),
            path,
        ).alias("url")
    )

    def run_base() -> float:
        t0 = time.time()
        frontier.agg(F.count(F.lit(1))).first()
        return time.time() - t0

    def run_gate() -> tuple[float, int]:
        t0 = time.time()
        r = (
            robots_verdicts(frontier, rules, agent="crawler")
            .agg(
                F.count(F.lit(1)).alias("c"), F.sum("allowed").alias("ok")
            )
            .first()
        )
        assert r["c"] == n
        return time.time() - t0, r["ok"]

    run_gate()  # warm
    base_t, gate_t, canaries = [], [], []
    for _ in range(passes):
        canaries.append(_gemm_canary())
        base_t.append(round(run_base(), 2))
        dt, ok = run_gate()
        gate_t.append(round(dt, 2))
    base, gate = min(base_t), min(gate_t)
    own = gate - base
    print(
        f"n_rows={n} n_hosts={n_hosts} n_rules={n_rules} passes={passes} "
        f"allowed={ok}/{n} canary_gflops={canaries}"
    )
    print(f"frontier synth:  {base:8.2f} s  ({n / base / 1e6:.1f} M rows/s)")
    print(f"with gate:       {gate:8.2f} s  ({n / gate / 1e6:.1f} M rows/s)")
    print(
        f"gate own cost:   {own:8.2f} s  ({n / max(own, 1e-9) / 1e6:.1f} M rows/s)"
        f"  [attempts base={base_t} gate={gate_t}]"
    )


if __name__ == "__main__":
    main()
