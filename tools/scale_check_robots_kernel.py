"""Scale check (round 13): expression-path vs Arrow-kernel robots
matching across rules-per-host densities.

Round 12 measured the expression gate at 2.9 M URLs/s with ~4
rules/host and named its soft spot: per-element ``rlike`` patterns
defeat Spark's single-entry regex cache, so every (url × rule)
evaluation recompiles — linear in rules/host with a compile in the
constant. The round-13 ask: measure the named alternative
(host-bucketed compiled patterns in an Arrow kernel,
``robots_verdicts_kernel``) at ~10× and ~100× denser rule sets
(Wikipedia-class robots.txt is hundreds of lines) and ship a size
gate or record why the expression path holds.

Per density d in {4, 40, 400}: hosts get a mixed rule body with d
rules (prefix runs, per-run allow carve-outs, '$'-anchored wildcard
rules); the frontier mixes paths that hit early, late, and never.
Both paths must agree on sum(allowed) (checked every pass).
Interleaved min-of-K with a GEMM canary (SCALE.md round-10 host-noise
protocol).

Usage: python tools/scale_check_robots_kernel.py [n_rows] [n_hosts] [passes] [densities]
Defaults: 2_000_000 rows, 200 hosts, 3 passes, densities 4,40,400.
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
    robots_verdicts_kernel,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (
    get_spark,
)
from tools.benchutil import gemm_canary as _gemm_canary  # noqa: E402


def body(n_rules: int) -> str:
    lines = ["User-agent: *"]
    runs = max(n_rules // 3, 1)
    for i in range(runs):
        lines.append(f"Disallow: /p{i:03d}/")
        lines.append(f"Allow: /p{i:03d}/pub")
        lines.append(f"Disallow: /*.t{i:03d}$")
    return "\n".join(lines[: n_rules + 1]) + "\n"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("scale_robots_kernel")
    spark.sparkContext.setLogLevel("ERROR")

    densities = (
        tuple(int(x) for x in sys.argv[4].split(","))
        if len(sys.argv) > 4
        else (4, 40, 400)
    )
    did = F.col("id")
    for density in densities:
        pages = spark.range(n_hosts).select(
            F.concat(F.lit("h"), did.cast("string"), F.lit(".com")).alias("host"),
            F.lit(body(density)).alias("body"),
        )
        rules = parse_robots_rules(pages).localCheckpoint(eager=True)
        n_rules = rules.count()
        runs = max(density // 3, 1)
        early, late = 0, runs - 1
        path = (
            F.when(did % 5 == 0, F.concat(F.lit(f"/p{early:03d}/"), did.cast("string")))
            .when(did % 5 == 1, F.concat(F.lit(f"/p{late:03d}/pub"), did.cast("string")))
            .when(did % 5 == 2, F.concat(F.lit("/d/f"), did.cast("string"), F.lit(f".t{late:03d}")))
            .when(did % 5 == 3, F.concat(F.lit(f"/p{late:03d}/"), did.cast("string")))
            .otherwise(F.concat(F.lit("/x/"), did.cast("string"), F.lit("?q=1")))
        )
        frontier = spark.range(n).select(
            F.concat(
                F.lit("https://h"), (did % n_hosts).cast("string"), F.lit(".com"), path
            ).alias("url")
        )

        def run(fn) -> tuple[float, int]:
            t0 = time.time()
            r = (
                fn(frontier, rules, agent="crawler")
                .agg(F.count(F.lit(1)).alias("c"), F.sum("allowed").alias("ok"))
                .first()
            )
            assert r["c"] == n
            return time.time() - t0, r["ok"]

        run(robots_verdicts)  # warm
        run(robots_verdicts_kernel)
        et, kt, canaries, oks = [], [], [], set()
        for _ in range(passes):
            canaries.append(_gemm_canary())
            dt, ok_e = run(robots_verdicts)
            et.append(round(dt, 2))
            dt, ok_k = run(robots_verdicts_kernel)
            kt.append(round(dt, 2))
            assert ok_e == ok_k, f"verdict mismatch: {ok_e} != {ok_k}"
            oks.add(ok_e)
        e, k = min(et), min(kt)
        print(
            f"density={density:4d} rules/host (n_rules={n_rules}) "
            f"allowed={oks.pop()}/{n} canary_gflops={canaries}"
        )
        print(
            f"  expression: {e:7.2f} s ({n / e / 1e6:5.2f} M rows/s)  attempts={et}"
        )
        print(
            f"  kernel:     {k:7.2f} s ({n / k / 1e6:5.2f} M rows/s)  attempts={kt}"
            f"   kernel/expr = {k / e:.2f}x"
        )


if __name__ == "__main__":
    main()
