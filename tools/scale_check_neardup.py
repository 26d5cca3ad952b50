"""Scale check: exact AND JL-prefiltered embedding near-dup pairs at
500k x 64-d with NO full-corpus broadcast (VERDICT r9 item #1
done-criterion; the JL leg also exercises the sparse-gather branch of
the adaptive verification at scale).

At 500k x 64-d the packed corpus is 256 MB raw (n*dim*8) -- far past
BROADCAST_BUDGET_BYTES (64 MB) -- so ``embedding_neardup_pairs`` must
pick the shuffle-replicated block-pair grid. The check:

1. builds 500k synthetic vectors JVM-side (id-seeded, no driver data),
   with 250 planted exact-duplicate pairs (id i and i+250_000 share a
   vector for i < 250),
2. runs ``route="exact"`` and asserts the AQE final plan contains NO
   BroadcastExchange -- the corpus zips through a pair-keyed
   sort-merge join,
3. asserts all 250 planted pairs come back with cosine 1.0,
4. prints wall time + pair count for the SCALE.md row.

Usage: python tools/scale_check_neardup.py [N] [DIM]
Env: NEARDUP_LEGS=exact|jl|both (default both) — at 500k each leg is
     a multi-hundred-second GEMM sweep; separate invocations let a
     harness with a per-command wall cap run them back to back.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.dedup import (
    BROADCAST_BUDGET_BYTES,
    embedding_neardup_pairs,
    embedding_neardup_pairs_jl,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (
    get_spark,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 64
PLANTED = 250
LEGS = os.environ.get("NEARDUP_LEGS", "both")


def main() -> None:
    spark = get_spark()
    raw = N * DIM * 8
    assert raw > BROADCAST_BUDGET_BYTES, (
        f"n*dim*8={raw} must exceed the broadcast budget "
        f"{BROADCAST_BUDGET_BYTES} for this check to exercise the "
        "shuffle route"
    )
    # id-seeded deterministic vectors; ids i < PLANTED share a vector
    # with id i + N//2 (seed collapses), everything else is unique.
    half = N // 2
    seed = F.when(
        (F.col("id") >= half) & (F.col("id") < half + PLANTED),
        F.col("id") - half,
    ).otherwise(F.col("id"))
    vec = F.array(
        *[
            (F.pmod(F.hash(seed.cast("string"), F.lit(j)), F.lit(1000)) / 1000.0)
            for j in range(DIM)
        ]
    ).cast("array<float>")
    df = (
        spark.range(N)
        .repartition(64)
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    )

    got: set = set()
    wall = -1.0
    want = {(i, i + half) for i in range(PLANTED)}
    if LEGS in ("exact", "both"):
        t0 = time.time()
        pairs = embedding_neardup_pairs(
            df, threshold=0.999999, route="exact", rows_per_block=8_000
        )
        rows = pairs.collect()
        wall = time.time() - t0

        plan = (
            pairs._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        assert "BroadcastExchange" not in plan, "corpus must not broadcast"
        assert "SortMergeJoin" in plan, "pair-keyed SMJ expected"

        got = {(r["id_a"], r["id_b"]) for r in rows}
        missing = want - got
        assert not missing, f"{len(missing)} planted duplicate pairs missing"
        assert all(
            r["cosine"] == 1.0 for r in rows if (r["id_a"], r["id_b"]) in want
        )

        print(
            f"OK neardup scale check: n={N} dim={DIM} raw={raw >> 20}MiB "
            f"(budget {BROADCAST_BUDGET_BYTES >> 20}MiB) -> shuffle route, "
            f"0 broadcasts, {len(rows)} pairs "
            f"({PLANTED}/{PLANTED} planted found), wall={wall:.1f}s"
        )
    if LEGS == "exact":
        return

    # the JL twin at the same scale: a realistic tight threshold keeps
    # the prefilter sparse (d2 bound 5e-6 « the ~2.0 of unrelated
    # pairs), so this exercises the sparse-gather verification branch
    # on the shuffle-replicated grid; planted pairs must all survive
    # the projection (identical vectors project identically — their
    # projected distance is exactly 0 regardless of slack).
    t0 = time.time()
    jl_pairs = embedding_neardup_pairs_jl(
        df, threshold=0.999999, rows_per_block=8_000
    )
    jl_rows = jl_pairs.collect()
    jl_wall = time.time() - t0
    jl_plan = (
        jl_pairs._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "BroadcastExchange" not in jl_plan, "corpus must not broadcast"
    jl_got = {(r["id_a"], r["id_b"]) for r in jl_rows}
    jl_missing = want - jl_got
    assert not jl_missing, f"{len(jl_missing)} planted pairs missing from JL"
    if got:
        assert jl_got <= got, "JL emitted a pair the exact path did not"
    print(
        f"OK neardup JL scale check: {len(jl_rows)} pairs "
        f"({PLANTED}/{PLANTED} planted found"
        + (", subset of exact" if got else "")
        + f"), 0 broadcasts, wall={jl_wall:.1f}s (exact {wall:.1f}s)"
    )


if __name__ == "__main__":
    main()
