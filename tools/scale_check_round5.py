"""Scale checks for the round-5 operators:

1. ``salted_topk_per_group`` vs the plain single-window top-k on a
   HOT grouping key (4 groups over millions of rows): the plain window
   funnels each group through one reduce task; the salted rewrite
   spreads each group across n_salts partitions.
2. ``interval_join`` (as-of composition) vs the naive BETWEEN join on
   hot keys with many intervals per key: the BETWEEN join builds
   |facts_k| × |intervals_k| candidates per key before filtering; the
   as-of form never builds candidates.
3. ``embedding_neardup_pairs_jl`` vs the exact blocked GEMM at a high
   threshold: the quadratic stage runs at out_dim/dim of the FLOPs.

Usage: python tools/scale_check_round5.py [N]
Default N = 8_000_000 rows for (1)/(2); 200_000 x 64-d vectors for (3).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.dedup import (
    embedding_neardup_pairs,
    embedding_neardup_pairs_jl,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.skew import (
    salted_topk_per_group,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.temporal import (
    interval_join,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (
    get_spark,
)


def bench(label, df):
    t0 = time.time()
    n = df.count()
    dt = time.time() - t0
    print(f"{label}: {dt:.2f} s ({n} rows)")
    return dt, n


def main() -> None:
    only = None
    args = [a for a in sys.argv[1:]]
    if args and args[0].startswith("--only"):
        only = int(args.pop(0).split("=")[1])
    n = int(args[0]) if args else 8_000_000
    spark = get_spark("scale_round5", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")

    if only not in (None, 1):
        pass
    else:
        phase1(spark, n)
    if only in (None, 2):
        phase2(spark, n)
    if only in (None, 3):
        phase3(spark)


def phase1(spark, n: int) -> None:
    # ---- 1. salted top-k on a hot grouping key -------------------
    hot = (
        spark.range(n, numPartitions=32)
        .withColumn("grp", (F.col("id") % 4).cast("string"))
        .withColumn("score", (F.xxhash64("id") % 1_000_000).cast("double"))
    ).localCheckpoint()
    w = Window.partitionBy("grp").orderBy(F.col("score").desc(), F.col("id").asc())
    t_plain, _ = bench(
        f"plain window top-100 per group ({n} rows, 4 groups)",
        hot.withColumn("rank", F.row_number().over(w)).filter("rank <= 100"),
    )
    t_salt, _ = bench(
        "salted top-100 (n_salts=32)",
        salted_topk_per_group(
            hot, ["grp"], [F.col("score").desc(), F.col("id").asc()],
            k=100, salt_from="id", n_salts=32,
        ),
    )
    print(f"  salted speedup: {t_plain / t_salt:.1f}x")


def phase2(spark, n: int) -> None:
    # ---- 2. interval_join vs naive BETWEEN join on hot keys ------
    n_keys, n_versions = 16, 2_000
    facts = (
        spark.range(n, numPartitions=32)
        .withColumn("user_id", F.col("id") % n_keys)
        .withColumn(
            "ts",
            F.expr(
                "timestampadd(SECOND, abs(xxhash64(id, 'f')) % 2592000, "
                "TIMESTAMP_NTZ'2024-01-01 00:00:00')"
            ),
        )
    ).localCheckpoint()
    ver = (
        spark.range(n_keys * n_versions)
        .withColumn("user_id", F.col("id") % n_keys)
        .withColumn("vseq", F.floor(F.col("id") / n_keys))
        .withColumn(
            "valid_from",
            F.expr(
                f"timestampadd(SECOND, cast(vseq * {2592000 // n_versions} as int), "
                "TIMESTAMP_NTZ'2024-01-01 00:00:00')"
            ),
        )
        .withColumn(
            "valid_to",
            F.when(
                F.col("vseq") < n_versions - 1,
                F.expr(
                    f"timestampadd(SECOND, cast((vseq + 1) * {2592000 // n_versions} as int), "
                    "TIMESTAMP_NTZ'2024-01-01 00:00:00')"
                ),
            ),
        )
        .select("user_id", "valid_from", "valid_to", F.col("id").alias("ver_id"))
    ).localCheckpoint()
    t_iv, n_iv = bench(
        f"interval_join ({n} facts, {n_keys} hot keys x {n_versions} versions)",
        interval_join(facts, ver, on=["user_id"], payload=["ver_id"]),
    )
    t_nv, n_nv = bench(
        "naive BETWEEN join (same data)",
        facts.alias("f").join(
            ver.alias("v"),
            (F.col("f.user_id") == F.col("v.user_id"))
            & (F.col("v.valid_from") <= F.col("f.ts"))
            & (F.col("v.valid_to").isNull() | (F.col("f.ts") < F.col("v.valid_to"))),
            "left",
        ),
    )
    assert n_iv == n_nv, (n_iv, n_nv)
    print(f"  interval_join speedup: {t_nv / t_iv:.1f}x")


def phase3(spark) -> None:
    # ---- 3. JL-prefiltered near-dup vs exact blocked GEMM --------
    # n_blocks=None → the operators' memory-aware auto sizing; a
    # hand-forced 16 blocks at 200k rows allocates 1.25 GB score
    # matrices per task and OOM-kills the workers
    nv = 200_000
    vecs = (
        spark.range(nv, numPartitions=32)
        .withColumn(
            "embedding",
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda d: (
                    F.pmod(F.xxhash64(F.floor(F.col("id") / 4), d), F.lit(1000))
                    / 500.0
                    - 1.0
                ),
            ).cast("array<float>"),
        )
        .withColumnRenamed("id", "vec_id")
    ).localCheckpoint()
    thr = 0.9  # near-dup grade: only id-clustered vectors collide
    t_ex, n_ex = bench(
        f"exact blocked GEMM pairs ({nv} x 64-d, threshold {thr})",
        embedding_neardup_pairs(vecs, threshold=thr),
    )
    t_jl, n_jl = bench(
        "JL-prefiltered pairs (out_dim=16, slack=2.5)",
        embedding_neardup_pairs_jl(vecs, threshold=thr, out_dim=16, slack=2.5),
    )
    print(
        f"  JL speedup: {t_ex / t_jl:.1f}x; recall {n_jl}/{n_ex}"
        f" = {n_jl / max(n_ex, 1):.4f}"
    )


if __name__ == "__main__":
    main()
