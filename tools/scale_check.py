"""Scale check: brute-force vs IVF top-k at N synthetic vectors.

Synthesizes a seeded N x dim vector table (far larger than the test
fixtures), then times:
  1. exact broadcast top-k over the full index
  2. IVF probe (k-means-seeded, nprobe of n_centroids buckets) over
     the same data, plus its recall vs exact
  3. IVF against the centroid-partitioned parquet layout (partition
     pruning — the production path)

Usage: python tools/scale_check.py [N] [n_centroids] [nprobe]
Defaults: 500_000 vectors, 64 centroids, probe 8.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators import (
    ann,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.topk import (
    topk_search,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (
    get_spark,
)

DIM = 64
N_QUERIES = 16
K = 10


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_cent = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    nprobe = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    spark = get_spark("scale_check", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    # seeded synthetic vectors: deterministic, label-clustered so IVF
    # has real structure (cluster center + noise)
    emb = (
        spark.range(n)
        .withColumn("label", (F.col("id") % 32).cast("int"))
        .select(
            F.col("id").alias("vec_id"),
            "label",
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda i: (
                    F.sin(F.col("label") * 37 + i * 13) * 0.8
                    + F.sin(F.col("id") * 7919 + i * 104729) * 0.4
                ).cast("float"),
            ).alias("embedding"),
        )
    )
    emb = emb.repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).localCheckpoint()
    print(f"index: {emb.count():,} x {DIM}", file=sys.stderr)

    # boot the Python worker pool so the first Arrow kernel isn't
    # billed ~30s of concurrent fork+import (see bench.py)
    import pandas as pd

    def _noop(batches):
        for b in batches:
            yield pd.DataFrame({"n": [len(b)]})

    spark.range(256).repartition(32).mapInPandas(_noop, "n long").count()

    def best_of(fn, runs=2):
        best, out = None, None
        for _ in range(runs):
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return best, out

    queries = emb.filter(F.col("vec_id") % (n // N_QUERIES) == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )

    t_exact, exact = best_of(
        lambda: topk_search(queries, emb, k=K, metric="cosine").collect()
    )
    print(f"exact brute-force (HOF fold) top-{K}: {t_exact:.2f}s ({len(exact)} rows)")

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.topk import (
        topk_search_gemm,
    )

    t_gemm, gemm = best_of(
        lambda: topk_search_gemm(queries, emb, k=K, metric="cosine").collect()
    )
    exset = {(r["query_id"], r["vec_id"]) for r in exact}
    gset = {(r["query_id"], r["vec_id"]) for r in gemm}
    print(
        f"exact brute-force (blocked GEMM) top-{K}: {t_gemm:.2f}s "
        f"(speedup x{t_exact / t_gemm:.1f}, agreement "
        f"{len(exset & gset) / max(len(exset), 1):.3f})"
    )

    cents = ann.seed_centroids(emb, n_cent)
    cents = ann.lloyd_refine(emb, cents, iters=1, metric="cosine")

    ex = {(r["query_id"], r["vec_id"]) for r in exact}
    if n <= 1_000_000:
        # expression-form assignment is k interpreted folds per row —
        # the oracle-parity path, not the build path; skip at scale
        t_ivf, approx = best_of(
            lambda: ann.ivf_topk(queries, emb, cents, k=K, nprobe=nprobe).collect()
        )
        ap = {(r["query_id"], r["vec_id"]) for r in approx}
        recall = len(ex & ap) / max(len(ex), 1)
        print(
            f"IVF on-the-fly (nprobe {nprobe}/{n_cent}): {t_ivf:.2f}s, "
            f"recall@{K}={recall:.3f}, speedup x{t_exact / t_ivf:.1f}"
        )

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "ivf")
        t0 = time.time()
        ann.write_ivf_index(emb, path, cents, metric="cosine")
        t_build = time.time() - t0
        layout = spark.read.parquet(path)
        t_pruned, on_disk = best_of(
            lambda: ann.ivf_topk(
                queries, layout, cents, k=K, nprobe=nprobe, assigned=True
            ).collect()
        )
        ap2 = {(r["query_id"], r["vec_id"]) for r in on_disk}
        print(
            f"IVF partitioned layout (HOF scorer): build {t_build:.2f}s, "
            f"probe {t_pruned:.2f}s (speedup x{t_exact / t_pruned:.1f}), "
            f"recall@{K}={len(ex & ap2) / max(len(ex), 1):.3f}"
        )

        t_g, gem = best_of(
            lambda: ann.ivf_topk_gemm(
                queries, layout, cents, k=K, nprobe=nprobe
            ).collect()
        )
        ap3 = {(r["query_id"], r["vec_id"]) for r in gem}
        print(
            f"IVF partitioned layout (GEMM scorer): probe {t_g:.2f}s "
            f"(speedup x{t_exact / t_g:.1f} vs HOF exact, "
            f"x{t_gemm / t_g:.1f} vs GEMM exact), "
            f"recall@{K}={len(ex & ap3) / max(len(ex), 1):.3f}"
        )

        def du(p):
            return sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(p)
                for f in fs
            )

        path8 = os.path.join(tmp, "ivf8")
        t0 = time.time()
        ann.write_ivf_index(emb, path8, cents, metric="cosine", compression="int8")
        t_build8 = time.time() - t0
        layout8 = spark.read.parquet(path8)
        t_g8, gem8 = best_of(
            lambda: ann.ivf_topk_gemm(
                queries, layout8, cents, k=K, nprobe=nprobe
            ).collect()
        )
        ap4 = {(r["query_id"], r["vec_id"]) for r in gem8}
        print(
            f"IVF int8-compressed layout (GEMM scorer): build {t_build8:.2f}s, "
            f"probe {t_g8:.2f}s, bytes x{du(path8) / du(path):.2f} of float layout, "
            f"recall@{K}={len(ex & ap4) / max(len(ex), 1):.3f}"
        )

        t_rr, rr = best_of(
            lambda: ann.ivf_topk_rerank(
                queries, layout8, emb, cents, k=K, nprobe=nprobe, expand=4
            ).collect()
        )
        ap5 = {(r["query_id"], r["vec_id"]) for r in rr}
        print(
            f"IVF int8 + full-precision rerank (expand 4x): probe {t_rr:.2f}s, "
            f"recall@{K}={len(ex & ap5) / max(len(ex), 1):.3f}"
        )


if __name__ == "__main__":
    main()
