"""Scale check (round 7): the IVFPQ metric paths — raw/euclidean,
normalized/cosine, MIPS/dotproduct — at N synthetic vectors.

For each metric: build the matching transformed layout
(write_ivfpq_index flags), probe THROUGH the dispatcher
(operators.search.search — the sidecar-driven front door), time the
probe, and measure recall@K of the rerank output vs the exact GEMM
top-k under the same metric.

Usage: python tools/scale_check_ivfpq_metrics.py [N] [n_centroids] [nprobe] [fetch_k] [n_queries]
Defaults: 500_000 vectors, 128 centroids, probe 8, fetch_k 100, 16 queries.
``n_queries`` is the crossover dial: a probe's partition-pruning
advantage is proportional to 1 - coverage(n_queries x nprobe of
n_centroids buckets) — at 16 queries x nprobe 16 essentially every
bucket is probed and the probe scans what the exact scan scans; at 1-2
queries (the reference's per-request serving shape) the probe reads
nprobe/n_centroids of the layout.
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
    pq,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.search import (
    search,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.topk import (
    topk_search_gemm,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (
    get_spark,
)

DIM = 64
N_QUERIES = 16
K = 10


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_cent = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    nprobe = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    fetch_k = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    n_queries = int(sys.argv[5]) if len(sys.argv) > 5 else N_QUERIES

    spark = get_spark(
        "scale_check_ivfpq_metrics", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    spark.sparkContext.setLogLevel("ERROR")

    # seeded synthetic vectors (same generator as scale_check.py):
    # label-clustered so the coarse quantizer has real structure
    emb = (
        spark.range(n)
        .withColumn("label", (F.col("id") % 32).cast("int"))
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda i: (
                    F.sin(F.col("label") * 37 + i * 13) * 0.8
                    + F.sin(F.col("id") * 7919 + i * 104729) * 0.4
                ).cast("float"),
            ).alias("embedding"),
        )
        .drop("label")
    )
    emb = emb.repartition(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ).localCheckpoint()
    print(f"index: {emb.count():,} x {DIM}", file=sys.stderr)

    # boot the Python worker pool (bench.py convention)
    import pandas as pd

    def _noop(batches):
        for b in batches:
            yield pd.DataFrame({"n": [len(b)]})

    spark.range(256).repartition(32).mapInPandas(_noop, "n long").count()

    queries = emb.filter(F.col("vec_id") % (n // n_queries) == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )

    def best_of(fn, runs=2):
        best, out = None, None
        for _ in range(runs):
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return best, out

    def run_metric(metric: str, tmp: str):
        if metric == "euclidean":
            src, m, kb, flags = emb, 16, 64, {}
        elif metric == "cosine":
            src = pq._unit_normalized(emb, "embedding")
            m, kb, flags = 16, 64, {"normalize": True}
        else:  # dotproduct
            src = pq.mips_augmented(
                emb, "embedding", pq.mips_max_norm(emb, "embedding"), 68
            )
            m, kb, flags = 17, 64, {"mips": True}
        t0 = time.time()
        # refined coarse quantizer (raw lowest-id seeds partition badly
        # at this N — same step every IVF build in scale_check.py runs)
        cents = ann.lloyd_refine(
            src, ann.seed_centroids(src, n_cent), iters=2
        )
        if metric == "dotproduct":
            # MIPS layouts default residual=True (write_ivfpq_index
            # refuses raw codes), so train the matching residual books
            books = pq.train_pq_codebooks_residual(src, cents, m=m, k=kb)
        else:
            books = pq.train_pq_codebooks(src, m=m, k=kb)
        path = os.path.join(tmp, f"ivfpq_{metric}")
        pq.write_ivfpq_index(emb, path, cents, books, **flags)
        t_build = time.time() - t0

        t_probe, got = best_of(
            lambda: search(
                queries,
                emb,
                k=K,
                metric=metric,
                layout_path=path,
                nprobe=nprobe,
                fetch_k=fetch_k,
            ).collect()
        )
        t_exact, exact = best_of(
            lambda: topk_search_gemm(queries, emb, k=K, metric=metric).collect()
        )
        # like-for-like baseline: exact GEMM reading its floats from
        # the SAME parquet storage the probe reads (the in-memory
        # `emb` baseline above gives brute force a RAM scan the 100 TB
        # deployment doesn't have)
        spark = queries.sparkSession
        disk = spark.read.parquet(path).select("vec_id", "embedding")
        t_disk, _ = best_of(
            lambda: topk_search_gemm(queries, disk, k=K, metric=metric).collect()
        )
        import numpy as np
        qrows = queries.collect()
        Qx = np.array([r["qvec"] for r in qrows], dtype=np.float64)
        meta = pq.load_ivfpq_meta(path)
        cids = np.array([c for c, _ in meta["centroids"]], dtype=np.int64)
        Cx = np.array([v for _, v in meta["centroids"]], dtype=np.float64)
        if metric == "cosine":
            nrm = np.linalg.norm(Qx, axis=1, keepdims=True)
            Qx = np.where(nrm > 0, Qx / np.where(nrm == 0, 1.0, nrm), Qx)
        if metric == "dotproduct":
            Qx = np.hstack(
                [Qx, np.zeros((Qx.shape[0], Cx.shape[1] - Qx.shape[1]))]
            )
        d2x = (
            (Qx * Qx).sum(axis=1)[:, None]
            - 2.0 * (Qx @ Cx.T)
            + (Cx * Cx).sum(axis=1)[None, :]
        )
        orderx = np.lexsort((cids[None, :].repeat(len(Qx), 0), d2x), axis=1)
        probedx = {int(c) for row in cids[orderx[:, :nprobe]] for c in row}
        ex = {(r["query_id"], r["vec_id"]) for r in exact}
        ap = {(r["query_id"], r["vec_id"]) for r in got}
        recall = len(ex & ap) / max(len(ex), 1)
        print(
            f"{metric:10s} build {t_build:6.1f}s | probe {t_probe:5.2f}s "
            f"(nprobe {nprobe}/{n_cent}, fetch_k {fetch_k}) | "
            f"exact GEMM ram {t_exact:5.2f}s disk {t_disk:5.2f}s | "
            f"recall@{K} {recall:.3f} | speedup x{t_exact / t_probe:.1f} "
            f"(disk x{t_disk / t_probe:.1f}) | "
            f"buckets probed {len(probedx)}/{n_cent}"
        )

    metrics = tuple(
        m
        for m in ("euclidean", "cosine", "dotproduct")
        if m in os.environ.get(
            "SCALE_METRICS", "euclidean,cosine,dotproduct"
        ).split(",")
    )
    with tempfile.TemporaryDirectory() as tmp:
        for metric in metrics:
            run_metric(metric, tmp)


if __name__ == "__main__":
    main()
