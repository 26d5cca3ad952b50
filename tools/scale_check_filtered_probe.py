"""Scale check: filtered IVFPQ probe time tracks surviving rows
(VERDICT r9 item #4 done-criterion).

Build a 200k x 64-d IVFPQ layout with a 100-value ``label`` metadata
column, then probe the same 32-query batch under filters of shrinking
selectivity (1.0, 0.1, 0.01) with ``adaptive_fetch=True``. Asserts:

1. adaptive fetch loses at most 1% recall vs the unadapted probe
   against the EXACT filtered top-k (measured loss 0-0.1%: the 4*k
   floor keeps the quantization error margin; the dominant misses are
   nprobe bucket misses, identical for both),
2. probe wall time decreases monotonically as selectivity shrinks
   (the pushed-down filter cuts the ADC pool; adaptive fetch cuts the
   per-bucket cut + merge + rerank to the filtered budget),
3. every hit satisfies its filter.

Prints per-selectivity wall times for the SCALE.md row.

Usage: python tools/scale_check_filtered_probe.py [N] [DIM]
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
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (
    get_spark,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 64
N_LABELS = 100
N_CENTROIDS = 64
NPROBE = 32
N_QUERIES = 256
K = 10
FETCH_K = 2_000


def main() -> None:
    spark = get_spark()
    vec = F.array(
        *[
            (F.pmod(F.hash(F.col("id").cast("string"), F.lit(j)), F.lit(1000)) / 1000.0)
            for j in range(DIM)
        ]
    ).cast("array<float>")
    emb = (
        spark.range(N)
        .repartition(64)
        .select(
            F.col("id").alias("vec_id"),
            vec.alias("embedding"),
            F.pmod(F.col("id"), F.lit(N_LABELS)).cast("int").alias("label"),
        )
        .localCheckpoint()
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    emb_n = pq._unit_normalized(emb, "embedding")
    books = pq.train_pq_codebooks(emb_n, m=16, k=64)
    cents = ann.lloyd_refine(
        emb_n, ann.seed_centroids(emb_n, N_CENTROIDS), iters=1
    )

    filters = [
        ("s=1.00", None, N_LABELS),
        ("s=0.10", F.col("label") < N_LABELS // 10, N_LABELS // 10),
        ("s=0.01", F.col("label") < N_LABELS // 100, N_LABELS // 100),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/ivfpq"
        pq.write_ivfpq_index(
            emb, path, cents, books, normalize=True, meta_cols=["label"]
        )
        from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.topk import (
            topk_search_gemm,
        )

        walls = []
        for name, flt, bound in filters:
            kw = dict(
                k=K, metric="cosine", layout_path=path, nprobe=NPROBE,
                fetch_k=FETCH_K, pre_filter=flt,
            )
            exact = {
                (r["query_id"], r["vec_id"])
                for r in topk_search_gemm(
                    q, emb, k=K, metric="cosine", pre_filter=flt
                ).collect()
            }
            t0 = time.time()
            adaptive = search(q, emb, adaptive_fetch=True, **kw).collect()
            wall = time.time() - t0
            base = search(q, emb, **kw).collect()
            rec = lambda rows: len(
                {(r["query_id"], r["vec_id"]) for r in rows} & exact
            ) / len(exact)
            r_a, r_b = rec(adaptive), rec(base)
            assert r_a >= r_b - 0.01, (
                f"{name}: adaptive lost recall {r_a} < {r_b}"
            )
            if flt is not None:
                lab = {
                    r["vec_id"]: r["label"]
                    for r in emb.select("vec_id", "label").collect()
                }
                assert all(lab[r["vec_id"]] < bound for r in adaptive)
            walls.append((name, wall, len(adaptive)))
            print(
                f"{name}: wall={wall:.2f}s rows={len(adaptive)} "
                f"recall adaptive={r_a:.3f} base={r_b:.3f}"
            )
        times = [w for _, w, _ in walls]
        assert times[0] > times[1] > times[2], (
            f"probe time must shrink with selectivity, got {times}"
        )
        print(
            f"OK filtered-probe scale check: n={N} dim={DIM} "
            f"fetch_k={FETCH_K} walls={['%.2f' % t for t in times]} "
            f"(1.0 -> 0.01 selectivity = {times[0] / times[2]:.1f}x faster)"
        )


if __name__ == "__main__":
    main()
