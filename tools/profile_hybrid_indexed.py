"""Stage attribution for `hybrid_rrf_topk_indexed` (the slowest
recurring non-composite headline, ~6 s at sf0.1): which stage owns the
wall clock — the LexicalIndex BUILD (tokenize + postings groupBy +
layout write, included in the query by the honest-accounting
convention of _with_lexical_index), the pruned-postings lexical probe,
the vector top-k side, or the RRF fuse + collect.

Interleaved min-of-N in one process (SCALE.md round-10 addendum: any
single-shot timing on this box can be off by 10-100x). Diagnostic
only — not a committed SCALE row.

Usage: python tools/profile_hybrid_indexed.py [SF_DIR] [PASSES]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.hybrid import (
    rrf_fuse,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.topk import (
    topk_search,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.queries import (
    REGISTRY,
    _import_all,
    load,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (
    get_spark,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.lexical_index import (
    LexicalIndex,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 3
N_QUERIES, LEX_K, FIX_CAP, VEC_K, FUSE_K = 8, 10, 0.8, 10, 5


def main() -> None:
    _import_all()
    spark = get_spark(
        "profile_hybrid_indexed", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, SF_DIR, "documents")
    emb = load(spark, SF_DIR, "embeddings")
    q = docs.filter(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    qv = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    # warm: parquet footers + python worker pool
    docs.count(), emb.count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    stages = ["build", "lex_probe", "vec_topk", "fuse_collect", "full_query"]
    mins = {s: float("inf") for s in stages}
    for p in range(PASSES):
        with tempfile.TemporaryDirectory() as tmp:
            t0 = time.time()
            idx = LexicalIndex(spark, f"{tmp}/lex").create(docs)
            mins["build"] = min(mins["build"], time.time() - t0)

            t0 = time.time()
            lex = idx.lexical_topk(q, k=LEX_K, df_cap=FIX_CAP)
            lex_rows = lex.collect()
            mins["lex_probe"] = min(mins["lex_probe"], time.time() - t0)

            t0 = time.time()
            vec = topk_search(qv, emb, k=VEC_K, metric="cosine").select(
                "query_id",
                F.col("vec_id").alias("doc_id"),
                F.col("rank").alias("vec_rank"),
            )
            vec_rows = vec.collect()
            mins["vec_topk"] = min(mins["vec_topk"], time.time() - t0)

            t0 = time.time()
            lex_df = spark.createDataFrame(lex_rows, lex.schema)
            out = rrf_fuse(lex_df, vec, k=FUSE_K, k0=60)
            out.collect()
            mins["fuse_collect"] = min(
                mins["fuse_collect"], time.time() - t0
            )

        # the registered query end-to-end, same pass (bench's shape)
        t0 = time.time()
        df = REGISTRY["hybrid_rrf_topk_indexed"].fn(spark, SF_DIR)
        df.agg(
            F.count(F.lit(1)), F.bit_xor(F.xxhash64(*df.columns))
        ).first()
        mins["full_query"] = min(mins["full_query"], time.time() - t0)
        print(f"# pass {p + 1}: " + ", ".join(f"{s}={mins[s]:.2f}s" for s in stages))

    total_parts = sum(mins[s] for s in stages[:-1])
    print(
        "RESULT "
        + ", ".join(f"{s}={mins[s]:.2f}s" for s in stages)
        + f" | sum(parts)={total_parts:.2f}s"
    )


if __name__ == "__main__":
    main()
