"""Scale check: lexical probe from the PERSISTED inverted-index layout
vs per-call corpus re-tokenization, plus incremental upsert vs full
rebuild.

The rebuild path (operators/hybrid.py) re-tokenizes every document and
re-aggregates df/idf for every query batch — O(|corpus|) per call. The
persisted layout (sources/lexical_index.py) pays tokenization once at
build time; a probe scans only the term buckets its query terms hash
to and the slim doc-store stats columns — O(postings of query terms).

Usage: python tools/scale_check_lexical.py [n_docs] [n_queries]
Defaults: 200_000 synthetic docs, 8 queries.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.hybrid import (
    bm25_topk,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (
    get_spark,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.lexical_index import (
    LexicalIndex,
)

VOCAB = 5000
DOC_LEN = 40


def synth_docs(spark, n: int, start: int = 0):
    """Deterministic ~Zipf-ish docs: token j of doc i is
    'w<xxhash(i*DOC_LEN+j) % (1 + (hash % VOCAB))>' — low ids appear
    far more often, giving a realistic skewed df distribution."""
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(DOC_LEN)),
                lambda j: F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.xxhash64(F.col("id") * DOC_LEN + j),
                        F.pmod(F.xxhash64(F.col("id") + j * 7919), VOCAB) + 1,
                    ),
                ),
            ),
        ).alias("text"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("scale_lexical")
    docs = synth_docs(spark, n).localCheckpoint(eager=True)
    queries = (
        docs.filter(F.col("doc_id") < nq)
        .select(F.col("doc_id").alias("query_id"), "text")
        .localCheckpoint(eager=True)
    )

    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.time()
        idx = LexicalIndex(spark, f"{tmp}/lex").create(
            docs, term_buckets=64, doc_buckets=32
        )
        t_build = time.time() - t0

        t0 = time.time()
        r_idx = idx.bm25_topk(queries, k=10)
        n_idx = r_idx.count()
        t_probe = time.time() - t0

        t0 = time.time()
        r_raw = bm25_topk(queries, docs, k=10)
        n_raw = r_raw.count()
        t_rebuild = time.time() - t0

        batch = synth_docs(spark, 1_000, start=n)
        t0 = time.time()
        idx.upsert(batch, batch=1)
        t_upsert = time.time() - t0

        t0 = time.time()
        merged = docs.join(batch.select("doc_id"), "doc_id", "left_anti").unionByName(batch)
        LexicalIndex(spark, f"{tmp}/rebuild").create(
            merged, term_buckets=64, doc_buckets=32
        )
        t_full = time.time() - t0

        print(f"n_docs={n} n_queries={nq} (results: idx={n_idx} raw={n_raw})")
        print(f"layout build (once):        {t_build:8.2f} s")
        print(f"probe from layout:          {t_probe:8.2f} s")
        print(f"rebuild-per-call probe:     {t_rebuild:8.2f} s   ({t_rebuild / t_probe:.1f}x probe)")
        print(f"incremental upsert (1k):    {t_upsert:8.2f} s")
        print(f"full rebuild (same batch):  {t_full:8.2f} s   ({t_full / t_upsert:.1f}x upsert)")


if __name__ == "__main__":
    main()
