"""Scale probe for the top CORPUS-RIDING composites (VERDICT r15 #7):
at sf0.1 every bench query is fixed-overhead-bound (all 8-vs-32-core
ratios ~1), so sf0.1 deltas cannot evidence the 100 TB claims. This
tool inflates the sf0.1 corpus tables M× (deterministic id-shifted
copies — documents doc_id' = doc_id + i*OFFSET, embeddings likewise;
text/embedding payloads reused verbatim) into a local dir and times
the composites whose work grows with the corpus, so the core-count
scaling ratio becomes measurable. The web composites deliberately do
NOT ride this corpus (their link fixture pins doc_id < N_LINK_DOCS);
their scale story is tools/scale_check_admit.py.

This generates its own INPUT data per run directory (a deterministic
function of the committed fixtures, reused across invocations like
any input table); it never stores query RESULTS.

Usage:
  SPARK_GRAFT_CPUS=32 python tools/scale_check_composites.py [M] [PASSES]
  SPARK_GRAFT_CPUS=8  python tools/scale_check_composites.py [M] [PASSES]
(default M=32 -> 160k docs / 64k vectors; compare the two printed
per-query minimums for the scaling ratio.)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M = int(sys.argv[1]) if len(sys.argv) > 1 else 32
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 3
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = f"/tmp/sfscale_m{M}"
OFFSET = 1_000_000  # > any fixture id; keeps per-copy ids disjoint

QUERIES = [
    "corpus_curation_pipeline_dsir",
    "corpus_curation_pipeline_gopher",
    "corpus_perplexity_buckets_kll",
    "hybrid_rrf_topk_indexed",
    "rag_chat_ann_e2e",
]


def _gen() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(DST, exist_ok=True)
    for name, id_col in (("documents", "doc_id"), ("embeddings", "vec_id")):
        out = os.path.join(DST, f"{name}.parquet")
        if os.path.exists(out):
            continue
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        ids = t.column(id_col)
        copies = []
        for i in range(M):
            shifted = pa.compute.add(ids, i * OFFSET)
            copies.append(t.set_column(t.schema.get_field_index(id_col), id_col, shifted))
        pq.write_table(pa.concat_tables(copies), out)
    # the composites above read only documents/embeddings; link the
    # remaining tables so load() finds them if a query touches one
    for f in os.listdir(SRC):
        dst = os.path.join(DST, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f), dst)


def main() -> None:
    _gen()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.queries import (
        REGISTRY,
        _import_all,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (
        get_spark,
    )

    _import_all()
    spark = get_spark("scale_composites", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{DST}/documents.parquet").count()  # warm footers

    def _noop(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame({"n": [len(b)]})

    spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
        _noop, "n long"
    ).count()

    attempts = {n: [] for n in QUERIES}
    for p in range(PASSES):
        for name in QUERIES:
            spark.sparkContext.setJobDescription(f"scale:{name}:{p}")
            t0 = time.time()
            df = REGISTRY[name].fn(spark, DST)
            df.agg(
                F.count(F.lit(1)).alias("n"),
                F.bit_xor(F.xxhash64(*df.columns)).alias("h"),
            ).first()
            attempts[name].append(time.time() - t0)
    print(f"# cpus={cpus} M={M} docs={5000*M} vecs={2000*M}")
    for name in QUERIES:
        a = attempts[name]
        print(
            f"{name}: min {min(a):.2f}s mean {sum(a)/len(a):.2f}s "
            f"attempts {[round(x, 2) for x in a]}"
        )


if __name__ == "__main__":
    main()
