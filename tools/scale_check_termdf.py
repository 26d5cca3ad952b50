"""Scale check (round 12): does the termdf sidecar hint actually help
ABOVE its size gate?

``TERMDF_HINT_MIN_DOCS = 250_000`` was set in round 11 from
fixture-scale evidence that the hint's extra Spark job costs more
than it saves on a small corpus — but there was no measurement that
it helps above the gate. This builds the persisted lexical layout at
N synthetic Zipf-ish docs (stopword-grade terms present by
construction) and measures the BM25 probe with the hint enabled
(default path at this corpus size) vs force-disabled
(``TERMDF_HINT_MIN_DOCS`` monkeypatched above N), interleaved
min-of-K with a GEMM canary per pass.

What the hint buys: a blocked (over-cap) query term is dropped BEFORE
the postings scan, so its posting list — the largest row-proportional
read the df-cap would discard anyway — is never touched. Without the
hint the stopword's full postings are scanned and aggregated just to
be dropped by the cap.

Usage: python tools/scale_check_termdf.py [n_docs] [n_queries] [passes]
Defaults: 500_000 docs, 8 queries, 3 passes.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (
    get_spark,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources import (
    lexical_index,
)
from tools.scale_check_lexical import synth_docs


from tools.benchutil import gemm_canary as _gemm_canary  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("scale_termdf")
    spark.sparkContext.setLogLevel("ERROR")

    docs = synth_docs(spark, n).localCheckpoint(eager=True)
    queries = (
        docs.filter(F.col("doc_id") < nq)
        .select(F.col("doc_id").alias("query_id"), "text")
        .localCheckpoint(eager=True)
    )

    gate = lexical_index.TERMDF_HINT_MIN_DOCS
    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.time()
        idx = lexical_index.LexicalIndex(spark, f"{tmp}/lex").create(
            docs, term_buckets=64, doc_buckets=32
        )
        t_build = time.time() - t0

        # a df_cap that actually BLOCKS stopword-grade terms in this
        # corpus (0.5 blocks nothing here — measured r12; a hint with
        # an empty blocked set can neither help nor hurt, so the
        # comparison would be pure noise)
        df_cap = 0.02

        def probe() -> tuple[float, int]:
            t0 = time.time()
            c = idx.bm25_topk(queries, k=10, df_cap=df_cap).count()
            return time.time() - t0, c

        n_blocked = len(
            idx._blocked_terms(
                [r["term"] for r in (
                    lexical_index._tokens(
                        queries.select(F.col("query_id").alias("qid"), "text"),
                        "qid", "text",
                    ).select("term").distinct().collect()
                )],
                list(range(64)),
                df_cap,
                n,
            )
        )
        probe()  # warm
        hint_t, nohint_t, canaries = [], [], []
        for i in range(passes):
            canaries.append(_gemm_canary())
            # ALTERNATE order per pass: the second probe of a pair
            # rides the first's OS page cache, which biased the
            # original fixed-order run by ~0.6 s (SCALE.md round 12)
            order = (gate, 10**18) if i % 2 == 0 else (10**18, gate)
            for g in order:
                lexical_index.TERMDF_HINT_MIN_DOCS = g
                dt, c = probe()
                (hint_t if g == gate else nohint_t).append(round(dt, 2))
                if g == gate:
                    c_hint = c
                else:
                    c_no = c
        lexical_index.TERMDF_HINT_MIN_DOCS = gate
        assert c_hint == c_no, (c_hint, c_no)  # hint never changes results

    h, nh = min(hint_t), min(nohint_t)
    print(
        f"n_docs={n} n_queries={nq} passes={passes} gate={gate} "
        f"df_cap={df_cap} blocked_query_terms={n_blocked}"
    )
    print(f"canary_gflops={canaries} (results equal: {c_hint} rows)")
    print(f"layout build (once):    {t_build:8.2f} s")
    print(f"probe WITH termdf hint: {h:8.2f} s   (attempts {hint_t})")
    print(f"probe WITHOUT hint:     {nh:8.2f} s   (attempts {nohint_t})")
    print(f"hint speedup:           {nh / h:8.2f}x")


if __name__ == "__main__":
    main()
