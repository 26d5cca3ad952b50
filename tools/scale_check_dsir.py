"""DSIR at scale: weight + select over a synthetic N-doc corpus.

Generates N docs JVM-side (20 tokens each, drawn deterministically
from two 512-word vocabularies so 'target-like' and 'other' docs are
separable), computes DSIR log-weights toward a 1%-slice target, and
runs the Gumbel-top-k selection. Reports wall times, the λ-table size
(the ONLY model state — must stay ≤ 256 rows at any corpus size), and
the selection's target-domain purity (directional sanity: importance
resampling must enrich target-like docs).

Usage: python tools/scale_check_dsir.py [N]   (default 1_000_000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators import (  # noqa: E402
    dsir,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(
        "scale_check_dsir", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    # doc i: 20 tokens; even ids draw from vocab A ("tgt<j>"), odd ids
    # from vocab B ("oth<j>") — j a cheap per-position mix of (id, pos)
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(19)),
                lambda p: F.concat(
                    F.when(F.col("id") % 2 == 0, F.lit("tgt")).otherwise(
                        F.lit("oth")
                    ),
                    F.pmod(
                        F.col("id") * 31 + p * 131 + (F.col("id") + p) * 7,
                        F.lit(512),
                    ).cast("string"),
                ),
            ),
        ).alias("text"),
    ).localCheckpoint(eager=True)
    # target: a 1% slice of the even (target-like) ids
    target = docs.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") % 200 == 0))

    t0 = time.time()
    w = dsir.dsir_log_weights(docs, target)
    wc = w.count()
    t_w = time.time() - t0

    lam_rows = (
        dsir.bucket_histogram(docs).count()
    )  # model-size bound: ≤ 256 whatever N is

    t0 = time.time()
    sel = dsir.dsir_sample(docs, target, n=10_000).select("doc_id").collect()
    t_s = time.time() - t0
    purity = sum(1 for r in sel if r["doc_id"] % 2 == 0) / len(sel)

    print(
        f"N={n:,}: weights over {wc:,} docs in {t_w:.1f}s | "
        f"model rows {lam_rows} (bound 256) | "
        f"Gumbel-top-10k in {t_s:.1f}s | target-domain purity {purity:.3f} "
        f"(pool is 50/50 — importance resampling must push this → 1)"
    )


if __name__ == "__main__":
    main()
