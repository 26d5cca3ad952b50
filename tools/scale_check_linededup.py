"""Scale check (round 14): corpus-wide common-line dedup beyond the
fixture — blocklist build + order-preserving strip at millions of
docs (tools convention: min-of-K interleaved with a GEMM canary).

Synthetic corpus: n_docs docs × ~n_lines lines, with a planted
boilerplate layer (one universal banner + per-site crumbs shared by
docs of the same site mod) over unique content lines — roughly the
web shape the operator exists for (a few very-hot lines, a long
unique tail).

Usage: python tools/scale_check_linededup.py [n_docs] [n_lines] [passes]
Defaults: 2_000_000 docs, 12 lines/doc (~24M lines), 3 passes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.dedup import (
    common_lines,
    strip_common_lines,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (
    get_spark,
)
from tools.benchutil import gemm_canary as _gemm_canary  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_lines = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("scale_linededup")
    spark.sparkContext.setLogLevel("ERROR")
    d = F.col("id")

    unique = F.concat_ws(
        "\n",
        *[
            F.concat(
                F.lit(f"content line {i} of doc "),
                d.cast("string"),
                F.lit(" with some filler words around it"),
            )
            for i in range(n_lines - 2)
        ],
    )
    text = F.concat(
        F.lit("COOKIE BANNER ACCEPT ALL TRACKING\n"),
        F.lit("site crumb "),
        (d % 5000).cast("string"),  # ~400 docs/site: well over threshold
        F.lit(" home about contact\n"),
        unique,
    )
    docs = (
        spark.range(n_docs)
        .select(d.alias("doc_id"), text.alias("text"))
        .localCheckpoint(eager=True)
    )
    total_lines = n_docs * n_lines

    bl_best = strip_best = float("inf")
    canaries = []
    for _ in range(passes):
        canaries.append(_gemm_canary())
        t0 = time.time()
        bl = common_lines(docs, min_count=100).localCheckpoint(eager=True)
        n_bl = bl.count()
        bl_best = min(bl_best, time.time() - t0)
        t0 = time.time()
        out = strip_common_lines(docs, bl)
        agg = out.agg(
            F.sum("n_lines_before").alias("b"), F.sum("n_lines_after").alias("a")
        ).first()
        strip_best = min(strip_best, time.time() - t0)
    removed = agg["b"] - agg["a"]
    print(
        f"blocklist: {total_lines:,} lines over {n_docs:,} docs -> "
        f"{n_bl:,} blocked lines in {bl_best:.2f}s best "
        f"({total_lines / bl_best / 1e6:.2f} M lines/s); "
        f"strip: {removed:,} lines removed in {strip_best:.2f}s best "
        f"({total_lines / strip_best / 1e6:.2f} M lines/s); "
        f"canaries {canaries}"
    )


if __name__ == "__main__":
    main()
