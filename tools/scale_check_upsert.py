"""Scale check: incremental bucketed upsert vs full-index rewrite.

Builds a synthetic index of N records, then measures the cost of a
small follow-up batch (the steady-state ingest shape). Before round 2
the upsert re-read, re-merged, and re-wrote the ENTIRE index per
batch; the bucketed layout only touches the buckets the batch's ids
hash into, so the micro-batch cost must be O(|batch| + touched
buckets), not O(|index|).

Usage: python tools/scale_check_upsert.py [N] [batch]
Defaults: 500_000 rows, 1_000-row follow-up batch.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.index_table import (
    N_BUCKETS,
    VectorIndex,
    bucket_of,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (
    get_spark,
)

DIM = 64


def synth_records(spark, n: int, start: int = 0, tag: str = "t"):
    return (
        spark.range(start, start + n)
        .select(F.col("id").alias("num"))
        .select(
            F.concat(F.lit("id"), F.col("num")).alias("id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(DIM)),
                lambda i: (F.xxhash64(F.col("num") * i) % 1000).cast("float") / 1000.0,
            ).alias("embedding"),
            F.concat(F.lit(tag), F.col("num")).alias("text"),
            F.lit("synthetic").alias("source"),
            F.lit(0).alias("chunk_index"),
        )
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    spark = get_spark("scale_check_upsert")
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as tmp:
        idx = VectorIndex(spark, tmp, "scale").create(dimension=DIM)

        t0 = time.time()
        total = idx.upsert(synth_records(spark, n), batch=1)
        t_build = time.time() - t0
        print(f"initial build: {total} rows in {t_build:.2f}s")

        # steady-state micro-batches: overwrite existing ids. Hash ids
        # spread uniformly, so touched buckets ≈ min(|batch|, N_BUCKETS):
        # a batch much smaller than N_BUCKETS is where incremental wins
        # (at 100 TB raise N_BUCKETS so batch/N_BUCKETS stays small).
        for i, bsz in enumerate([batch, max(batch // 100, 4)]):
            small = synth_records(spark, bsz, start=0, tag=f"v{i + 2}")
            touched = small.select(bucket_of("id").alias("b")).distinct().count()
            t0 = time.time()
            total = idx.upsert(small, batch=i + 2)
            t_incr = time.time() - t0
            print(
                f"incremental batch of {bsz}: {t_incr:.2f}s "
                f"({touched}/{N_BUCKETS} buckets touched, index still {total} rows); "
                f"ratio vs build {t_incr / t_build:.3f} "
                f"(pre-bucketing >= 1.0 by construction)"
            )


if __name__ == "__main__":
    main()
