"""Scale check (round 14): frontier admission + the fetch list —
the crawl-loop closure measured beyond fixtures.

Two measurements, interleaved min-of-K with a GEMM canary (SCALE.md
round-10 host-noise protocol):

1. **Admission** (``streaming.frontier_admit.admit_frontier_candidates``):
   a persisted frontier of n_fetched fetched + n_pending pending rows,
   then one admission wave of n_cand candidate URLs (half already
   known — the anti-join must drop them — spread over n_hosts hosts,
   host-capped). End-to-end wall time includes the canonicalization,
   both frontier reads, the anti-join, the cap window, and the
   parquet write of the admitted wave — the whole per-wave cost a
   crawler pays. Reported throughput is candidate rows/s.

2. **Fetch list** (``pending_fetch_list``): pending ANTI fetched over
   the same persisted state + distinct — the read side a scheduler
   pays per planning cycle.

Usage: python tools/scale_check_admit.py [n_fetched] [n_pending] [n_cand] [n_hosts] [passes]
Defaults: 5_000_000 fetched, 2_000_000 pending, 5_000_000 candidates,
50_000 hosts, 3 passes.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (
    get_spark,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.streaming.frontier_admit import (
    admit_frontier_candidates,
    pending_fetch_list,
)
from tools.benchutil import gemm_canary as _gemm_canary  # noqa: E402


def main() -> None:
    n_fetched = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_pending = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    n_cand = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000_000
    n_hosts = int(sys.argv[4]) if len(sys.argv) > 4 else 50_000
    passes = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    spark = get_spark("scale_admit")
    spark.sparkContext.setLogLevel("ERROR")
    did = F.col("id")

    def url(i, tag):
        # already-canonical URLs: the canonicalizer's own throughput is
        # pinned separately (scale_check_urlcanon); this tool measures
        # the admission machinery around it
        return F.concat(
            F.lit("https://h"),
            (i % n_hosts).cast("string"),
            F.lit(f".example/{tag}/"),
            i.cast("string"),
        )

    host = F.concat(F.lit("h"), (did % n_hosts).cast("string"), F.lit(".example"))

    tmp = tempfile.mkdtemp(prefix="admit_scale_")
    fdir, pdir = f"{tmp}/frontier", f"{tmp}/pending"
    try:
        spark.range(n_fetched).select(
            url(did, "f").alias("canonical_url"), host.alias("host")
        ).write.parquet(f"{fdir}/batch_id=0")
        spark.range(n_pending).select(
            url(did, "p").alias("canonical_url"), host.alias("host")
        ).write.parquet(f"{pdir}/batch_id=0")

        # candidates: half re-discoveries of fetched URLs (anti-join
        # drops), half new
        cand = spark.range(n_cand).select(
            F.when(did % 2 == 0, url(did, "f"))
            .otherwise(url(did, "new"))
            .alias("url")
        )
        cand.localCheckpoint(eager=True)

        admit_best, fetch_best = float("inf"), float("inf")
        canaries = []
        for p in range(passes):
            canaries.append(_gemm_canary())
            t0 = time.time()
            stats = admit_frontier_candidates(
                spark, fdir, pdir, cand, wave=1, host_cap=200
            )
            admit_best = min(admit_best, time.time() - t0)
            shutil.rmtree(f"{pdir}/batch_id=1")  # fresh wave per pass

            t0 = time.time()
            n_list = pending_fetch_list(spark, fdir, pdir).count()
            fetch_best = min(fetch_best, time.time() - t0)
        print(
            f"admission: {n_cand:,} candidates over {n_hosts:,} hosts vs "
            f"{n_fetched:,} fetched + {n_pending:,} pending -> "
            f"{stats['n_admitted']:,} admitted in {admit_best:.2f}s best "
            f"({n_cand / admit_best / 1e6:.2f} M rows/s); "
            f"fetch list {n_list:,} rows in {fetch_best:.2f}s "
            f"({(n_pending) / fetch_best / 1e6:.2f} M pending rows/s); "
            f"canaries {canaries}"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
