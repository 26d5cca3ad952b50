"""Targeted per-query timing + plan capture for optimization work.

Usage:
  python tools/perf_probe.py [-n PASSES] [--plans DIR [--suffix _before]] name [name ...]

Times each named registry query with the SAME methodology as bench.py
(count + bit_xor(xxhash64(all columns)) materialization), min/mean over
N interleaved passes, on local[$SPARK_GRAFT_CPUS] at $SPARK_GRAFT_SF_DIR
(default sf0.1). Optionally writes ``df.explain("formatted")`` output to
``<DIR>/<name><suffix>.txt`` (captured on the first pass, after the
query fn has run — for composite queries that execute work eagerly the
plan shown is the returned frame's plan, which is noted in the file).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", "--passes", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir to write explain output")
    ap.add_argument("--suffix", default="_before")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    for name in args.names:
        if name not in REGISTRY:
            sys.exit(f"unknown query: {name}")
    spark = get_spark("perf_probe", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # same warm-up as bench.py: parquet footers + the Python worker pool
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    def _noop(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame({"n": [len(b)]})

    spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
        _noop, "n long"
    ).count()

    attempts: dict[str, list[float]] = {n: [] for n in args.names}
    rows: dict[str, int] = {}
    n_jobs: dict[str, int] = {}
    for p in range(args.passes):
        for name in args.names:
            group = f"perf_probe:{name}:{p}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.time()
            df = REGISTRY[name].fn(spark, sf_dir)
            r = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.bit_xor(F.xxhash64(*df.columns)).alias("h"),
            ).first()
            attempts[name].append(time.time() - t0)
            rows[name] = r["n"]
            n_jobs[name] = len(
                spark.sparkContext.statusTracker().getJobIdsForGroup(group)
            )
            spark.sparkContext.setJobGroup(None, None)
            if p == 0 and args.plans:
                os.makedirs(args.plans, exist_ok=True)
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(
                    os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w"
                ) as fh:
                    fh.write(
                        f"# {name} — .explain('formatted') of the returned "
                        f"frame at {sf_dir}\n# (composites that execute "
                        f"eagerly inside the query fn show only the final "
                        f"frame here; internal stage plans are captured "
                        f"separately where they matter)\n\n"
                    )
                    fh.write(buf.getvalue())
    for name in args.names:
        a = attempts[name]
        print(
            f"{name}: min {min(a):.3f}s mean {sum(a)/len(a):.3f}s "
            f"({rows[name]} rows, {n_jobs[name]} spark jobs) "
            f"attempts {[round(x,3) for x in a]}"
        )


if __name__ == "__main__":
    main()
