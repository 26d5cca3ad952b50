"""Scale check (round 12): the URL canonicalizer at 100M rows.

``functions.url.canonicalize_url`` is 6 regexp passes + a
split/filter/sort/join over query params per row — the claim in the
round-11 verdict was "scan bandwidth", but the regex engine (not
shuffle: there is none) is the risk. This measures it directly:
synthesize N messy URLs from ``spark.range`` arithmetic (the
``web_url_dedup`` plant shapes: case variants, default ports,
fragments, utm/gclid params, trailing slashes), then time

- baseline: xxhash64-fold over the RAW url (synthesis + scan cost)
- canon:    xxhash64-fold over ``canonicalize_url(url)`` (Column form)
- staged:   xxhash64-fold over ``with_canonical_url(df)`` (the
            staged-projection scan-scale form)

so (variant - baseline) isolates each form's own cost. Interleaved
min-of-N with a GEMM canary per pass (SCALE.md round-10 host-noise
protocol). The two variants must produce the SAME xxhash fold — the
tool asserts it, a free 100M-row semantic parity check on top of the
oracle.

Usage: python tools/scale_check_urlcanon.py [n_rows] [n_passes]
Defaults: 100_000_000 rows, 3 passes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.url import (
    canonicalize_url,
    with_canonical_url,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (
    get_spark,
)


from tools.benchutil import gemm_canary as _gemm_canary  # noqa: E402


def messy_url(did):
    return F.concat(
        F.when(did % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
        F.lit("://WWW.Example"),
        (did % 100_000).cast("string"),
        F.lit(".COM"),
        F.when(
            did % 4 == 0,
            F.when(did % 2 == 0, F.lit(":80")).otherwise(F.lit(":443")),
        ).otherwise(F.lit("")),
        F.lit("/Docs/"),
        (did % 1_000_000).cast("string"),
        F.when(did % 8 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(did % 3 == 0, F.lit("?utm_source=feed&b=2&a=1&gclid=Z"))
        .when(did % 3 == 1, F.lit("?a=1&b=2"))
        .otherwise(F.lit("")),
        F.when(did % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("scale_urlcanon")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.range(n).select(messy_url(F.col("id")).alias("url"))
    frames = {
        "raw": base.select(F.col("url").alias("u")),
        "column": base.select(canonicalize_url("url").alias("u")),
        "staged": with_canonical_url(base, out_col="u").select("u"),
    }

    def run(df) -> tuple[float, int, int]:
        t0 = time.time()
        r = df.agg(
            F.count(F.lit(1)).alias("c"), F.bit_xor(F.xxhash64("u")).alias("h")
        ).first()
        return time.time() - t0, r["c"], r["h"]

    run(frames["raw"])  # warm codegen + JVM

    times: dict[str, list[float]] = {k: [] for k in frames}
    hashes: dict[str, int] = {}
    canaries = []
    for _ in range(passes):
        canaries.append(_gemm_canary())
        for k, df in frames.items():
            dt, c, h = run(df)
            times[k].append(round(dt, 2))
            assert c == n
            hashes[k] = h
    # 100M-row semantic parity: both forms fold to the same hash
    assert hashes["column"] == hashes["staged"], hashes
    raw = min(times["raw"])
    print(f"n_rows={n} passes={passes} canary_gflops={canaries}")
    print(f"raw synth+hash:  {raw:8.2f} s  ({n / raw / 1e6:.1f} M rows/s)")
    for k in ("column", "staged"):
        t = min(times[k])
        delta = max(t - raw, 1e-9)
        print(
            f"{k:7s} total:   {t:8.2f} s  ({n / t / 1e6:.1f} M rows/s); "
            f"own cost {delta:.2f} s ({n / delta / 1e6:.1f} M rows/s)"
            f"  [attempts {times[k]}]"
        )


if __name__ == "__main__":
    main()
