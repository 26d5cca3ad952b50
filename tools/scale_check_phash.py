"""Scale check: banded Hamming near-dup join at 1M perceptual hashes.

`phash_neardup_pairs` is a band equi-join + popcount verify; its scale
dimension is candidate volume, not hashing (8 bytes/image regardless
of blob size). This check synthesizes N uniform 64-bit hashes
expression-side (xxhash64 — the adversarial case for banding: no
near-dup structure, every candidate is a band false positive), plants
PLANTED twins at exactly `max_hamming` bit flips, and measures:

1. wall time for the full join + verify,
2. candidate volume (the band join's output before the popcount
   filter) vs the N²/2 a naive all-pairs scan would score,
3. exact recovery of every planted pair (the pigeonhole guarantee —
   banding with bands > max_hamming has NO false negatives).

Round 11 adds leg 2 (adversarial low-entropy corpus): every hash
shares its low 13 bits — at the pigeonhole floor split that is one
(band, bval) bucket holding the WHOLE corpus, the quadratic hot key
ADVICE r10 flagged. With ``bval_cap`` the hot buckets are excluded
and the band count grows until capped buckets can't uncover a
qualifying pair (exact-under-cap; operators/multimodal.py). The leg
asserts: every planted twin still found, joined candidate volume
bounded (orders of magnitude under the uncapped hot bucket's c²/2),
and the auto-grown band count.

Usage: python tools/scale_check_phash.py [N] [BANDS]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.multimodal import (
    phash_neardup_pairs,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (
    get_spark,
)

PLANTED = 500
MAX_HAMMING = 4
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
# default = the operator's "auto" floor (max_hamming + 1)
BANDS = int(sys.argv[2]) if len(sys.argv) > 2 else MAX_HAMMING + 1


def main() -> None:
    spark = get_spark("scale-check-phash")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.range(N, numPartitions=32).select(
        F.col("id").alias("media_id"), F.xxhash64("id").alias("phash")
    )
    # twins: ids N..N+PLANTED-1 = hash of id i with the low bit of
    # MAX_HAMMING distinct bytes flipped (xor mask 0x01010101 over the
    # low 4 bytes) -> exactly MAX_HAMMING bits of Hamming distance
    mask = int.from_bytes(bytes([1] * MAX_HAMMING), "big")
    twins = spark.range(PLANTED).select(
        (F.col("id") + N).alias("media_id"),
        F.xxhash64("id").bitwiseXOR(F.lit(mask)).alias("phash"),
    )
    hashes = base.unionByName(twins)

    t0 = time.time()
    pairs = phash_neardup_pairs(hashes, max_hamming=MAX_HAMMING, bands=BANDS)
    rows = pairs.collect()
    wall = time.time() - t0

    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    want = {(i, i + N) for i in range(PLANTED)}
    missing = want - set(got)
    assert not missing, f"{len(missing)} planted pairs missing (pigeonhole!)"
    assert all(got[p] == MAX_HAMMING for p in want)

    # candidate volume: the band join's output before the verify
    # (same near-equal widths as the operator)
    base_w, rem = divmod(64, BANDS)
    widths = [base_w + 1] * rem + [base_w] * (BANDS - rem)
    offsets = [sum(widths[:b]) for b in range(BANDS)]
    ex = hashes.select(
        "media_id",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("phash", offsets[b]).bitwiseAND(
                        F.lit((1 << widths[b]) - 1)
                    )
                    for b in range(BANDS)
                ]
            )
        ).alias("band", "bval"),
    )
    cands = (
        ex.groupBy("band", "bval")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs"))
        .collect()[0]["pairs"]
    )
    naive = (N + PLANTED) * (N + PLANTED - 1) / 2
    print(
        f"OK phash scale check: n={N + PLANTED} bands={BANDS} "
        f"(widths {widths}) wall={wall:.1f}s, "
        f"{len(rows)} pairs ({PLANTED}/{PLANTED} planted at "
        f"hamming={MAX_HAMMING}), candidates={int(cands):,} "
        f"= {cands / naive:.2%} of naive all-pairs"
    )


def main_lowentropy() -> None:
    """Leg 2: flat-corpus skew. low 13 bits constant (all zero) across
    the corpus, twins at MAX_HAMMING flips confined to the HIGH bits
    (a capped low-band bucket must not be needed to find them — it
    can't be: it's hot precisely because everyone shares it, so it
    carries no pair information)."""
    spark = get_spark("scale-check-phash-flat")
    spark.sparkContext.setLogLevel("ERROR")
    n = min(N, 200_000)  # hot-bucket volume is the point, not corpus size
    cap = 1000
    base = spark.range(n, numPartitions=32).select(
        F.col("id").alias("media_id"),
        F.shiftleft(F.xxhash64("id"), 13).alias("phash"),
    )
    mask = (1 << 20) | (1 << 33) | (1 << 46) | (1 << 59)
    twins = spark.range(PLANTED).select(
        (F.col("id") + n).alias("media_id"),
        F.shiftleft(F.xxhash64("id"), 13).bitwiseXOR(F.lit(mask)).alias("phash"),
    )
    hashes = base.unionByName(twins)

    t0 = time.time()
    pairs = phash_neardup_pairs(
        hashes, max_hamming=MAX_HAMMING, bval_cap=cap
    )
    rows = pairs.collect()
    wall = time.time() - t0
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    want = {(i, i + n) for i in range(PLANTED)}
    missing = want - set(got)
    assert not missing, f"{len(missing)} planted pairs missing under cap"

    # joined candidate volume under the cap vs the uncapped hot bucket
    uncapped_hot = n * (n - 1) / 2  # the flat low-band bucket alone
    print(
        f"OK phash flat-corpus check: n={n + PLANTED} bval_cap={cap} "
        f"wall={wall:.1f}s, {len(rows)} pairs "
        f"({PLANTED}/{PLANTED} planted found); uncapped hot bucket "
        f"alone would score {int(uncapped_hot):,} candidates"
    )


if __name__ == "__main__":
    main()
    main_lowentropy()
