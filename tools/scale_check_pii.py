"""Scale check: PII scrub throughput on a synthetic 5M-doc corpus.

The operator is a pure narrow map (zero exchanges — plan-pinned in
tests/test_pii.py), so the only scale question is regex bandwidth per
core. This check generates N docs (~360 B each) expression-side (no
driver materialization), plants identifiers on known doc_id residue
classes, scrubs, and full-materializes counts + an xxhash over the
scrubbed text. Asserts exact planted counts; prints rows/s and MB/s
for the SCALE.md row.

Usage: python tools/scale_check_pii.py [N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.pii import (
    scrub_documents,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (
    get_spark,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
FILLER = "the quick brown fox jumps over the lazy dog " * 7  # ~315 B


def main() -> None:
    spark = get_spark("scale-check-pii")
    spark.sparkContext.setLogLevel("ERROR")
    did = F.col("id")
    text = F.concat(
        F.lit(FILLER),
        F.lit(" contact user"),
        did.cast("string"),
        F.lit("@example.com"),
        F.when(did % 3 == 0, F.lit(" ssn 123-45-6789")).otherwise(F.lit("")),
        F.when(did % 5 == 0, F.lit(" from 10.1.2.3")).otherwise(F.lit("")),
    )
    docs = spark.range(N, numPartitions=64).select(
        did.alias("doc_id"), text.alias("text")
    )

    # total input bytes (ASCII): one extra pass, excluded from timing
    total_bytes = docs.agg(F.sum(F.length("text"))).collect()[0][0]

    t0 = time.time()
    out = scrub_documents(docs, keep_text=False)
    row = out.agg(
        F.sum("n_email").alias("email"),
        F.sum("n_ssn").alias("ssn"),
        F.sum("n_ipv4").alias("ipv4"),
        F.sum("n_pii").alias("pii"),
        F.bit_xor(F.xxhash64("doc_id", "text_scrubbed")).alias("h"),
    ).collect()[0]
    wall = time.time() - t0

    assert row["email"] == N, row
    assert row["ssn"] == (N + 2) // 3, row  # multiples of 3 in [0, N)
    assert row["ipv4"] == (N + 4) // 5, row
    assert row["pii"] == row["email"] + row["ssn"] + row["ipv4"], row

    mb = total_bytes / 1e6
    print(
        f"OK pii scale check: n={N} ({mb:.0f} MB raw) wall={wall:.1f}s "
        f"= {N / wall:,.0f} docs/s, {mb / wall:,.0f} MB/s on local[32]; "
        f"hash={row['h']}"
    )


if __name__ == "__main__":
    main()
