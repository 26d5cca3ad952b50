"""Scale probe: span-level substring dedup (operators.dedup.
substring_span_pairs) on a 200k-doc synthetic corpus with planted
shared passages AND a universal boilerplate sentence (the hot-key
worst case df_cap exists for).

Corpus (fully deterministic, generated distributed — no driver loop):
- every doc: common 64-char boilerplate prefix + ~8 md5-unique chunks;
- every 20th doc additionally carries one of 1000 pool passages
  (96 chars), ~10 docs per passage -> planted near-dup cliques.

Reports: build+join wall time, pairs found, and the UNCAPPED
candidate-pair count implied by the span-hash df distribution
(sum df*(df-1)/2) — the blowup the cap prevents, without running it.

Usage: python tools/scale_check_substring.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.dedup import (
    substring_span_pairs,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (
    get_spark,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
SPAN, STRIDE, CAP = 40, 10, 1000

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

boiler = "standard corporate disclaimer text repeated on every page here ok "
docs = spark.range(N).select(
    F.col("id").alias("doc_id"),
    F.concat(
        F.lit(boiler),
        F.concat_ws(
            " ",
            *[F.md5(F.concat(F.lit(f"c{j}:"), F.col("id"))) for j in range(8)],
        ),
        F.when(
            F.col("id") % 20 == 0,
            F.concat(
                F.lit(" "),
                F.md5(F.concat(F.lit("p:"), F.pmod(F.col("id"), F.lit(1000)))),
                F.md5(F.concat(F.lit("q:"), F.pmod(F.col("id"), F.lit(1000)))),
                F.md5(F.concat(F.lit("r:"), F.pmod(F.col("id"), F.lit(1000)))),
            ),
        ).otherwise(F.lit("")),
    ).alias("text"),
).localCheckpoint()
n = docs.count()

t0 = time.time()
pairs = substring_span_pairs(docs, span_len=SPAN, stride=STRIDE, df_cap=CAP)
n_pairs = pairs.count()
t_capped = time.time() - t0

# df distribution of the span hashes (same shingling), uncapped blowup
t = F.col("text")
spans = (
    docs.filter(F.length(t) >= SPAN)
    .select(
        F.col("doc_id").alias("id"),
        F.explode(
            F.sequence(F.lit(1), F.length(t) - F.lit(SPAN - 1), F.lit(STRIDE))
        ).alias("pos"),
        t.alias("__t"),
    )
    .select(
        "id",
        F.md5(F.col("__t").substr(F.col("pos"), F.lit(SPAN)).cast("binary")).alias("h"),
    )
    .distinct()
)
dfreq = spans.groupBy("h").agg(F.count("*").alias("df"))
row = dfreq.agg(
    F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("uncapped_pairs"),
    F.max("df").alias("max_df"),
    F.sum(F.when(F.col("df") > CAP, 1).otherwise(0)).alias("n_capped_hashes"),
).first()

print(f"docs={n} span={SPAN} stride={STRIDE} df_cap={CAP}")
print(f"capped run: {t_capped:.1f}s, pairs={n_pairs}")
print(
    f"uncapped candidate pairs implied by df dist: {int(row['uncapped_pairs']):,} "
    f"(max df={row['max_df']}, hashes over cap={row['n_capped_hashes']})"
)
