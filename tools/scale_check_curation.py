"""Scale probe: the new curation-stage operators on a synthetic
corpus orders of magnitude past the fixtures —

1. decontamination (operators.dedup.eval_overlap): N corpus docs vs a
   2k-doc eval set, broadcast-probe path; plus the planted-overlap
   recall check (every 100th doc embeds an eval passage, so flagged
   count is known by construction);
2. bigram-LM scoring (operators.lm.bigram_nll_scores): model build +
   corpus scoring wall time — shuffle ∝ distinct bigrams, which the
   probe pins by drawing tokens from a fixed 5k vocabulary;
3. sequence packing (operators.packing.pack_sequences): one shuffle +
   linear Arrow pass, throughput in docs/s, fill-rate from
   packing_stats as the sanity output.

Corpus: ~40 tokens/doc from a 5k Zipf-ish vocab (md5-derived, fully
deterministic, generated distributed — no driver loop).

Usage: python tools/scale_check_curation.py [n_docs]   (default 500k)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.dedup import (
    eval_overlap,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.lm import (
    bigram_nll_scores,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (
    get_spark,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
N_EVAL = 2_000
PLANT_EVERY = 100  # every 100th corpus doc embeds an eval passage
TOKENS_PER_DOC = 40
VOCAB = 5_000

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")


def _word(expr):
    # md5-derived token from a 5k Zipf-ish vocab: squaring a uniform
    # skews mass toward low ids (hot stopword-like tokens exist)
    u = F.conv(F.substring(F.md5(expr.cast("string")), 1, 6), 16, 10).cast("long")
    return F.concat(F.lit("w"), F.pmod((u * u) / F.lit(16_777_216), F.lit(VOCAB)).cast("long").cast("string"))


def _text(id_col, salt):
    return F.concat_ws(
        " ",
        *[_word(F.concat(F.lit(f"{salt}{j}:"), id_col)) for j in range(TOKENS_PER_DOC)],
    )


# eval set: distinct token stream (salt "e") so baseline overlap ~ 0
evalset = spark.range(N_EVAL).select(
    F.col("id").alias("doc_id"), _text(F.col("id"), "e").alias("text")
).localCheckpoint()

# corpus: unique stream, but every PLANT_EVERY-th doc appends the
# first 8 tokens of eval doc (id/PLANT_EVERY mod N_EVAL) — a planted
# 8-token eval passage => >= 1 shared 8-gram... use n=4 shingles so
# the plant yields 5 shared 4-grams
plant_src = F.pmod(F.col("id") / F.lit(PLANT_EVERY), F.lit(N_EVAL)).cast("long")
corpus = spark.range(N).select(
    F.col("id").alias("doc_id"),
    F.when(
        F.col("id") % PLANT_EVERY == 0,
        F.concat_ws(
            " ",
            _text(F.col("id"), "c"),
            F.concat_ws(" ", *[_word(F.concat(F.lit(f"e{j}:"), plant_src)) for j in range(8)]),
        ),
    )
    .otherwise(_text(F.col("id"), "c"))
    .alias("text"),
).localCheckpoint()
n = corpus.count()

t0 = time.time()
flagged = eval_overlap(corpus, evalset, n=4).localCheckpoint()
n_flagged = flagged.count()
t_decon = time.time() - t0
expected = N // PLANT_EVERY
print(
    f"decontaminate: {n} docs vs {N_EVAL} eval in {t_decon:.1f}s "
    f"({n / t_decon:,.0f} docs/s); flagged={n_flagged} planted={expected}"
)

t0 = time.time()
scores = bigram_nll_scores(corpus)
row = scores.agg(
    F.count("*").alias("n"),
    F.round(F.avg("avg_nll"), 3).alias("mean_nll"),
).first()
t_lm = time.time() - t0
print(
    f"bigram-LM: model+score {row['n']} docs in {t_lm:.1f}s "
    f"({row['n'] / t_lm:,.0f} docs/s), mean avg_nll={row['mean_nll']}"
)

t0 = time.time()
sized = corpus.select("doc_id", F.lit(TOKENS_PER_DOC).cast("long").alias("n_tokens"))
packed = pack_sequences(sized, budget=2048, shards=64)
stats = packing_stats(packed, budget=2048)
srow = stats.agg(
    F.sum("n_docs").alias("docs"),
    F.sum("n_seqs").alias("seqs"),
    F.round(F.avg("fill_rate"), 4).alias("fill"),
).first()
t_pack = time.time() - t0
print(
    f"packing: {srow['docs']} docs -> {srow['seqs']} seqs in {t_pack:.1f}s "
    f"({srow['docs'] / t_pack:,.0f} docs/s), mean fill_rate={srow['fill']}"
)
