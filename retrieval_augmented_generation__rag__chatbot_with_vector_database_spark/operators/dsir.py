"""DSIR — Data Selection via Importance Resampling (Xie et al.,
*Data Selection for Language Models via Importance Resampling*,
NeurIPS 2023): pick raw-corpus examples whose hashed n-gram feature
distribution looks like a (small) TARGET corpus, without training a
classifier. The published recipe — hashed unigram+bigram bag features,
bag-of-words importance ratio between a target model and a raw model,
Gumbel-top-k resampling — maps 1:1 onto bounded Spark aggregates:

1. features: every unigram and bigram OCCURRENCE hashes to one of
   ``16**hex_chars`` buckets (``substring(md5(gram), 1, hex_chars)``
   — md5 prefixes are engine-portable, the same trick as the MinHash
   signatures, so a DuckDB oracle replays the WHOLE pipeline);
2. models: two B-bounded histograms (target and raw bucket counts) —
   mergeable partial aggregates, never larger than B rows no matter
   the corpus size;
3. log importance weight per doc: ``Σ_b n_b(d) · λ_b`` with
   ``λ_b = ln p_target(b) − ln p_raw(b)`` (add-α smoothed), λ rounded
   to 6 dp and summed as DECIMAL (the bigram-NLL exactness
   convention, so both engines agree digit for digit);
4. resampling: Gumbel-top-k over ``log_w + Gumbel(u)`` with ``u`` the
   deterministic Knuth uniform of the doc id (pure function of the
   key — re-runs and the SQL oracle pick the same sample).

Scale shape: the only row-proportional shuffles are the gram explode
(one groupBy (id, bucket)) and the per-doc weight aggregate; the λ
table is ≤ B rows and broadcast; the top-k is TakeOrderedAndProject.
Nothing grows with corpus size on the driver.

Reference anchor: the reference repo curates nothing (documents go
straight to the index, `scripts/ingest_documents.py`); DSIR is part of
the training-data-pipeline extension surface (SURVEY.md §2's
curation block) next to the heuristic gates and the learned NB gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.lm import (
    _tokens,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.sampling import (
    key_uniform,
)

W_DEC = "decimal(24,6)"

# eager=True runs the checkpoint as its own job before the consumers;
# eager=False folds it into the first consuming job (A/B knob)
CKPT_EAGER = False


def hashed_gram_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 2,
) -> DataFrame:
    """(id, bucket) — one row per unigram AND bigram OCCURRENCE (not
    distinct: the importance model needs real counts), ``bucket`` =
    first ``hex_chars`` hex digits of ``md5(gram)`` (bigrams joined
    with a single space). ``16**hex_chars`` buckets; md5 prefixes are
    uniform enough for a hashing featurizer and identical in every
    engine with md5 — no engine-specific hash anywhere."""
    if not 1 <= hex_chars <= 8:
        raise ValueError(f"hex_chars must be in [1, 8], got {hex_chars}")
    toks = df.select(
        F.col(id_col).alias("id"), _tokens(text_col).alias("__arr")
    )
    arr = F.col("__arr")
    bigrams = F.when(
        F.size(arr) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(arr) - 2),
            lambda i: F.concat(arr[i], F.lit(" "), arr[i + 1]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(arr, bigrams)
    return toks.select("id", F.explode(grams).alias("g")).select(
        "id",
        F.substring(F.md5(F.col("g").cast("binary")), 1, hex_chars).alias(
            "bucket"
        ),
    )


def bucket_histogram(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 2,
) -> DataFrame:
    """(bucket, c) hashed-gram histogram of a corpus — ≤ 16**hex_chars
    rows, one shuffle with map-side combine."""
    return (
        hashed_gram_buckets(df, id_col, text_col, hex_chars)
        .groupBy("bucket")
        .agg(F.count("*").alias("c"))
    )


def _per_doc_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    hex_chars: int,
    alpha: float,
) -> DataFrame:
    """(id, n_grams, log_w DECIMAL) for every raw doc with ≥ 1 gram —
    the shared core of :func:`dsir_log_weights` (which left-joins it
    back onto the full raw id set so gram-less docs surface with
    n_grams = 0 / NULL weight) and :func:`dsir_sample` (which drops
    NULL-weight docs anyway and so consumes this frame directly,
    skipping that raw re-scan — see the note there). Every row's
    ``log_w`` is non-NULL by construction: λ is never NULL (finite ln
    of strictly positive smoothed ratios) and each (id) group is
    non-empty."""
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    B = 16 ** hex_chars
    # ONE gram explode over the raw corpus: the per-(doc, bucket)
    # counts are aggregated first, and the corpus histogram is their
    # re-aggregation (Σ_id n_b ≡ the direct occurrence count — same
    # integers, same λ). The round-14 form exploded raw twice (once
    # for the histogram, once for the per-doc counts) — the gram
    # explode is the only row-proportional pass here, so this halves
    # it (guide §2.3: aggregate before you shuffle; §1.2: remove
    # duplicate passes).
    #
    # Round 16: the r15 form left the sharing to AQE exchange reuse —
    # which does NOT fire for the two leaf-level (id, bucket) stages
    # (verified on the executed adaptive plan: the raw explode ran
    # twice, and in the curation funnel the ENTIRE upstream gate chain
    # under `raw` re-ran with it). Materialize per_bucket explicitly —
    # it is the gram explode AGGREGATED (≤ B rows per doc), far
    # smaller than the pass it saves, and in the curation funnel the
    # saved pass includes the whole gate/dedup chain. localCheckpoint,
    # NOT a lazy persist: a persist would register the plan in the
    # CacheManager and silently serve later bench passes from the
    # first pass's cache (cross-run caching the round rules forbid);
    # checkpoint blocks are per-query and freed on GC. Executor-loss
    # stance: SCALE.md round 16 (re-run the batch query).
    per_bucket = (
        hashed_gram_buckets(raw, id_col, text_col, hex_chars)
        .groupBy("id", "bucket")
        .agg(F.count("*").alias("n_b"))
        .localCheckpoint(eager=CKPT_EAGER)
    )
    rc = per_bucket.groupBy("bucket").agg(F.sum("n_b").alias("cr"))
    tc = bucket_histogram(
        target, id_col, text_col, hex_chars
    ).withColumnRenamed("c", "ct")
    # totals as UNBOUNDED WINDOW SUMS over the joined (≤ B row) bucket
    # table instead of two agg().crossJoin() subtrees that re-derived
    # rc and tc wholesale (round 16, guide §2.4): every tc bucket
    # appears exactly once in the full-outer join with ct non-null (cr
    # likewise), so Σ coalesce(ct, 0) over the joined frame IS the
    # target total — same integers, same λ. The single-partition
    # window holds ≤ 16**hex_chars rows (256 at the default hex_chars
    # used repo-wide), trivially bounded.
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    tt = F.sum(F.coalesce(F.col("ct"), F.lit(0))).over(w_all)
    tr = F.sum(F.coalesce(F.col("cr"), F.lit(0))).over(w_all)
    lam = (
        rc.join(tc, "bucket", "full_outer")
        .select(
            "bucket",
            F.round(
                F.ln(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(alpha))
                    / (tt + F.lit(alpha) * F.lit(B))
                )
                - F.ln(
                    (F.coalesce(F.col("cr"), F.lit(0)) + F.lit(alpha))
                    / (tr + F.lit(alpha) * F.lit(B))
                ),
                6,
            )
            .cast(W_DEC)
            .alias("lam"),
        )
    )
    return (
        per_bucket.join(F.broadcast(lam), "bucket")
        .groupBy("id")
        .agg(
            F.sum("n_b").alias("n_grams"),
            F.sum(F.col("n_b") * F.col("lam")).alias("log_w"),
        )
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 2,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-raw-doc log importance weight under the hashed bag-of-grams
    model: (id_col, n_grams, log_w) where
    ``log_w = Σ_buckets n_b(d) · λ_b``,
    ``λ_b = round(ln((ct_b+α)/(Tt+αB)) − ln((cr_b+α)/(Tr+αB)), 6)``,
    ct/cr the target/raw bucket counts, Tt/Tr their totals, B the
    bucket count. λ is rounded to 6 dp and the products/sums run in
    DECIMAL — per-contribution rounding is what lets an independent
    SQL engine reproduce every weight digit for digit (the bigram-NLL
    convention). Docs with no tokens keep n_grams = 0 and a NULL
    weight — the gate downstream decides their fate explicitly.

    The λ table is at most B rows and broadcast; each corpus is read
    once; the weight aggregate shuffles (doc, bucket) pairs — bounded
    by doc length, never by corpus count."""
    per_doc = _per_doc_log_weights(
        raw, target, id_col, text_col, hex_chars, alpha
    )
    ids = raw.select(F.col(id_col).alias("id")).distinct()
    return ids.join(per_doc, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.col("log_w").cast("double").alias("log_w"),
    )


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 2,
    alpha: float = 0.5,
) -> DataFrame:
    """Gumbel-top-``n`` importance resample (the DSIR paper's sampling
    rule): key = ``log_w + Gumbel`` with ``Gumbel = −ln(−ln(u))`` and
    ``u = key_uniform(id)`` — a pure function of the doc id, so the
    same docs win on every run, partial re-run, and engine. Both
    addends are rounded to 6 dp (engine-exact by the λ-rounding above
    and the Knuth uniform's exact dyadic u); ties break by id.
    Returns (id_col, n_grams, log_w, gumbel_key, rank) — the ranking
    is a distributed ``orderBy().limit()`` (TakeOrderedAndProject),
    no global sort materializes. Docs with no tokens (NULL weight)
    never enter the sample."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    # Consume the per-doc weight core DIRECTLY instead of
    # dsir_log_weights + filter(log_w IS NOT NULL): the public frame
    # is ``raw ids LEFT JOIN per_doc`` — one more full pass over raw
    # (scan + distinct shuffle + join; in the curation funnel `raw` is
    # docs⋈survivors, so the pass carries that join too) whose ONLY
    # contribution is the NULL-weight rows this filter throws away.
    # Equivalence (round 16, guide §1.2 — don't compute what you
    # discard): per_doc ids ⊆ raw ids by construction, every per_doc
    # log_w is non-NULL (see _per_doc_log_weights), and the left join
    # neither drops nor alters matched rows — so {w | log_w IS NOT
    # NULL} IS per_doc with the same double cast, bit for bit. Pinned
    # by test_dsir_sample_matches_log_weights_composition.
    per_doc = _per_doc_log_weights(
        raw, target, id_col, text_col, hex_chars, alpha
    )
    w = per_doc.select(
        F.col("id").alias(id_col),
        "n_grams",
        F.col("log_w").cast("double").alias("log_w"),
    )
    u = key_uniform(id_col)
    keyed = w.withColumn(
        "gumbel_key",
        F.round(F.col("log_w") + (-F.ln(-F.ln(u))), 6),
    )
    top = (
        keyed.orderBy(F.col("gumbel_key").desc(), F.col(id_col).asc())
        .limit(n)
    )
    from pyspark.sql import Window

    win = Window.orderBy(F.col("gumbel_key").desc(), F.col(id_col).asc())
    # rank over ≤ n already-selected rows — k-bounded window
    return top.withColumn("rank", F.row_number().over(win))
