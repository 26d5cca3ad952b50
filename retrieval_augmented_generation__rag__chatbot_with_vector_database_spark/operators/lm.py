"""Statistical language-model scoring — the CCNet-style perplexity
filter of a training-data pipeline: score every document by how
surprising it is under an n-gram model, then gate or bucket the
corpus by that score (CCNet buckets head/middle/tail by KenLM
perplexity; this is the distributed bigram form of the same gate).

The reference engine has no LM scoring (it is a RAG service); this
extends the engine for corpus curation at 100 TB (SURVEY.md
north-star extensions), like ``operators/textstats.py``.

Everything is SQL: tokenize once, explode positional bigrams, build
the count tables with two hash aggregations, then score each document
through two dimension-table joins. No Python on any hot path.

Scale shape:
- the MODEL (unigram + bigram count tables) aggregates with full
  map-side partial combine — shuffle ∝ distinct n-grams, which
  plateaus with vocabulary, not corpus size;
- SCORING joins each (doc, bigram) occurrence to the model tables on
  the n-gram key. The model tables are corpus-level dimensions
  (one row per distinct n-gram); broadcast them when they fit, else
  the join shuffles on the n-gram key — hot bigrams ("of the") are
  single model-side rows, so there is no hot-key pair explosion;
- per-token contributions are rounded to 6 dp and summed as DECIMAL,
  the repo-wide cross-engine determinism convention
  (``operators/hybrid.py`` BM25 does the same).

Smoothing is add-alpha (Lidstone): ``P(w2|w1) = (c(w1,w2) + alpha) /
(c(w1) + alpha * V)`` with V = |vocabulary|. Unseen *history* words
fall back to the uniform ``alpha / (alpha * V) = 1/V`` via the left
join's NULL handling, so scoring is total (defined for every doc).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NLL_DEC = "decimal(18,6)"


def _tokens(text_col: str) -> Column:
    """Lowercased alphanumeric tokens — identical to the dedup/textstats
    tokenizer so LM scores compose with the other curation signals."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda x: x != ""
    )


def positional_bigrams(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, w1, w2) — one row per bigram OCCURRENCE (not distinct:
    the LM needs real counts). Tokenization is projected to a column
    first (HOFs don't common-subexpression-eliminate)."""
    toks = df.select(F.col(id_col).alias("id"), _tokens(text_col).alias("__arr"))
    arr = F.col("__arr")
    pairs = F.when(
        F.size(arr) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(arr) - 2),
            lambda i: F.struct(arr[i].alias("w1"), arr[i + 1].alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return toks.select("id", F.explode(pairs).alias("bg")).select(
        "id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )


def bigram_model(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(bigram_counts, history_counts, vocab_size) over the corpus.

    ``history_counts`` counts w1 occurrences AS A HISTORY (= bigram
    occurrences starting at w1), so probabilities per history sum to 1
    exactly; ``vocab_size`` is a 1-row frame (broadcast at the join).
    """
    bg = positional_bigrams(df, id_col, text_col)
    bigram_counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    history_counts = bigram_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        df.select(F.explode(_tokens(text_col)).alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )
    return bigram_counts, history_counts, vocab


def bigram_nll_scores(
    scored: DataFrame,
    model: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    broadcast_model: bool = True,
    model_tables: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Per-document bigram cross-entropy: (id_col, n_bigrams, sum_nll,
    avg_nll) where each bigram contributes ``-ln P(w2|w1)`` (add-alpha
    smoothed), rounded to 6 dp before the DECIMAL sum.

    ``model`` is the corpus the counts are estimated FROM (defaults to
    ``scored`` itself — the self-scoring profile run); passing a
    held-out reference corpus gives the CCNet setup where a clean
    reference LM scores the raw crawl. Docs with < 2 tokens score
    NULL (no bigrams), kept with n_bigrams = 0 — the gate decides.

    ``broadcast_model=True`` broadcasts both count tables (right for
    vocabulary-bounded corpora); False shuffles the score join on the
    n-gram keys instead — the model side is one row per n-gram, so hot
    bigrams never explode.

    ``model_tables`` = (bigram_counts, history_counts, vocab) from
    :func:`load_bigram_model` scores from the PERSISTED layout —
    estimate once, score per batch, no reference-corpus re-aggregation
    (hash-equal to the rebuild path; tested). Mutually exclusive with
    ``model``.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    self_scoring = model_tables is None and model is None
    if model_tables is not None:
        if model is not None:
            raise ValueError("pass model or model_tables, not both")
        bigram_counts, history_counts, vocab = model_tables
    elif not self_scoring:
        bigram_counts, history_counts, vocab = bigram_model(
            model, id_col, text_col
        )
    if self_scoring:
        # Self-scoring shares ONE bigram explode between the model
        # estimate and the scoring pass (round 16, guide §1.2/§2.3 —
        # the r15 DSIR pattern): aggregate per-(doc, bigram)
        # occurrence counts first, re-aggregate them into the model
        # (Σ_id n ≡ the direct corpus count — same integers), and
        # score each DISTINCT (doc, bigram) once as n·round(nll, 6)
        # (decimal × integer is exact, so the DECIMAL sum is
        # bit-identical to summing the occurrences one by one). The
        # r15 form exploded the corpus twice — AQE exchange reuse does
        # NOT deduplicate the two leaf stages (verified on the
        # executed adaptive plan), hence the explicit sharing. A LAZY
        # localCheckpoint, not a persist: both consumers reference the
        # same checkpointed RDD, so the frame computes once under the
        # first consuming job with no extra eager job — and unlike
        # persist it never registers in the CacheManager, so a later
        # bench pass can NOT be served from this pass's cache (the
        # cross-run caching the round rules forbid); blocks free on
        # GC. The cached frame is the exploded bigrams AGGREGATED —
        # smaller than the pass it saves.
        pbc = (
            positional_bigrams(scored, id_col, text_col)
            .groupBy("id", "w1", "w2")
            .agg(F.count("*").alias("n_occ"))
            .localCheckpoint(eager=False)
        )
        bigram_counts = pbc.groupBy("w1", "w2").agg(
            F.sum("n_occ").alias("c12")
        )
        history_counts = bigram_counts.groupBy("w1").agg(
            F.sum("c12").alias("c1")
        )
        vocab = (
            scored.select(F.explode(_tokens(text_col)).alias("w"))
            .agg(F.count_distinct("w").alias("v"))
        )
        score_src = pbc
    else:
        score_src = positional_bigrams(scored, id_col, text_col).withColumn(
            "n_occ", F.lit(1).cast("long")
        )
    if broadcast_model:
        bigram_counts = F.broadcast(bigram_counts)
        history_counts = F.broadcast(history_counts)
    nll = (
        score_src.join(bigram_counts, ["w1", "w2"], "left")
        .join(history_counts, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "id",
            "n_occ",
            F.round(
                -F.ln(
                    (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(alpha))
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha) * F.col("v"))
                ),
                6,
            )
            .cast(NLL_DEC)
            .alias("nll"),
        )
    )
    per_doc = nll.groupBy("id").agg(
        F.sum("n_occ").alias("n_bigrams"),
        F.sum(F.col("n_occ") * F.col("nll")).alias("sum_nll"),
    )
    ids = scored.select(F.col(id_col).alias("id")).distinct()
    return (
        ids.join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.col("sum_nll").cast("double").alias("sum_nll"),
            F.round(
                F.col("sum_nll").cast("double") / F.col("n_bigrams"), 6
            ).alias("avg_nll"),
        )
    )


def save_bigram_model(
    model_corpus: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist the LM as a managed layout — ``{path}/c12`` (bigram
    counts) and ``{path}/vocab`` (distinct tokens) — so a 100 TB
    pipeline estimates once and scores per batch from the stored
    tables instead of re-aggregating the reference corpus on every
    call (the same estimate-once/probe-many contract as the lexical
    and vector index layouts).

    The write is crash-consistent: both tables build in a tmp subtree
    and swap in under the ``sources.layout`` marker fence; readers
    (:func:`load_bigram_model`) fail loudly on a torn swap.
    """
    import os

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.layout import (
        check_not_torn,
        swap_partition_dirs,
    )

    os.makedirs(path, exist_ok=True)
    check_not_torn(path)
    tmp = os.path.join(path, "_tmp_model")
    bg = positional_bigrams(model_corpus, id_col, text_col)
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    vocab = model_corpus.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).alias("w")
    ).distinct()
    c12.write.mode("overwrite").parquet(os.path.join(tmp, "c12"))
    vocab.write.mode("overwrite").parquet(os.path.join(tmp, "vocab"))
    swap_partition_dirs(path, tmp, ["c12", "vocab"])


def update_bigram_model(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Incrementally fold NEW documents into the stored model.
    Bigram counts are exactly additive across disjoint doc sets (no
    bigram crosses a document boundary), so update ≡ rebuild-from-
    union, bit for bit (tested) — the incremental-upsert contract the
    other index layouts carry, at aggregate (not per-doc) cost:
    the merge shuffles ∝ distinct n-grams, which is vocabulary-
    bounded, not corpus-bounded. Same marker-fenced swap as
    :func:`save_bigram_model`.
    """
    import os

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.layout import (
        check_not_torn,
        swap_partition_dirs,
    )

    check_not_torn(path)
    spark = new_docs.sparkSession
    old_c12 = spark.read.parquet(os.path.join(path, "c12"))
    old_vocab = spark.read.parquet(os.path.join(path, "vocab"))
    bg = positional_bigrams(new_docs, id_col, text_col)
    new_c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    merged_c12 = (
        old_c12.unionByName(new_c12)
        .groupBy("w1", "w2")
        .agg(F.sum("c12").alias("c12"))
    )
    new_vocab = new_docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).alias("w")
    )
    merged_vocab = old_vocab.unionByName(new_vocab).distinct()
    tmp = os.path.join(path, "_tmp_model")
    # pin the merges before the swap touches their input files
    merged_c12.localCheckpoint(eager=True).write.mode("overwrite").parquet(
        os.path.join(tmp, "c12")
    )
    merged_vocab.localCheckpoint(eager=True).write.mode("overwrite").parquet(
        os.path.join(tmp, "vocab")
    )
    swap_partition_dirs(path, tmp, ["c12", "vocab"])


def load_bigram_model(
    spark, path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(bigram_counts, history_counts, vocab_size) from the stored
    layout — the same triple :func:`bigram_model` derives from raw
    text. History counts re-derive from the (vocabulary-bounded)
    stored bigram table; no corpus scan happens here."""
    import os

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.layout import (
        check_not_torn,
    )

    check_not_torn(path)
    c12 = spark.read.parquet(os.path.join(path, "c12"))
    vocab = spark.read.parquet(os.path.join(path, "vocab"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v = vocab.agg(F.count("*").alias("v"))
    return c12, c1, v


__all__ = [
    "bigram_model",
    "bigram_nll_scores",
    "load_bigram_model",
    "positional_bigrams",
    "save_bigram_model",
    "update_bigram_model",
]
