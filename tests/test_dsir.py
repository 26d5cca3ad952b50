"""operators/dsir: hashed-n-gram importance weights + Gumbel-top-k
resampling (Xie et al. NeurIPS 2023) — directional lift, determinism,
sampling contract."""

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators import dsir


def _corpus(spark):
    target = spark.createDataFrame(
        [(1000 + i, "the quick brown fox jumps over the lazy dog") for i in range(8)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(i, "quick brown fox and lazy dog run") for i in range(10)]
        + [(100 + i, "stock market index futures options trading") for i in range(10)],
        "doc_id long, text string",
    )
    return raw, target


def test_weights_lift_target_like_docs(spark):
    """Docs sharing the target's vocabulary must outweigh docs from a
    disjoint domain — the whole point of importance reweighting."""
    raw, target = _corpus(spark)
    w = {r["doc_id"]: r["log_w"] for r in dsir.dsir_log_weights(raw, target).collect()}
    like = min(w[i] for i in range(10))
    unlike = max(w[100 + i] for i in range(10))
    assert like > unlike


def test_weights_deterministic_across_partitionings(spark):
    raw, target = _corpus(spark)
    a = sorted(
        (r["doc_id"], r["n_grams"], r["log_w"])
        for r in dsir.dsir_log_weights(raw.repartition(7), target.repartition(3)).collect()
    )
    b = sorted(
        (r["doc_id"], r["n_grams"], r["log_w"])
        for r in dsir.dsir_log_weights(raw.repartition(2), target).collect()
    )
    assert a == b


def test_empty_docs_kept_with_null_weight_and_excluded_from_sample(spark):
    raw = spark.createDataFrame(
        [(0, "alpha beta"), (1, "??!!"), (2, "")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame([(9, "alpha beta")], "doc_id long, text string")
    w = {r["doc_id"]: (r["n_grams"], r["log_w"]) for r in dsir.dsir_log_weights(raw, target).collect()}
    assert set(w) == {0, 1, 2}
    assert w[1] == (0, None) and w[2] == (0, None)
    got = dsir.dsir_sample(raw, target, n=10).collect()
    assert {r["doc_id"] for r in got} == {0}


def test_sample_is_exact_size_and_ranked(spark):
    raw, target = _corpus(spark)
    got = dsir.dsir_sample(raw, target, n=5).collect()
    assert len(got) == 5
    assert [r["rank"] for r in sorted(got, key=lambda r: r["rank"])] == [1, 2, 3, 4, 5]
    keys = [r["gumbel_key"] for r in sorted(got, key=lambda r: r["rank"])]
    assert keys == sorted(keys, reverse=True)


def test_gram_buckets_count_occurrences_not_distinct(spark):
    df = spark.createDataFrame([(0, "a a b")], "doc_id long, text string")
    # unigrams: a, a, b (3) + bigrams: "a a", "a b" (2) = 5 occurrences
    assert dsir.hashed_gram_buckets(df).count() == 5


def test_validation(spark):
    raw, target = _corpus(spark)
    with pytest.raises(ValueError, match="alpha"):
        dsir.dsir_log_weights(raw, target, alpha=0.0)
    with pytest.raises(ValueError, match="hex_chars"):
        dsir.hashed_gram_buckets(raw, hex_chars=0)
    with pytest.raises(ValueError, match="n must be positive"):
        dsir.dsir_sample(raw, target, n=0)
