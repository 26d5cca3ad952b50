"""operators/sampling.weighted_priority_sample: determinism across
partitionings, weight-proportional inclusion, per-stratum plan shape,
and input validation."""

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.sampling import (
    key_uniform,
    weighted_priority_sample,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.plans.inspect import (
    has_window_group_limit,
)


@pytest.fixture(scope="module")
def items(spark):
    # 1000 heavy (w=50) + 1000 light (w=1) rows
    return spark.range(2000).select(
        F.col("id").alias("key"),
        F.when(F.col("id") < 1000, 50.0).otherwise(1.0).alias("w"),
        F.when(F.col("id") < 1000, "heavy").otherwise("light").alias("grp"),
    )


def test_sample_deterministic_across_partitionings(spark, items):
    picks = [
        tuple(
            r["key"]
            for r in weighted_priority_sample(
                items.repartition(n), "key", "w", k=100
            )
            .orderBy("rank")
            .collect()
        )
        for n in (1, 3, 17)
    ]
    assert picks[0] == picks[1] == picks[2]
    assert len(picks[0]) == 100


def test_heavy_weights_dominate_sample(spark, items):
    got = weighted_priority_sample(items, "key", "w", k=200).collect()
    heavy = sum(1 for r in got if r["key"] < 1000)
    # w=50 vs w=1: expected heavy share >> 50%; generous bound
    assert heavy > 150, f"only {heavy}/200 heavy rows sampled"


def test_stratified_variant_ranks_within_stratum(spark, items):
    got = weighted_priority_sample(
        items, "key", "w", k=7, strata_col="grp"
    ).collect()
    by_grp = {}
    for r in got:
        by_grp.setdefault(r["grp"], []).append(r["rank"])
    assert set(by_grp) == {"heavy", "light"}
    for ranks in by_grp.values():
        assert sorted(ranks) == list(range(1, 8))


def test_stratified_plan_uses_window_group_limit(spark, items):
    out = weighted_priority_sample(items, "key", "w", k=7, strata_col="grp")
    assert has_window_group_limit(out)


def test_nonpositive_and_null_weights_excluded(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -1.0), (4, None)],
        "key long, w double",
    )
    got = weighted_priority_sample(df, "key", "w", k=10).collect()
    assert [r["key"] for r in got] == [1]


def test_key_uniform_in_open_unit_interval(spark):
    stats = (
        spark.range(100_000)
        .select(key_uniform("id").alias("u"))
        .agg(F.min("u"), F.max("u"), F.avg("u"))
        .first()
    )
    assert 0.0 < stats[0] and stats[1] < 1.0
    assert 0.45 < stats[2] < 0.55  # roughly uniform


def test_k_must_be_positive(spark, items):
    with pytest.raises(ValueError, match="k must be positive"):
        weighted_priority_sample(items, "key", "w", k=0)


def test_key_uniform_large_keys_no_ansi_overflow(spark):
    """Regression: |key| > ~3.4e9 made the bare key*2654435761 long
    multiply overflow — ARITHMETIC_OVERFLOW under Spark 4's default
    ANSI mode. The 16-bit-halves form must run AND still equal the
    textbook ((key * K) % 2^32 + 0.5) / 2^32 computed in unbounded
    Python ints (what DuckDB's hugeint evaluates)."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.sampling import (
        key_uniform,
    )

    keys = [0, 1, 3_400_000_000, 2**40 + 17, 2**62 - 1, -5, -(2**40)]
    df = spark.createDataFrame([(k,) for k in keys], "key long")
    got = {
        r["key"]: r["u"]
        for r in df.select("key", key_uniform("key").alias("u")).collect()
    }
    for k in keys:
        expected = ((k * 2654435761) % 4294967296 + 0.5) / 4294967296.0
        assert got[k] == expected, k


def test_weighted_priority_sample_large_keys(spark):
    """weighted_priority_sample must not fail on large integer keys
    (the reported ANSI-mode failure path)."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.sampling import (
        weighted_priority_sample,
    )

    df = spark.createDataFrame(
        [(2**40 + i, float(i + 1)) for i in range(20)],
        "doc_id long, weight double",
    )
    out = weighted_priority_sample(df, "doc_id", "weight", k=5).collect()
    assert len(out) == 5


def test_leakage_safe_split_never_splits_a_group(spark):
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.sampling import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    # chains of 3: {0,1,2}, {10,11,12}, ... — components must share a split
    pairs = spark.createDataFrame(
        [(b, b + 1) for b in range(0, 200, 10)]
        + [(b + 1, b + 2) for b in range(0, 200, 10)],
        "id_a long, id_b long",
    )
    out = leakage_safe_split(docs, pairs).collect()
    split_of = {r["doc_id"]: r["split"] for r in out}
    group_of = {r["doc_id"]: r["group_id"] for r in out}
    assert len(split_of) == 200
    for b in range(0, 200, 10):
        assert split_of[b] == split_of[b + 1] == split_of[b + 2]
        assert group_of[b] == group_of[b + 1] == group_of[b + 2] == b
    # singletons got their own id as group
    assert group_of[5] == 5
    # all three splits are populated and ratios are roughly 80/10/10
    from collections import Counter

    c = Counter(split_of.values())
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > c["val"] and c["train"] > c["test"]


def test_leakage_safe_split_rejects_bad_bounds(spark):
    import pytest as pt

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.sampling import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    with pt.raises(ValueError, match="bounds"):
        leakage_safe_split(docs, pairs, bounds=(0.9, 0.8))


def test_temperature_mixture_targets_and_determinism(spark):
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    rows = (
        [(i, "en") for i in range(70)]
        + [(100 + i, "de") for i in range(20)]
        + [(200 + i, "es") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_mixture_sample(df, "lang", "doc_id", alpha=0.5, total=10)
    got = out.collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append((r["rank"], r["doc_id"]))
    # hand-derived largest-remainder apportionment at alpha=0.5:
    # raw = 10*sqrt(c)/sum(sqrt) -> en 5.23, de 2.80, es 1.98;
    # leftover 2 goes to the two largest remainders (es, de)
    assert {k: len(v) for k, v in by_lang.items()} == {"en": 5, "de": 3, "es": 2}
    # ranks contiguous from 1 per stratum
    for v in by_lang.values():
        assert sorted(r for r, _ in v) == list(range(1, len(v) + 1))
    # pure function of keys: identical rows on re-run
    again = sorted(map(tuple, temperature_mixture_sample(
        df, "lang", "doc_id", alpha=0.5, total=10
    ).collect()))
    assert again == sorted(map(tuple, got))


def test_temperature_mixture_caps_at_stratum_size(spark):
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    df = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b")], "doc_id long, lang string"
    )
    out = temperature_mixture_sample(df, "lang", "doc_id", alpha=0.3, total=50)
    by = {}
    for r in out.collect():
        by[r["lang"]] = by.get(r["lang"], 0) + 1
    # a stratum can never contribute more docs than it has
    assert by["a"] <= 2 and by["b"] <= 1


def test_temperature_mixture_redistribute_fills_deficit(spark):
    """Hand-derived: a=100 docs, b=2 docs, alpha=0.3, total=30.
    s_a=100^0.3, s_b=2^0.3 -> q_a~0.764 -> raw a=22.91, b=7.09;
    largest remainder: a=23, b=7 -> cap b at 2 (deficit 5). Greedy
    refill in q-order gives the 5 to a: a=28, b=2, total exactly 30.
    The default keeps the shortfall (25 rows)."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    rows = [(i, "a") for i in range(100)] + [(1000 + i, "b") for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    kept = temperature_mixture_sample(df, "lang", "doc_id", alpha=0.3, total=30)
    by = {}
    for r in kept.collect():
        by[r["lang"]] = by.get(r["lang"], 0) + 1
    assert by == {"a": 23, "b": 2}  # documented shortfall: 25 < 30

    full = temperature_mixture_sample(
        df, "lang", "doc_id", alpha=0.3, total=30, redistribute=True
    )
    by = {}
    for r in full.collect():
        by[r["lang"]] = by.get(r["lang"], 0) + 1
    assert by == {"a": 28, "b": 2}


def test_temperature_mixture_redistribute_exhausts_corpus(spark):
    """total > N: every row comes back exactly once (min(total, N))."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    df = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b")], "doc_id long, lang string"
    )
    out = temperature_mixture_sample(
        df, "lang", "doc_id", alpha=0.3, total=50, redistribute=True
    ).collect()
    assert sorted(r["doc_id"] for r in out) == [0, 1, 2]


def test_temperature_mixture_redistribute_noop_when_uncapped(spark):
    """With no stratum exhausted the redistribution stage is the
    identity — both paths pick the same rows."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    rows = [(i, "a") for i in range(60)] + [(100 + i, "b") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    a = sorted(
        map(tuple, temperature_mixture_sample(df, total=20).collect())
    )
    b = sorted(
        map(
            tuple,
            temperature_mixture_sample(df, total=20, redistribute=True).collect(),
        )
    )
    assert a == b and len(a) == 20
