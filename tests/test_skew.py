"""operators/skew.py: salted top-k and two-phase distinct — exact
parity with the single-pass forms, on data built to be hot-keyed."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.skew import (
    salted_topk_per_group,
    two_phase_distinct,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.plans.inspect import (
    has_window_group_limit,
    physical_plan,
)


@pytest.fixture(scope="module")
def hot(spark):
    # one group with 96% of rows, two slim groups, duplicate scores
    rows = [(i, "hot", float(i % 37), i % 50) for i in range(960)]
    rows += [(1000 + i, "warm", float(i), i % 5) for i in range(30)]
    rows += [(2000 + i, "cold", 3.0, 7) for i in range(10)]
    return spark.createDataFrame(rows, "id long, grp string, score double, uid int")


def _plain_topk(df, k):
    w = Window.partitionBy("grp").orderBy(F.col("score").desc(), F.col("id").asc())
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("grp", "rank", "id", "score")
    )


@pytest.mark.parametrize("n_salts", [1, 4, 16])
def test_salted_topk_equals_plain_window(spark, hot, n_salts):
    salted = salted_topk_per_group(
        hot,
        ["grp"],
        [F.col("score").desc(), F.col("id").asc()],
        k=7,
        salt_from="id",
        n_salts=n_salts,
    ).select("grp", "rank", "id", "score")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, _plain_topk(hot, 7).collect())
    )


def test_salted_topk_k_larger_than_group(spark, hot):
    # k > |cold group|: every cold row survives, ranks dense 1..10
    out = salted_topk_per_group(
        hot,
        ["grp"],
        [F.col("score").desc(), F.col("id").asc()],
        k=25,
        salt_from="id",
        n_salts=4,
    )
    cold = out.filter("grp = 'cold'").select("rank").collect()
    assert sorted(r.rank for r in cold) == list(range(1, 11))


def test_salted_topk_local_phase_partitions_by_salt(spark, hot):
    out = salted_topk_per_group(
        hot, ["grp"], [F.col("score").desc(), F.col("id").asc()],
        k=5, salt_from="id", n_salts=8,
    )
    plan = physical_plan(out)
    # the local rank window runs over (grp, __salt) — the skew lever
    assert "__salt" in plan
    # both ranking windows are limit-pushed below their exchanges
    assert has_window_group_limit(out)


def test_salted_topk_rejects_bad_args(spark, hot):
    with pytest.raises(ValueError):
        salted_topk_per_group(hot, ["grp"], [F.col("id")], k=0, salt_from="id")
    with pytest.raises(ValueError):
        salted_topk_per_group(
            hot, ["grp"], [F.col("id")], k=3, salt_from="id", n_salts=0
        )


def test_two_phase_distinct_matches_count_distinct(spark, hot):
    got = two_phase_distinct(hot, ["grp"], "uid", out_name="n").collect()
    want = (
        hot.groupBy("grp").agg(F.countDistinct("uid").alias("n")).collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_two_phase_distinct_excludes_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 1), ("b", None)], "grp string, v int"
    )
    got = {r.grp: r.n_distinct for r in two_phase_distinct(df, ["grp"], "v").collect()}
    # group b has only NULLs: no row at all (matches GROUP BY over
    # count(DISTINCT) which would emit 0 — callers join back to totals)
    assert got == {"a": 1}
