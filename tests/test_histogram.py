"""Mergeable histogram rollup + token-budget context packing."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators import (
    histogram,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.rag import (
    pack_context_budget,
)


def _events(spark, n=500):
    # deterministic skewed values over two days / several hours
    rows = [
        (
            i,
            f"2024-01-0{1 + (i % 2)} {i % 24:02d}:00:00",
            float((i * i) % 97) + (0.5 if i % 3 == 0 else 0.0),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, ts_s string, value double").select(
        "id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
    )


def test_merge_equals_direct_build(spark):
    """Daily histogram via hourly partials == histogram built directly
    at daily grain — the mergeability contract."""
    ev = _events(spark)
    hourly = histogram.histogram_by(
        ev, "value", [F.date_trunc("hour", "ts").alias("hour")], 0.0, 10.0, 10
    )
    via_merge = histogram.merge_histograms(
        hourly, [F.date_trunc("day", "hour").alias("day")]
    )
    direct = histogram.histogram_by(
        ev, "value", [F.date_trunc("day", "ts").alias("day")], 0.0, 10.0, 10
    ).withColumn("cnt", F.col("cnt").cast("long"))
    a = {(r["day"], r["bin"]): r["cnt"] for r in via_merge.collect()}
    b = {(r["day"], r["bin"]): r["cnt"] for r in direct.collect()}
    assert a == b and sum(a.values()) == ev.count()


def test_histogram_clamps_out_of_range(spark):
    df = spark.createDataFrame(
        [(1, -5.0), (2, 3.0), (3, 99.0), (4, 1000.0)], "k long, value double"
    )
    h = histogram.histogram_by(df, "value", [F.lit(0).alias("g")], 0.0, 10.0, 10)
    bins = {r["bin"]: r["cnt"] for r in h.collect()}
    assert bins == {0: 2, 9: 2}  # -5 clamps to 0; 99 and 1000 clamp to 9


def test_percentile_within_one_bin_of_exact(spark):
    ev = _events(spark)
    daily = histogram.histogram_by(
        ev, "value", [F.date_trunc("day", "ts").alias("day")], 0.0, 10.0, 10
    )
    est = histogram.histogram_percentiles(daily, ["day"], [0.5, 0.99], 0.0, 10.0)
    exact = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.expr("percentile(value, 0.5D)").alias("p50"),
        F.expr("percentile(value, 0.99D)").alias("p99"),
    )
    j = {r["day"]: r for r in est.join(exact, "day").collect()}
    assert len(j) == 2
    for r in j.values():
        # upper-edge estimator: exact value lies in (est - width, est]
        assert r["p50_est"] - 10.0 < r["p50"] <= r["p50_est"] + 1e-9
        assert r["p99_est"] - 10.0 < r["p99"] <= r["p99_est"] + 1e-9
        assert r["n_events"] == 250


def _matches(spark):
    rows = [
        # query 0: 3 matches of 4,4,4 tokens
        (0, 1, 10, "a b c d"),
        (0, 2, 20, "e f g h"),
        (0, 3, 30, "i j k l"),
        # query 1: rank-1 alone overflows any small budget
        (1, 1, 40, "w x y z " * 50),
        (1, 2, 50, "a b"),
        # query 2: empty text contributes 0 tokens
        (2, 1, 60, ""),
        (2, 2, 70, "m n"),
    ]
    return spark.createDataFrame(
        rows, "query_id long, rank int, id long, text string"
    )


def test_pack_budget_prefix_and_always_first(spark):
    out = pack_context_budget(_matches(spark), budget_tokens=8).collect()
    got = {(r["query_id"], r["rank"]): (r["n_tokens"], r["cum_tokens"]) for r in out}
    # q0: ranks 1,2 fit (4+4=8), rank 3 would be 12 > 8
    # q1: rank 1 kept despite 200 > 8 (always_first); rank 2 cum 202 dropped
    # q2: 0 + 2 tokens both fit
    assert set(got) == {(0, 1), (0, 2), (1, 1), (2, 1), (2, 2)}
    assert got[(0, 2)] == (4, 8)
    assert got[(1, 1)] == (200, 200)
    assert got[(2, 2)] == (2, 2)
    # kept set is always a rank-prefix per query
    by_q = {}
    for q, r in got:
        by_q.setdefault(q, []).append(r)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_pack_budget_strict_mode(spark):
    out = pack_context_budget(
        _matches(spark), budget_tokens=8, always_first=False
    ).collect()
    assert {(r["query_id"], r["rank"]) for r in out} == {
        (0, 1), (0, 2), (2, 1), (2, 2)
    }  # q1 drops entirely: rank-1 alone exceeds the budget
