"""Pinecone filter-DSL translator tests (functions.filter_dsl, P2)."""

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.filter_dsl import (
    filter_dict_to_column,
)


@pytest.fixture(scope="module")
def meta(spark):
    rows = [
        (0, "news", 3, None),
        (1, "blog", 7, "en"),
        (2, "news", 5, "de"),
        (3, "paper", 9, "en"),
        (4, "blog", 1, None),
    ]
    return spark.createDataFrame(rows, "id int, kind string, score int, lang string")


def _ids(meta, fd):
    return sorted(
        r["id"] for r in meta.filter(filter_dict_to_column(fd)).collect()
    )


def test_bare_value_is_eq(meta):
    assert _ids(meta, {"kind": "news"}) == [0, 2]


def test_each_comparator(meta):
    assert _ids(meta, {"score": {"$eq": 5}}) == [2]
    assert _ids(meta, {"score": {"$ne": 5}}) == [0, 1, 3, 4]
    assert _ids(meta, {"score": {"$gt": 5}}) == [1, 3]
    assert _ids(meta, {"score": {"$gte": 5}}) == [1, 2, 3]
    assert _ids(meta, {"score": {"$lt": 3}}) == [4]
    assert _ids(meta, {"score": {"$lte": 3}}) == [0, 4]
    assert _ids(meta, {"kind": {"$in": ["news", "paper"]}}) == [0, 2, 3]
    assert _ids(meta, {"kind": {"$nin": ["news", "paper"]}}) == [1, 4]


def test_exists_maps_to_null_checks(meta):
    assert _ids(meta, {"lang": {"$exists": True}}) == [1, 2, 3]
    assert _ids(meta, {"lang": {"$exists": False}}) == [0, 4]


def test_implicit_and_of_fields_and_ops(meta):
    assert _ids(meta, {"kind": "blog", "score": {"$gt": 2}}) == [1]
    assert _ids(meta, {"score": {"$gte": 3, "$lte": 7, "$ne": 5}}) == [0, 1]


def test_and_or_combinators(meta):
    fd = {"$or": [{"kind": "paper"}, {"score": {"$lt": 2}}]}
    assert _ids(meta, fd) == [3, 4]
    fd = {"$and": [{"score": {"$gte": 3}}, {"$or": [{"kind": "news"}, {"lang": "en"}]}]}
    assert _ids(meta, fd) == [0, 1, 2, 3]


def test_empty_filter_matches_all(meta):
    assert _ids(meta, None) == [0, 1, 2, 3, 4]
    assert _ids(meta, {}) == [0, 1, 2, 3, 4]


def test_null_comparison_drops_row_sql_semantics(meta):
    # lang NULL rows never satisfy $ne — SQL three-valued logic,
    # matching the DuckDB oracle
    assert _ids(meta, {"lang": {"$ne": "en"}}) == [2]


def test_unknown_operator_raises(meta):
    with pytest.raises(ValueError, match="unsupported filter operator"):
        filter_dict_to_column({"score": {"$regex": "x"}})
    with pytest.raises(ValueError, match="combinator"):
        filter_dict_to_column({"$nor": [{"kind": "news"}]})
    with pytest.raises(ValueError, match="non-empty list"):
        filter_dict_to_column({"$and": []})


def test_simple_predicate_pushes_to_parquet_scan(spark, tmp_path):
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.plans.inspect import (
        has_pushed_filter,
    )

    p = str(tmp_path / "meta")
    spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("label")
    ).write.parquet(p)
    df = spark.read.parquet(p)
    out = df.filter(filter_dict_to_column({"label": {"$in": [0, 1]}, "id": {"$lt": 50}}))
    assert has_pushed_filter(out, "label")
    assert has_pushed_filter(out, "id")
