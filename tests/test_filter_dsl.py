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


def test_randomized_dsl_agrees_with_python_evaluator(spark):
    """200 seeded random filter dicts, all evaluated in ONE Spark job
    (each filter becomes a boolean column) against a row-level Python
    reference evaluator — catches operator-translation drift the
    hand-picked cases can't."""
    import random

    rng = random.Random(42)
    rows = [
        (
            i,
            rng.choice(["news", "blog", "paper", None]),
            rng.choice([None] + list(range(10))),
            rng.uniform(-5, 5) if rng.random() < 0.9 else None,
        )
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id int, kind string, score int, weight double")

    FIELDS = {"kind": ["news", "blog", "paper", "zine"], "score": list(range(10)),
              "weight": [-1.0, 0.0, 2.5]}
    OPS = ["$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$nin", "$exists"]

    def rand_leaf():
        field = rng.choice(list(FIELDS))
        op = rng.choice(OPS)
        vals = FIELDS[field]
        if op in ("$in", "$nin"):
            return {field: {op: rng.sample(vals, k=rng.randint(1, min(3, len(vals))))}}
        if op == "$exists":
            return {field: {"$exists": rng.random() < 0.5}}
        if field == "kind" and op in ("$gt", "$gte", "$lt", "$lte"):
            op = "$eq"  # keep ordering ops numeric: simpler reference
        return {field: {op: rng.choice(vals)}}

    def rand_filter(depth=0):
        r = rng.random()
        if depth < 2 and r < 0.25:
            return {"$and": [rand_filter(depth + 1) for _ in range(rng.randint(1, 3))]}
        if depth < 2 and r < 0.5:
            return {"$or": [rand_filter(depth + 1) for _ in range(rng.randint(1, 3))]}
        f = rand_leaf()
        if rng.random() < 0.3:
            f.update(rand_leaf())  # implicit AND across fields
        return f

    def py_leaf(row, field, op, val):
        x = row[field]
        if op == "$exists":
            return (x is not None) == bool(val)
        if x is None:
            return False  # SQL three-valued logic: NULL never matches
        return {
            "$eq": lambda: x == val,
            "$ne": lambda: x != val,
            "$gt": lambda: x > val,
            "$gte": lambda: x >= val,
            "$lt": lambda: x < val,
            "$lte": lambda: x <= val,
            "$in": lambda: x in val,
            "$nin": lambda: x not in val,
        }[op]()

    def py_eval(row, fd):
        if not fd:
            return True
        out = True
        for key, spec in fd.items():
            if key == "$and":
                out = out and all(py_eval(row, s) for s in spec)
            elif key == "$or":
                out = out and any(py_eval(row, s) for s in spec)
            elif isinstance(spec, dict):
                out = out and all(py_leaf(row, key, op, v) for op, v in spec.items())
            else:
                out = out and py_leaf(row, key, "$eq", spec)
        return out

    filters = [rand_filter() for _ in range(200)]
    cols = [
        filter_dict_to_column(fd).alias(f"f{i}") for i, fd in enumerate(filters)
    ]
    got = df.select("id", *cols).collect()
    by_id = {r["id"]: r for r in got}
    pyrows = [dict(zip(["id", "kind", "score", "weight"], r)) for r in rows]
    for row in pyrows:
        spark_row = by_id[row["id"]]
        for i, fd in enumerate(filters):
            expected = py_eval(row, fd)
            actual = bool(spark_row[f"f{i}"]) if spark_row[f"f{i}"] is not None else False
            assert actual == expected, (
                f"filter {fd} row {row}: spark={actual} python={expected}"
            )


def test_in_accepts_sets_rejects_strings_and_dicts(meta):
    """$in/$nin accept any concrete non-string collection (set,
    frozenset, dict_keys) — ADVICE r3 #5 — while still rejecting the
    string footgun, mappings, and single-use generators."""
    as_list = _ids(meta, {"lang": {"$in": ["en", "de"]}})
    for coll in ({"en", "de"}, frozenset({"en", "de"}), {"en": 1, "de": 2}.keys()):
        assert _ids(meta, {"lang": {"$in": coll}}) == as_list
    assert _ids(meta, {"lang": {"$nin": {"en"}}}) == _ids(
        meta, {"lang": {"$nin": ["en"]}}
    )
    for bad in ("en", b"en", {"en": 1}, (x for x in ["en"])):
        with pytest.raises(ValueError, match="collection"):
            filter_dict_to_column({"lang": {"$in": bad}})
