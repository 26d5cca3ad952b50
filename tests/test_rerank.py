"""Cross-encoder rerank seam: pluggable scorer, ordering, ties,
top-k slice, schema passthrough."""

import pandas as pd
import pytest

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.rerank import (
    crossencoder_rerank,
    hash_crossencoder,
)

CAND_SCHEMA = "query_id long, vec_id long, score double, rank int"


def _cand(spark, rows):
    return spark.createDataFrame(rows, CAND_SCHEMA)


def test_custom_scorer_reorders_and_slices(spark):
    # scorer that inverts the stage-1 order
    def invert(pdf: pd.DataFrame) -> pd.Series:
        return 1.0 - pdf["score"]

    cand = _cand(
        spark,
        [(1, 10, 0.9, 1), (1, 11, 0.8, 2), (1, 12, 0.7, 3)],
    )
    out = crossencoder_rerank(cand, invert, k=2).collect()
    got = [(r.vec_id, r.ce_rank) for r in sorted(out, key=lambda r: r.ce_rank)]
    assert got == [(12, 1), (11, 2)]
    # original stage-1 columns pass through unchanged
    assert {r.vec_id: r.rank for r in out} == {12: 3, 11: 2}


def test_tie_break_is_id_asc(spark):
    def constant(pdf: pd.DataFrame) -> pd.Series:
        return pd.Series([0.5] * len(pdf), index=pdf.index)

    cand = _cand(spark, [(1, 30, 0.9, 1), (1, 20, 0.8, 2), (1, 10, 0.7, 3)])
    out = crossencoder_rerank(cand, constant, k=3).collect()
    got = [r.vec_id for r in sorted(out, key=lambda r: r.ce_rank)]
    assert got == [10, 20, 30]


def test_hash_scorer_is_pure_function_of_pair(spark):
    cand = _cand(spark, [(1, 10, 0.9, 1), (2, 10, 0.8, 1)])
    a = {(r.query_id, r.vec_id): r.ce_score
         for r in crossencoder_rerank(cand, hash_crossencoder(), k=5).collect()}
    b = {(r.query_id, r.vec_id): r.ce_score
         for r in crossencoder_rerank(
             cand.repartition(7), hash_crossencoder(), k=5).collect()}
    assert a == b
    # different queries, same doc -> different score (pair-keyed)
    assert a[(1, 10)] != a[(2, 10)]


def test_rerank_rejects_bad_k(spark):
    cand = _cand(spark, [(1, 10, 0.9, 1)])
    with pytest.raises(ValueError, match="k must be positive"):
        crossencoder_rerank(cand, hash_crossencoder(), k=0)
