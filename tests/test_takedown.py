"""Per-id takedown (right-to-be-forgotten) propagation across the
persisted layouts: vector index and lexical index."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.index_table import (
    VectorIndex,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.lexical_index import (
    LexicalIndex,
)

REC_COLS = (
    "id string, embedding array<float>, text string, source string, "
    "chunk_index int"
)


def _vec_index(spark, tmp_path, n=12):
    idx = VectorIndex(spark, str(tmp_path), "idx-del").create(dimension=2)
    rows = [(f"id{i}", [float(i), 1.0], f"t{i}", "s", 0) for i in range(n)]
    idx.upsert(spark.createDataFrame(rows, REC_COLS), batch=1)
    return idx


def test_vector_delete_ids_removes_only_targets(spark, tmp_path):
    idx = _vec_index(spark, tmp_path)
    assert idx.delete_ids(["id3", "id7"]) == 2  # deleted-row audit count
    left = {r["id"] for r in idx.read().collect()}
    assert left == {f"id{i}" for i in range(12)} - {"id3", "id7"}


def test_vector_delete_rewrites_only_touched_buckets(spark, tmp_path):
    idx = _vec_index(spark, tmp_path)
    data = idx._data_path
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(data, "bucket=*", "*.parquet"))
    }
    # find which bucket holds id5 so we know what must change
    target_bucket = (
        idx.spark.read.parquet(data)
        .filter(F.col("id") == "id5")
        .select("bucket")
        .first()["bucket"]
    )
    idx.delete_ids(["id5"])
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(data, "bucket=*", "*.parquet"))
    }
    for p, t in after.items():
        b = int(p.split("bucket=")[1].split(os.sep)[0])
        if b != target_bucket:
            assert p in before and before[p] == t, f"untouched {p} rewritten"


def test_vector_delete_absent_ids_noop_and_empty_index(spark, tmp_path):
    idx = _vec_index(spark, tmp_path, n=3)
    assert idx.delete_ids(["nope"]) == 0
    fresh = VectorIndex(spark, str(tmp_path), "idx-fresh").create(dimension=2)
    assert fresh.delete_ids(["anything"]) == 0 and fresh.read().count() == 0


DOCS = [
    (0, "spark engine for large scale data"),
    (1, "vector search with embeddings and spark"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "embeddings power vector search engines"),
]


def _lex_index(spark, tmp_path):
    idx = LexicalIndex(spark, str(tmp_path / "lexdel"))
    idx.create(
        spark.createDataFrame(DOCS, "doc_id long, text string"),
        term_buckets=8,
        doc_buckets=4,
    )
    return idx


def test_lexical_delete_docs_equals_rebuild_without_them(spark, tmp_path):
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.hybrid import (
        bm25_topk,
    )

    idx = _lex_index(spark, tmp_path)
    idx.delete_docs([1, 3])
    q = spark.createDataFrame(
        [(100, "vector search spark")], "query_id long, text string"
    )
    got = idx.bm25_topk(q, k=10, df_cap=None)
    remaining = spark.createDataFrame(
        [DOCS[0], DOCS[2]], "doc_id long, text string"
    )
    want = bm25_topk(q, remaining, k=10, df_cap=None)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # deleted docs are fully gone from both halves
    assert idx.doc_store().filter(F.col("id").isin([1, 3])).count() == 0
    assert idx.postings().filter(F.col("id").isin([1, 3])).count() == 0


def test_lexical_delete_shrinks_corpus_stats(spark, tmp_path):
    idx = _lex_index(spark, tmp_path)
    n_before = idx.corpus_stats().first()["n"]
    idx.delete_docs([2])
    assert idx.corpus_stats().first()["n"] == n_before - 1


def test_lexical_delete_is_idempotent(spark, tmp_path):
    idx = _lex_index(spark, tmp_path)
    idx.delete_docs([0])
    before = sorted(map(tuple, idx.postings().collect()))
    idx.delete_docs([0])  # crash-recovery re-run converges
    assert sorted(map(tuple, idx.postings().collect())) == before


def test_cross_layout_takedown_composes(spark, tmp_path):
    """One takedown call per layout removes the doc everywhere a
    search could surface it."""
    vec = VectorIndex(spark, str(tmp_path), "xidx").create(dimension=2)
    vec.upsert(
        spark.createDataFrame(
            [(str(i), [float(i), 1.0], t, "s", 0) for i, t in DOCS], REC_COLS
        ),
        batch=1,
    )
    lex = _lex_index(spark, tmp_path)
    vec.delete_ids(["1"])
    lex.delete_docs([1])
    assert vec.read().filter(F.col("id") == "1").count() == 0
    assert lex.doc_store().filter(F.col("id") == 1).count() == 0
