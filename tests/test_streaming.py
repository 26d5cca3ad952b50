"""Incremental ingestion stream tests (streaming.ingest): exactly-once
end state via checkpoint + content-addressed idempotent upsert
(SURVEY.md §2k; reference upload path app/api/routes.py:314-334)."""

import pytest

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.embed.providers import (
    HashEmbedder,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.index_table import (
    VectorIndex,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.streaming.ingest import (
    ingest_directory,
    start_ingest_stream,
)

DOC_A = "alpha beta gamma. " * 60  # > chunk_size → multiple chunks
DOC_B = "delta epsilon zeta eta theta. " * 40


@pytest.fixture()
def dirs(tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    return landing, str(tmp_path / "ckpt"), str(tmp_path / "indexes")


def _drain(q):
    q.awaitTermination(120)
    assert not q.isActive


def test_stream_ingests_then_grows_then_idempotent(spark, dirs):
    landing, ckpt, root = dirs
    (landing / "a.txt").write_text(DOC_A)
    (landing / "b.txt").write_text(DOC_B)
    idx = VectorIndex(spark, root, "stream-idx").create(dimension=64)
    provider = HashEmbedder(dimension=64)

    _drain(start_ingest_stream(spark, str(landing), idx, provider, ckpt))
    n1 = idx.read().count()
    assert n1 > 2  # both docs chunked into several vectors

    # restart on the same checkpoint with no new files → no-op
    _drain(start_ingest_stream(spark, str(landing), idx, provider, ckpt))
    assert idx.read().count() == n1

    # new file → index grows by its chunks only
    (landing / "c.txt").write_text(DOC_A + " tail variation")
    _drain(start_ingest_stream(spark, str(landing), idx, provider, ckpt))
    n2 = idx.read().count()
    assert n2 > n1

    # re-uploading identical content under a new name: new source path
    # → new doc_id → new ids; identical content under the SAME path is
    # the idempotent case, covered by the batch re-ingest below
    ids1 = {r["id"] for r in idx.read().select("id").collect()}
    _drain(start_ingest_stream(spark, str(landing), idx, provider, str(ckpt) + "2"))
    assert {r["id"] for r in idx.read().select("id").collect()} == ids1
    assert idx.read().count() == n2


def test_batch_and_stream_agree(spark, dirs):
    landing, ckpt, root = dirs
    (landing / "a.txt").write_text(DOC_A)
    (landing / "b.txt").write_text(DOC_B)
    provider = HashEmbedder(dimension=64)

    s_idx = VectorIndex(spark, root, "s-idx").create(dimension=64)
    _drain(start_ingest_stream(spark, str(landing), s_idx, provider, ckpt))

    b_idx = VectorIndex(spark, root, "b-idx").create(dimension=64)
    ingest_directory(spark, str(landing), b_idx, provider)

    s_rows = {
        (r["id"], r["text"], r["chunk_index"])
        for r in s_idx.read().select("id", "text", "chunk_index").collect()
    }
    b_rows = {
        (r["id"], r["text"], r["chunk_index"])
        for r in b_idx.read().select("id", "text", "chunk_index").collect()
    }
    assert s_rows == b_rows


def test_dimension_mismatch_rejected(spark, dirs):
    landing, ckpt, root = dirs
    (landing / "a.txt").write_text(DOC_A)
    idx = VectorIndex(spark, root, "dim-idx").create(dimension=32)
    with pytest.raises(Exception, match="dimension mismatch"):
        ingest_directory(spark, str(landing), idx, HashEmbedder(dimension=64))
