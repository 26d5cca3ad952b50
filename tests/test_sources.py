"""Document source + index lifecycle tests (sources.documents S1-S3,
sources.index_table S4-S8/A2/A3)."""

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.documents import (
    load_documents,
    load_pdf_documents,
    load_text_documents,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.index_table import (
    VectorIndex,
    best_index_argmax,
    merge_last_write_wins,
)


@pytest.fixture()
def corpus(tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.txt").write_text("alpha doc\nwith two lines")
    (tmp_path / "sub" / "b.txt").write_text("beta doc")
    (tmp_path / "c.pdf").write_bytes(b"%PDF-fake two pages")
    (tmp_path / "ignored.md").write_text("not loaded")
    return tmp_path


def test_text_scan_recursive_wholetext(spark, corpus):
    rows = load_text_documents(spark, str(corpus)).collect()
    by_src = {r["source"].rsplit("/", 1)[-1]: r["text"] for r in rows}
    assert set(by_src) == {"a.txt", "b.txt"}  # recursive, md ignored
    assert by_src["a.txt"] == "alpha doc\nwith two lines"  # wholetext


def test_pdf_scan_page_explode_with_injected_parser(spark, corpus):
    fake_parser = lambda content: ["page one", "page two"]  # noqa: E731
    rows = load_pdf_documents(spark, str(corpus), parse_fn=fake_parser).collect()
    assert {(r["source"].rsplit("/", 1)[-1], r["page"], r["text"]) for r in rows} == {
        ("c.pdf", 0, "page one"),
        ("c.pdf", 1, "page two"),
    }


def test_union_source(spark, corpus):
    rows = load_documents(spark, str(corpus), parse_fn=lambda c: ["p"]).collect()
    names = sorted(r["source"].rsplit("/", 1)[-1] for r in rows)
    assert names == ["a.txt", "b.txt", "c.pdf"]


def test_index_lifecycle(spark, tmp_path):
    root = str(tmp_path)
    idx = VectorIndex(spark, root, "idx-a")
    assert not idx.exists()
    idx.create(dimension=4, metric="cosine")
    assert idx.exists()
    assert idx.dimension() == 4
    idx.create(dimension=9999)  # idempotent: keeps original props
    assert idx.dimension() == 4
    with pytest.raises(ValueError, match="metric"):
        VectorIndex(spark, root, "idx-bad").create(dimension=4, metric="nope")
    idx.delete()
    assert not idx.exists()


def test_upsert_lww_and_stats(spark, tmp_path):
    idx = VectorIndex(spark, str(tmp_path), "idx-u").create(dimension=2)
    rec = lambda i, v, t: (f"id{i}", v, t, "src", 0)  # noqa: E731
    cols = "id string, embedding array<float>, text string, source string, chunk_index int"
    b1 = spark.createDataFrame([rec(1, [1.0, 0.0], "one"), rec(2, [0.0, 1.0], "two")], cols)
    assert idx.upsert(b1, batch=1) == 2
    b2 = spark.createDataFrame([rec(2, [0.5, 0.5], "two-v2"), rec(3, [1.0, 1.0], "three")], cols)
    assert idx.upsert(b2, batch=2) == 3
    rows = {r["id"]: r["text"] for r in idx.read().collect()}
    assert rows == {"id1": "one", "id2": "two-v2", "id3": "three"}
    stats = idx.stats().collect()[0]
    assert stats["total_vector_count"] == 3 and stats["dimension"] == 2

    bad = spark.createDataFrame([rec(4, [1.0, 2.0, 3.0], "dim3")], cols)
    with pytest.raises(ValueError, match="dimension mismatch"):
        idx.upsert(bad, batch=3)


def test_merge_ties_deterministic(spark):
    cols = "id string, _batch long, text string"
    a = spark.createDataFrame([("x", 1, "a")], cols)
    b = spark.createDataFrame([("x", 1, "a")], cols)
    out = merge_last_write_wins(a, b).collect()
    assert len(out) == 1


def test_best_index_argmax(spark, tmp_path):
    root = str(tmp_path)
    cols = "id string, embedding array<float>, text string, source string, chunk_index int"
    small = VectorIndex(spark, root, "base").create(dimension=2)
    small.upsert(spark.createDataFrame([("a", [1.0, 0.0], "t", "s", 0)], cols), batch=1)
    big = VectorIndex(spark, root, "base-384").create(dimension=2)
    big.upsert(
        spark.createDataFrame(
            [(f"b{i}", [0.0, 1.0], "t", "s", 0) for i in range(3)], cols
        ),
        batch=1,
    )
    cands = ["base", "base-3072", "base-384", "missing"]
    assert best_index_argmax(spark, root, cands) == "base-384"
    assert best_index_argmax(spark, root, ["missing"]) is None
