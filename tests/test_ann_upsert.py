"""Incremental IVF layout maintenance (operators.ann.upsert_ivf_index):
the ANN-side analogue of the flat index's bucketed upsert, so streaming
ingest keeps the search index current without full rebuilds."""

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators import ann

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def cents(emb):
    return ann.seed_centroids(emb, 16)


def _files_md5(root):
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = hashlib.md5(fh.read()).hexdigest()
    return out


def _probe(spark, path, cents, emb, metric="cosine"):
    layout = ann.read_ivf_index(spark, path)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return {
        (r["query_id"], r["rank"]): (r["vec_id"], round(r["score"], 9))
        for r in ann.ivf_topk_gemm(
            queries, layout, cents, k=5, nprobe=4, metric=metric
        ).collect()
    }


def test_upsert_equals_full_rebuild(spark, emb, cents, tmp_path):
    """Build from a subset, incrementally upsert the rest → probing the
    maintained layout equals probing a from-scratch full build."""
    base = emb.filter(F.col("vec_id") % 5 != 0)
    rest = emb.filter(F.col("vec_id") % 5 == 0)
    inc_path = str(tmp_path / "inc")
    full_path = str(tmp_path / "full")
    ann.write_ivf_index(base, inc_path, cents)
    res = ann.upsert_ivf_index(spark, inc_path, rest, cents)
    assert res["n_upserted"] == rest.count()
    ann.write_ivf_index(emb, full_path, cents)
    assert _probe(spark, inc_path, cents, emb) == _probe(
        spark, full_path, cents, emb
    )
    # the layouts hold identical logical content
    a = sorted(ann.read_ivf_index(spark, inc_path).select("vec_id").toPandas()["vec_id"])
    b = sorted(ann.read_ivf_index(spark, full_path).select("vec_id").toPandas()["vec_id"])
    assert a == b


def test_upsert_rewrites_only_touched_partitions(spark, emb, cents, tmp_path):
    path = str(tmp_path / "ivf")
    ann.write_ivf_index(emb, path, cents)
    before = _files_md5(path)
    one = emb.filter(F.col("vec_id") == 42)
    res = ann.upsert_ivf_index(spark, path, one, cents)
    after = _files_md5(path)
    touched_prefixes = tuple(f"centroid_id={c}/" for c in res["touched"])
    assert len(res["touched"]) >= 1
    for p, h in before.items():
        if p.startswith("centroid_id=") and not p.startswith(touched_prefixes):
            assert after.get(p) == h, f"untouched partition rewritten: {p}"


def test_upsert_moves_row_when_centroid_changes(spark, emb, cents, tmp_path):
    """An id whose NEW vector assigns to a different centroid must
    vanish from its old partition (no stale duplicate)."""
    path = str(tmp_path / "ivf")
    ann.write_ivf_index(emb, path, cents)
    layout = ann.read_ivf_index(spark, path)
    old_cid = layout.filter(F.col("vec_id") == 99).first()["centroid_id"]
    # replace vec 99 with an exact copy of centroid 0's vector → it
    # must reassign to centroid 0 (cosine similarity 1.0 is maximal)
    target_vec = cents[0][1]
    moved = spark.createDataFrame(
        [(99, [float(x) for x in target_vec], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    res = ann.upsert_ivf_index(spark, path, moved, cents)
    assert cents[0][0] in res["touched"] and old_cid in res["touched"]
    now = ann.read_ivf_index(spark, path).filter(F.col("vec_id") == 99).collect()
    assert len(now) == 1  # exactly one copy — old version gone
    assert now[0]["centroid_id"] == cents[0][0]


def test_upsert_int8_layout_parity(spark, emb, cents, tmp_path):
    """Incremental upsert into a compressed layout quantizes new rows
    with the same kernel as the build: maintained == rebuilt."""
    base = emb.filter(F.col("vec_id") % 7 != 0)
    rest = emb.filter(F.col("vec_id") % 7 == 0)
    inc_path = str(tmp_path / "inc8")
    full_path = str(tmp_path / "full8")
    ann.write_ivf_index(base, inc_path, cents, compression="int8")
    ann.upsert_ivf_index(spark, inc_path, rest, cents)
    ann.write_ivf_index(emb, full_path, cents, compression="int8")
    assert _probe(spark, inc_path, cents, emb) == _probe(
        spark, full_path, cents, emb
    )


def test_staleness_counter_and_meta(spark, emb, cents, tmp_path):
    path = str(tmp_path / "ivf")
    ann.write_ivf_index(emb, path, cents)
    meta = ann.ivf_meta(path)
    assert meta["rows_at_build"] == emb.count()
    assert ann.ivf_staleness(path) == 0.0
    batch = emb.filter(F.col("vec_id") < 50)
    res = ann.upsert_ivf_index(spark, path, batch, cents)
    assert res["n_upserted"] == 50
    assert ann.ivf_staleness(path) == pytest.approx(50 / emb.count())
    # empty batch is a no-op
    res2 = ann.upsert_ivf_index(spark, path, emb.filter(F.lit(False)), cents)
    assert res2["n_upserted"] == 0 and res2["touched"] == []


def test_torn_ivf_swap_detected(spark, emb, cents, tmp_path):
    import json

    path = str(tmp_path / "ivf")
    ann.write_ivf_index(emb, path, cents)
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.layout import (
        marker_path_for,
    )

    with open(marker_path_for(path), "w") as f:
        json.dump({"partitions": ["centroid_id=3"], "tmp": "gone"}, f)
    with pytest.raises(RuntimeError, match="torn"):
        ann.read_ivf_index(spark, path)
    with pytest.raises(RuntimeError, match="torn"):
        ann.upsert_ivf_index(spark, path, emb.limit(1), cents)
    os.remove(marker_path_for(path))
    assert ann.read_ivf_index(spark, path).count() == emb.count()


def test_upsert_rejects_mismatched_quantizer(spark, emb, cents, tmp_path):
    """A centroid list that is not the layout's build-time quantizer
    must be rejected BEFORE any write — rows assigned under a second
    quantizer silently corrupt nprobe pruning (ADVICE r3 #1)."""
    path = str(tmp_path / "ivf")
    ann.write_ivf_index(emb, path, cents)
    wrong = [(cid, [x + 1.0 for x in vec]) for cid, vec in cents]
    before = _files_md5(path)
    with pytest.raises(ValueError, match="quantizer"):
        ann.upsert_ivf_index(spark, path, emb.limit(3), wrong)
    assert _files_md5(path) == before  # nothing was written


def test_upsert_recovers_centroids_from_sidecar(spark, emb, cents, tmp_path):
    """centroids=None loads the exact build-time list back from the
    sidecar — the post-restart recovery path (ADVICE r3 #1)."""
    path = str(tmp_path / "ivf")
    base = emb.filter(F.col("vec_id") % 3 != 0)
    rest = emb.filter(F.col("vec_id") % 3 == 0)
    ann.write_ivf_index(base, path, cents)
    assert ann.load_centroids(path) == cents
    res = ann.upsert_ivf_index(spark, path, rest)  # no centroids passed
    assert res["n_upserted"] == rest.count()
    full_path = str(tmp_path / "full")
    ann.write_ivf_index(emb, full_path, cents)
    assert _probe(spark, path, cents, emb) == _probe(spark, full_path, cents, emb)


def test_upsert_intra_batch_lww(spark, emb, cents, tmp_path):
    """A micro-batch carrying the same vec_id twice — with different
    vectors that assign to different centroids — must contribute
    exactly one survivor row, like merge_last_write_wins (ADVICE r3 #2),
    and resolve to the same survivor on every run."""
    path = str(tmp_path / "ivf")
    ann.write_ivf_index(emb, path, cents)
    v_a = [float(x) for x in cents[0][1]]
    v_b = [float(x) for x in cents[-1][1]]
    dup = spark.createDataFrame(
        [(777, v_a, 1), (777, v_b, 2)],
        "vec_id long, embedding array<float>, label int",
    )
    res = ann.upsert_ivf_index(spark, path, dup, cents)
    rows = (
        ann.read_ivf_index(spark, path).filter(F.col("vec_id") == 777).collect()
    )
    assert len(rows) == 1
    assert res["n_upserted"] == 1  # staleness counts survivors, not raw rows
    survivor = (rows[0]["centroid_id"], rows[0]["label"])
    # deterministic: a re-run of the same dup batch picks the same row
    path2 = str(tmp_path / "ivf2")
    ann.write_ivf_index(emb, path2, cents)
    ann.upsert_ivf_index(spark, path2, dup, cents)
    rows2 = (
        ann.read_ivf_index(spark, path2).filter(F.col("vec_id") == 777).collect()
    )
    assert (rows2[0]["centroid_id"], rows2[0]["label"]) == survivor
