"""Multimodal kernel tests (operators.multimodal)."""

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators import (
    multimodal as mm,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return mm.attach_fake_media(docs.filter(F.col("doc_id") < 120))


def test_payload_roundtrip(media):
    decoded = mm.decode_media(media)
    orig = {
        r["media_id"]: (r["kind"], r["width"], r["height"], r["n_frames"], r["sample_rate"])
        for r in media.select(
            "media_id", "kind", "width", "height", "n_frames", "sample_rate"
        ).collect()
    }
    for r in decoded.collect():
        assert orig[r["media_id"]] == (
            r["kind"], r["width"], r["height"], r["n_frames"], r["sample_rate"]
        )


def test_resize_preserves_aspect_and_bounds(media):
    out = mm.resize_images(media, max_side=64)
    for r in out.collect():
        if r["kind"] == "audio":
            assert r["width"] == 0 and r["height"] == 0
            continue
        assert 1 <= max(r["width"], r["height"]) <= 64
    # resized payload re-decodes to the new geometry
    redecoded = mm.decode_media(out)
    geo = {r["media_id"]: (r["width"], r["height"]) for r in out.collect()}
    for r in redecoded.collect():
        assert (r["width"], r["height"]) == geo[r["media_id"]]


def test_frame_sampling_counts(media):
    frames = mm.sample_frames(media, every=4).collect()
    expected = {
        r["media_id"]: (r["n_frames"] + 3) // 4
        for r in media.filter(F.col("kind") == "video").collect()
    }
    got: dict[int, int] = {}
    for r in frames:
        got[r["media_id"]] = got.get(r["media_id"], 0) + 1
        assert len(r["frame"]) == 16
        assert r["frame_index"] % 4 == 0
    assert got == expected


def test_features_are_unit_norm_and_deterministic(media):
    f1 = {r["media_id"]: list(r["feature"]) for r in mm.media_features(media).collect()}
    f2 = {r["media_id"]: list(r["feature"]) for r in mm.media_features(media).collect()}
    assert f1 == f2
    import math

    for v in list(f1.values())[:20]:
        assert len(v) == 64
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-3


def test_real_decode_stub_raises(spark):
    df = spark.createDataFrame([(1, bytearray(b"\x89PNG fake"))], "media_id long, content binary")
    with pytest.raises(Exception, match="NotImplementedError|codec|FAKE"):
        mm.decode_media(df).collect()
