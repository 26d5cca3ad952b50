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


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_noise_robust_and_discriminative():
    import numpy as np

    rng = np.random.RandomState(0)
    img = rng.rand(32, 32) * 255
    h0 = mm.phash_from_pixels(img)
    # small pixel noise (re-encode model) flips few bits
    for _ in range(10):
        assert _ham(h0, mm.phash_from_pixels(img + rng.randn(32, 32))) <= 6
    # brightness shift moves only the DC term
    assert _ham(h0, mm.phash_from_pixels(img + 40.0)) <= 2
    # distinct images are far
    for _ in range(20):
        assert _ham(h0, mm.phash_from_pixels(rng.rand(32, 32) * 255)) >= 12


def test_phash_metadata_twin_pixels_equal():
    p = mm._build_payload(0)
    assert (mm._fake_pixels(p, 32) == mm._fake_pixels(p + b"EXIF", 32)).all()


def test_phash_neardup_finds_twins_only(spark, media):
    import pyspark.sql.functions as F

    base = media.filter(F.col("kind") == "image").select("media_id", "content")
    twins = base.select(
        (F.col("media_id") + 1000).alias("media_id"),
        F.concat("content", F.lit(b"meta")).alias("content"),
    )
    items = base.unionByName(twins).withColumn("kind", F.lit("image"))
    pairs = mm.phash_neardup_pairs(mm.phash_media(items), max_hamming=4)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    want = {(r["media_id"], r["media_id"] + 1000) for r in base.collect()}
    assert set(got) == want
    assert all(h == 0 for h in got.values())


def test_phash_banding_pigeonhole_guard():
    with pytest.raises(ValueError, match="pigeonhole|exceed"):
        mm.phash_neardup_pairs(None, max_hamming=8, bands=8)
    with pytest.raises(ValueError, match="pigeonhole|exceed"):
        mm.phash_neardup_pairs(None, max_hamming=4, bands=65)


def test_phash_unequal_bands_still_exact(spark):
    # bands=5 (widths 13/13/13/13/12): a planted pair at EXACTLY
    # max_hamming flips must survive whatever bands the flips land in
    import pyspark.sql.functions as F

    base = spark.range(200).select(
        F.col("id").alias("media_id"), F.xxhash64("id").alias("phash")
    )
    twins = spark.range(200).select(
        (F.col("id") + 1000).alias("media_id"),
        # flip 4 bits spread across the word: bits 0, 13, 26, 39 —
        # one per band boundary region
        F.xxhash64("id")
        .bitwiseXOR(F.lit((1 << 0) | (1 << 13) | (1 << 26) | (1 << 39)))
        .alias("phash"),
    )
    pairs = mm.phash_neardup_pairs(
        base.unionByName(twins), max_hamming=4, bands=5
    )
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert {(i, i + 1000) for i in range(200)} <= set(got)
    assert all(got[(i, i + 1000)] == 4 for i in range(200))


def test_phash_auto_bands_is_pigeonhole_floor(spark):
    # bands="auto" (the default) = max_hamming + 1: same exact pairs
    # as any explicit valid banding, fewest exploded rows
    import pyspark.sql.functions as F

    base = spark.range(300).select(
        F.col("id").alias("media_id"), F.xxhash64("id").alias("phash")
    )
    twins = spark.range(300).select(
        (F.col("id") + 1000).alias("media_id"),
        F.xxhash64("id").bitwiseXOR(F.lit((1 << 7) | (1 << 44))).alias("phash"),
    )
    items = base.unionByName(twins)
    auto = {
        (r["id_a"], r["id_b"])
        for r in mm.phash_neardup_pairs(items, max_hamming=4).collect()
    }
    explicit = {
        (r["id_a"], r["id_b"])
        for r in mm.phash_neardup_pairs(items, max_hamming=4, bands=8).collect()
    }
    assert auto == explicit
    assert {(i, i + 1000) for i in range(300)} <= auto


def test_phash_bval_cap_exact_under_cap(spark):
    # adversarial low-entropy corpus: 400 hashes share the low 13
    # bits (one giant bucket in band 0 at the floor split) plus
    # planted twins elsewhere. With bval_cap set, the hot bucket is
    # excluded and bands grow so the pigeonhole still covers every
    # qualifying pair — output pairs must equal the uncapped run's.
    import pyspark.sql.functions as F

    # flat region: low 13 bits all-zero, high bits random
    flat = spark.range(400).select(
        F.col("id").alias("media_id"),
        F.shiftleft(F.xxhash64("id"), 13).alias("phash"),
    )
    twins = spark.range(400).select(
        (F.col("id") + 10_000).alias("media_id"),
        F.shiftleft(F.xxhash64("id"), 13)
        .bitwiseXOR(F.lit((1 << 2) | (1 << 40)))
        .alias("phash"),
    )
    items = flat.unionByName(twins)
    uncapped = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in mm.phash_neardup_pairs(items, max_hamming=4).collect()
    }
    capped = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in mm.phash_neardup_pairs(
            items, max_hamming=4, bval_cap=100
        ).collect()
    }
    assert capped == uncapped
    assert {(i, i + 10_000, 2) for i in range(400)} <= capped


def test_phash_bval_cap_nonconvergence_raises(spark):
    # every hash identical: every band stays hot at every growth —
    # must raise (quadratic pair list is an output problem, not a
    # join problem), never silently drop
    import pyspark.sql.functions as F

    items = spark.range(500).select(
        F.col("id").alias("media_id"), F.lit(12345).cast("long").alias("phash")
    )
    with pytest.raises(RuntimeError, match="converge|exact-dedup"):
        mm.phash_neardup_pairs(items, max_hamming=4, bval_cap=50).collect()


def test_phash_bval_cap_explicit_bands_raises_when_unsafe(spark):
    # explicit bands + cap that would break the guarantee: loud error
    import pyspark.sql.functions as F

    items = spark.range(300).select(
        F.col("id").alias("media_id"),
        F.shiftleft(F.xxhash64("id"), 13).alias("phash"),
    )
    with pytest.raises(RuntimeError, match="pigeonhole"):
        mm.phash_neardup_pairs(
            items, max_hamming=4, bands=5, bval_cap=100
        ).collect()
