import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    euclidean_distance,
    l2_norm,
    normalize,
    similarity_expr,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
        (2, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
        (3, [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),
        (4, [-1.0, 2.0, -0.5], [0.5, -1.0, 2.0]),
    ]
    return spark.createDataFrame(rows, "id long, a array<double>, b array<double>")


def _col(df, c):
    return {r["id"]: r["v"] for r in df.select("id", c.alias("v")).collect()}


def test_dot(vec_df):
    got = _col(vec_df, dot_product("a", "b"))
    for r in vec_df.collect():
        assert got[r["id"]] == pytest.approx(float(np.dot(r["a"], r["b"])), abs=1e-12)


def test_cosine_matches_numpy(vec_df):
    got = _col(vec_df, cosine_similarity("a", "b"))
    for r in vec_df.collect():
        a, b = np.array(r["a"]), np.array(r["b"])
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            assert got[r["id"]] is None  # null-safe zero-norm
        else:
            assert got[r["id"]] == pytest.approx(float(a @ b / (na * nb)), abs=1e-12)


def test_self_cosine_is_one(vec_df):
    got = _col(vec_df.filter("id != 3"), cosine_similarity("a", "a"))
    for v in got.values():
        assert v == pytest.approx(1.0, abs=1e-12)


def test_euclidean(vec_df):
    got = _col(vec_df, euclidean_distance("a", "b"))
    for r in vec_df.collect():
        exp = float(np.linalg.norm(np.array(r["a"]) - np.array(r["b"])))
        assert got[r["id"]] == pytest.approx(exp, abs=1e-12)


def test_normalize_unit_norm(vec_df):
    n = vec_df.filter("id != 3").select(l2_norm(normalize("a")).alias("n")).collect()
    assert all(r["n"] == pytest.approx(1.0, abs=1e-12) for r in n)
    z = vec_df.filter("id = 3").select(normalize("a").alias("v")).collect()
    assert z[0]["v"] is None


def test_similarity_expr_dispatch(vec_df):
    for m in ("cosine", "euclidean", "dotproduct"):
        assert vec_df.select(similarity_expr(m, "a", "b")).count() == 5
    with pytest.raises(ValueError):
        similarity_expr("manhattan", F.col("a"), F.col("b"))


def test_float_input_cast(spark):
    df = spark.createDataFrame([([1.5, 2.5], [2.0, 4.0])], "a array<float>, b array<float>")
    v = df.select(dot_product("a", "b").alias("d")).collect()[0]["d"]
    assert v == pytest.approx(13.0)
    assert isinstance(v, float)


def test_int8_quantization_roundtrip_bounds(spark):
    import numpy as np

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.vector import (
        dequantize_int8,
        quantization_scale,
        quantize_int8,
    )

    rng = np.random.default_rng(3)
    rows = [(i, rng.standard_normal(16).tolist()) for i in range(50)] + [
        (99, [0.0] * 16)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = (
        df.withColumn("scale", quantization_scale("embedding"))
        .withColumn("q", quantize_int8("embedding", F.col("scale")))
        .withColumn("deq", dequantize_int8("q", F.col("scale")))
        .collect()
    )
    for r in out:
        q = r["q"]
        assert all(-127 <= x <= 127 for x in q)
        if r["vec_id"] == 99:
            assert r["scale"] == 0.0 and all(x == 0 for x in q)
            continue
        # per-coordinate error bounded by scale/2
        err = max(abs(a - b) for a, b in zip(r["embedding"], r["deq"]))
        assert err <= r["scale"] / 2 + 1e-12
        v, d = np.array(r["embedding"]), np.array(r["deq"])
        cos = v @ d / (np.linalg.norm(v) * np.linalg.norm(d))
        assert cos > 0.999


def test_hash_embed_expr_matches_python_provider(spark):
    """functions.vector.hash_embed (Catalyst) must be bit-identical
    with embed.providers.HashEmbedder (Python) — the contract that
    makes derived-text embedding oracle-checkable (rag_chat_e2e)."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.embed.providers import (
        HashEmbedder,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.vector import (
        hash_embed,
    )

    texts = [
        "abc",
        "",
        "Current question: hello",
        "Previous conversation:\nQ: q1\nA: a1\n\nCurrent question: x?",
        "x" * 2000,
        "naïve café 日本語",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {r["text"]: r["v"] for r in df.select("text", hash_embed("text").alias("v")).collect()}
    e = HashEmbedder(dimension=64, seed=42)
    for t in texts:
        assert got[t] == e.embed_one(t), f"bit mismatch for {t[:30]!r}"
    # different seed/dim produce different, correctly-sized vectors
    small = df.select(hash_embed("text", dim=16, seed=7).alias("v")).first()["v"]
    assert len(small) == 16
    e2 = HashEmbedder(dimension=16, seed=7)
    assert small == e2.embed_one(texts[0])


def test_random_projection_matches_numpy(spark):
    """The Spark expression reproduces the same deterministic
    Rademacher projection computed independently in numpy."""
    import numpy as np

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.vector import (
        random_projection,
    )

    import hashlib

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(20, 16)).astype(np.float64)
    seed, out_dim = 7919, 6
    signs = np.array(
        [
            [
                1.0
                if hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[0]
                in "01234567"
                else -1.0
                for j in range(out_dim)
            ]
            for i in range(16)
        ]
    )
    want = (vecs @ signs) * (1.0 / np.sqrt(out_dim))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "id long, embedding array<double>",
    )
    got = {
        r["id"]: r["p"]
        for r in df.select(
            "id", random_projection("embedding", out_dim, seed=seed).alias("p")
        ).collect()
    }
    for i in range(20):
        assert np.allclose(got[i], want[i], atol=1e-9)


def test_random_projection_preserves_distances_on_average(spark):
    """JL sanity: over random pairs, squared-distance ratio in the
    projected space concentrates around 1 (unbiased estimator)."""
    import numpy as np

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.vector import (
        random_projection,
    )

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(40, 64))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "id long, embedding array<double>",
    )
    proj = {
        r["id"]: np.array(r["p"])
        for r in df.select(
            "id", random_projection("embedding", 16).alias("p")
        ).collect()
    }
    ratios = []
    for a in range(0, 40, 2):
        b = a + 1
        d_full = float(np.sum((vecs[a] - vecs[b]) ** 2))
        d_proj = float(np.sum((proj[a] - proj[b]) ** 2))
        ratios.append(d_proj / d_full)
    mean = sum(ratios) / len(ratios)
    assert 0.7 < mean < 1.3  # E[ratio] = 1; 16-d is a coarse sketch


def test_random_projection_rejects_bad_dim(spark):
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.vector import (
        random_projection,
    )

    with pytest.raises(ValueError):
        random_projection("embedding", 0)


def test_random_projection_literal_matrix_path_matches_expression_path(spark):
    """in_dim= (driver-side literal sign matrix) must equal the
    per-row md5 expression path digit for digit."""
    import numpy as np

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.vector import (
        random_projection,
    )

    rng = np.random.default_rng(5)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=12)]) for i in range(10)],
        "id long, embedding array<double>",
    )
    slow = {
        r["id"]: r["p"]
        for r in df.select(
            "id", random_projection("embedding", 5).alias("p")
        ).collect()
    }
    fast = {
        r["id"]: r["p"]
        for r in df.select(
            "id", random_projection("embedding", 5, in_dim=12).alias("p")
        ).collect()
    }
    assert slow == fast
