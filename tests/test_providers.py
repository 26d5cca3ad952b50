"""Embedding provider strategy tests (embed.providers U1-U4, F7):
retry, fallback, mean pooling, and the injected-transport remote seam
— including the distributed mapInPandas round trip."""

import numpy as np
import pytest

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.embed.providers import (
    FallbackProvider,
    HashEmbedder,
    RemoteHTTPProvider,
    RetryingProvider,
    embed_text_column,
)


def test_hash_embedder_deterministic_unit_norm():
    p = HashEmbedder(dimension=32)
    a, b = p.embed_batch(["hello world", "hello world"])
    assert a == b and len(a) == 32
    assert abs(np.linalg.norm(a) - 1.0) < 1e-6
    assert p.embed_batch(["other"])[0] != a


class _Flaky:
    def __init__(self, fail_times, dimension=4):
        self.fail_times = fail_times
        self.calls = 0
        self.dimension = dimension

    def embed_batch(self, texts):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise RuntimeError("503 model loading")
        return [[1.0] * self.dimension for _ in texts]


def test_retrying_provider_recovers_then_exhausts():
    flaky = _Flaky(fail_times=1)
    out = RetryingProvider(flaky, retries=1).embed_batch(["x"])
    assert out == [[1.0] * 4] and flaky.calls == 2

    dead = _Flaky(fail_times=99)
    with pytest.raises(RuntimeError, match="503"):
        RetryingProvider(dead, retries=2).embed_batch(["x"])
    assert dead.calls == 3  # initial + 2 retries, then surfaced


def test_fallback_provider_switches_on_failure():
    primary = _Flaky(fail_times=99, dimension=4)
    secondary = HashEmbedder(dimension=8)  # different dim, like HF->OpenAI
    out = FallbackProvider(primary, secondary).embed_batch(["doc"])
    assert len(out[0]) == 8  # caller must re-check dims (reroute path)


def test_remote_provider_requires_transport():
    with pytest.raises(NotImplementedError, match="transport"):
        RemoteHTTPProvider("sentence-transformers/all-MiniLM-L6-v2").embed_batch(["x"])


def test_remote_provider_mean_pooling():
    # token-level (2D) responses are mean-pooled; sentence-level (1D)
    # pass through (app/core/embeddings.py:90-105)
    def transport(model, texts):
        return [
            [[1.0, 2.0], [3.0, 4.0]],  # 2 tokens x dim 2 -> [2.0, 3.0]
            [5.0, 6.0],
        ]

    p = RemoteHTTPProvider("m", transport=transport)
    out = p.embed_batch(["a", "b"])
    assert out[0] == [2.0, 3.0]
    assert out[1] == [5.0, 6.0]


def test_remote_provider_distributed_roundtrip(spark):
    """F7 through the real mapInPandas kernel: a deterministic injected
    transport runs on executors; pooled vectors come back per row."""

    def transport(model, texts):
        return [[[float(len(t)), 0.0], [0.0, float(len(t))]] for t in texts]

    p = RemoteHTTPProvider("m", transport=transport)
    p.dimension = 2
    df = spark.createDataFrame([("abc",), ("abcdef",)], "text string")
    rows = {r["text"]: r["embedding"] for r in embed_text_column(df, p).collect()}
    assert rows["abc"] == pytest.approx([1.5, 1.5])
    assert rows["abcdef"] == pytest.approx([3.0, 3.0])
