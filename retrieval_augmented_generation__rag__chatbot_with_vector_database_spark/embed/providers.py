"""Embedding kernels (SURVEY.md §2j U1-U4).

Reference: ``EmbeddingGenerator`` (``/root/reference/app/core/
embeddings.py``) — texts → vectors via a remote HF Inference API in
batches of 32 (``:151-155``), with token-level → mean-pooled
normalization (``:90-105``), one retry on 503 (``:75-78``), and a
provider fallback to OpenAI on auth failure (``:160-172``). The
model → dimension registry (``:33-39``) is reproduced below.

Spark-first shape: embedding is the only expensive kernel in the
ingest pipeline, so it runs as ``mapInPandas`` — Arrow-batched, one
narrow stage, no shuffle. Providers are strategy objects serialized to
executors; the remote-HTTP provider is a thin seam (this container
has no network, so it raises unless injected with a client). All
tests and oracles use ``HashEmbedder``: a deterministic, seeded,
md5-driven pseudo-embedding so every engine can reproduce vectors
bit-for-bit without a model.

Scale notes: batch size is controlled by
``spark.sql.execution.arrow.maxRecordsPerBatch`` plus the provider's
internal micro-batch (mirroring the reference's 32); rate-limited
providers should be preceded by ``repartition(n)`` where n ≈ allowed
concurrency — see ``sources.index_table.build_index``.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# app/core/embeddings.py:33-39
MODEL_DIMENSIONS = {
    "BAAI/bge-large-en-v1.5": 1024,
    "sentence-transformers/all-MiniLM-L6-v2": 384,
    "sentence-transformers/all-mpnet-base-v2": 768,
    "text-embedding-3-small": 1536,
    "text-embedding-3-large": 3072,
}

EMBED_BATCH_SIZE = 32  # app/core/embeddings.py:151


class EmbeddingProvider:
    """Strategy interface: ``embed_batch(texts) -> list[list[float]]``."""

    dimension: int

    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        raise NotImplementedError

    def embed(self, texts: list[str]) -> list[list[float]]:
        """Micro-batch loop (reference batches 32 texts per HTTP call,
        ``app/core/embeddings.py:151-155``)."""
        out: list[list[float]] = []
        for i in range(0, len(texts), EMBED_BATCH_SIZE):
            out.extend(self.embed_batch(texts[i : i + EMBED_BATCH_SIZE]))
        return out


class HashEmbedder(EmbeddingProvider):
    """Deterministic pseudo-embedder for tests/oracles.

    vector[j] = centered uniform from md5(f"{seed}:{j//4}:{text}")
    bytes, L2-normalized. Same text → same unit vector, any process,
    any engine. Mean pooling of the reference's token-level path is
    emulated by hashing the whole text (pooling is a no-op for a
    deterministic stub).
    """

    def __init__(self, dimension: int = 64, seed: int = 42):
        self.dimension = dimension
        self.seed = seed

    def _raw(self, text: str) -> np.ndarray:
        need = self.dimension
        vals: list[float] = []
        block = 0
        while len(vals) < need:
            h = hashlib.md5(f"{self.seed}:{block}:{text}".encode()).digest()
            for k in range(0, 16, 4):
                if len(vals) >= need:
                    break
                word = int.from_bytes(h[k : k + 4], "big")
                vals.append(word / 4294967295.0 - 0.5)
            block += 1
        return np.asarray(vals, dtype=np.float64)

    def embed_one(self, text: str) -> list[float]:
        v = self._raw(text)
        # sequential left-fold sum (NOT np.sum's pairwise summation):
        # bit-identical with SQL engines' list_sum folds, so oracles
        # can reproduce the vector exactly (see rag_chat_e2e)
        s = 0.0
        for x in v:
            s += float(x) * float(x)
        n = math.sqrt(s)
        if n == 0.0:
            v = np.ones(self.dimension) / math.sqrt(self.dimension)
            return [float(x) for x in v]
        return [float(x) / n for x in v]

    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        return [self.embed_one(t or "") for t in texts]


class RetryingProvider(EmbeddingProvider):
    """U3: retry wrapper (reference retries once on a 503 'model
    loading' response, ``app/core/embeddings.py:75-78``). Spark task
    retries cover worker faults; this covers provider-side transients.
    """

    def __init__(self, inner: EmbeddingProvider, retries: int = 1):
        self.inner = inner
        self.retries = retries
        self.dimension = inner.dimension

    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        last: Exception | None = None
        for _ in range(self.retries + 1):
            try:
                return self.inner.embed_batch(texts)
            except Exception as e:  # noqa: BLE001 — provider errors are opaque
                last = e
        raise last  # type: ignore[misc]


class FallbackProvider(EmbeddingProvider):
    """U4: provider fallback (reference switches HF → OpenAI
    text-embedding-3-small on a 401, ``app/core/embeddings.py:
    160-172``). NOTE: the fallback may have a different dimension —
    the caller must re-check ``size(embedding)`` (the reference
    re-routes to a ``{index}-{dim}`` table on mismatch,
    ``scripts/ingest_documents.py:176-195``).
    """

    def __init__(self, primary: EmbeddingProvider, secondary: EmbeddingProvider):
        self.primary = primary
        self.secondary = secondary
        self.dimension = primary.dimension

    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        try:
            return self.primary.embed_batch(texts)
        except Exception:  # noqa: BLE001
            return self.secondary.embed_batch(texts)


class RemoteHTTPProvider(EmbeddingProvider):
    """U1 real path: remote embedding API. This container has no
    network access, so the transport must be injected; construction
    documents the seam (batch 32, mean pooling, retry, fallback all
    compose around it)."""

    def __init__(self, model: str, transport=None):
        self.model = model
        self.dimension = MODEL_DIMENSIONS.get(model, 0)
        self._transport = transport

    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        if self._transport is None:
            raise NotImplementedError(
                "no embedding transport injected (offline environment); "
                "use HashEmbedder for deterministic runs"
            )
        vecs = self._transport(self.model, texts)
        # token-level responses → mean pooling (app/core/embeddings.py:90-105)
        out = []
        for v in vecs:
            arr = np.asarray(v, dtype=np.float64)
            out.append([float(x) for x in (arr.mean(axis=0) if arr.ndim == 2 else arr)])
        return out


def embed_text_column(
    df: DataFrame,
    provider: EmbeddingProvider | None = None,
    text_col: str = "text",
    out_col: str = "embedding",
) -> DataFrame:
    """Append an ``array<float>`` embedding column via an Arrow-batched
    ``mapInPandas`` kernel (U1). Narrow stage — no shuffle."""
    provider = provider or HashEmbedder()
    fields = df.schema.fields
    schema = T.StructType(
        list(fields) + [T.StructField(out_col, T.ArrayType(T.FloatType()), True)]
    )
    names = [f.name for f in fields]

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = provider.embed(list(pdf[text_col].fillna("")))
            pdf = pdf.copy()
            pdf[out_col] = [np.asarray(v, dtype=np.float32) for v in vecs]
            yield pdf[names + [out_col]]

    return df.mapInPandas(_embed, schema=schema)
