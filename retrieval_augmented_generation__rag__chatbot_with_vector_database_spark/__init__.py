"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference RAG chatbot
(`danishirfan21/Retrieval-Augmented-Generation--RAG--Chatbot-with-Vector-Database`).

The reference is a FastAPI + Pinecone + LangChain RAG service
(see /root/reference, SURVEY.md). This package re-expresses every one
of its dataflow operators Spark-first:

- ``functions.vector``   — cosine / dot / euclidean similarity as pure
  SQL higher-order-function Columns (reference metric semantics,
  ``app/services/pinecone_service.py:33-39``).
- ``operators.topk``     — brute-force and broadcast top-k similarity
  search (``app/services/pinecone_service.py:148-182``).
- ``operators.chunker``  — deterministic reimplementation of
  RecursiveCharacterTextSplitter(500, 50)
  (``scripts/ingest_documents.py:67-90``).
- ``embed``              — pluggable embedding kernels; deterministic
  hash embedder for tests (``app/core/embeddings.py``).
- ``sources``            — document loaders and the Parquet-backed
  vector index table with keyed upsert
  (``app/services/pinecone_service.py:108-146``).
- ``operators.rag``      — retrieval → context-format → answer assembly
  (``app/rag/retriever.py``, ``app/rag/chain.py``).
- ``operators.dedup``, ``operators.textstats``, ``operators.ann`` —
  the scale extensions (exact/MinHash/SimHash dedup, text quality,
  IVF/LSH ANN) a 100 TB training-data pipeline needs.
- ``streaming.ingest``   — incremental ingestion
  (``app/api/routes.py:314-334``) as Structured Streaming.
"""

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import get_spark

__all__ = ["get_spark"]
