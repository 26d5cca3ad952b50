"""Recursive character text chunker (SURVEY.md §2i T1).

Deterministic reimplementation of LangChain 0.1.0's
``RecursiveCharacterTextSplitter(chunk_size=500, chunk_overlap=50,
length_function=len)`` as configured by the reference
(``/root/reference/app/core/config.py:36-38``, applied at
``scripts/ingest_documents.py:67-90``). Semantics re-derived from the
published LangChain source (MIT): split on ``["\\n\\n", "\\n", " ", ""]``
recursively with ``keep_separator=True`` (the separator is glued to the
front of the following piece), merge adjacent pieces up to
``chunk_size`` chars, carrying ``chunk_overlap`` chars of trailing
pieces into the next chunk, strip each chunk, drop empties.

Chunk-for-chunk parity matters because the content-addressed chunk id
(``functions.text.chunk_id``, ref ``scripts/ingest_documents.py:93-105``)
hashes the chunk text — any drift changes every downstream id.

Spark integration: the splitter is pure Python (string processing is a
genuine UDF case — no SQL equivalent), exposed via ``mapInPandas`` so
it streams Arrow batches, one input row → N output rows, no shuffle.
At 100 TB the chunker is a narrow map stage; parallelism = input file
splits. ``chunk_documents`` optionally repartitions first so skewed
document sizes don't serialize into one task.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_SEPARATORS = ["\n\n", "\n", " ", ""]
DEFAULT_CHUNK_SIZE = 500  # app/core/config.py:37
DEFAULT_CHUNK_OVERLAP = 50  # app/core/config.py:38


def _split_with_separator(text: str, separator: str) -> list[str]:
    """Split keeping the separator attached to the front of the
    following piece (LangChain ``keep_separator=True`` mode)."""
    if separator:
        parts = re.split(f"({re.escape(separator)})", text)
        merged = [parts[i] + parts[i + 1] for i in range(1, len(parts), 2)]
        if len(parts) % 2 == 0:
            merged += parts[-1:]
        splits = [parts[0]] + merged
    else:
        splits = list(text)
    return [s for s in splits if s != ""]


def _join_chunk(pieces: list[str]) -> str | None:
    text = "".join(pieces).strip()
    return text if text else None


def _merge_splits(splits: list[str], chunk_size: int, chunk_overlap: int) -> list[str]:
    """Greedy merge with trailing overlap carry-over (LangChain
    ``TextSplitter._merge_splits``; join separator is "" because
    keep_separator glued separators onto the pieces already)."""
    docs: list[str] = []
    current: list[str] = []
    total = 0
    for piece in splits:
        plen = len(piece)
        if total + plen > chunk_size:
            if current:
                doc = _join_chunk(current)
                if doc is not None:
                    docs.append(doc)
                while total > chunk_overlap or (total + plen > chunk_size and total > 0):
                    total -= len(current[0])
                    current = current[1:]
        current.append(piece)
        total += plen
    doc = _join_chunk(current)
    if doc is not None:
        docs.append(doc)
    return docs


def split_text(
    text: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
    separators: list[str] | None = None,
) -> list[str]:
    """Recursively split ``text`` into chunks of ≤ ``chunk_size`` chars
    (except indivisible oversized atoms) with ``chunk_overlap`` carry."""
    seps = separators if separators is not None else DEFAULT_SEPARATORS
    return _split_recursive(text, seps, chunk_size, chunk_overlap)


def _split_recursive(
    text: str, separators: list[str], chunk_size: int, chunk_overlap: int
) -> list[str]:
    final: list[str] = []
    separator = separators[-1]
    next_seps: list[str] = []
    for i, s in enumerate(separators):
        if s == "":
            separator = s
            break
        if s in text:
            separator = s
            next_seps = separators[i + 1 :]
            break
    splits = _split_with_separator(text, separator)
    good: list[str] = []
    for s in splits:
        if len(s) < chunk_size:
            good.append(s)
        else:
            if good:
                final.extend(_merge_splits(good, chunk_size, chunk_overlap))
                good = []
            if not next_seps:
                final.append(s)
            else:
                final.extend(_split_recursive(s, next_seps, chunk_size, chunk_overlap))
    if good:
        final.extend(_merge_splits(good, chunk_size, chunk_overlap))
    return final


CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("local_index", T.IntegerType()),
        T.StructField("n_chunks", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    with_global_index: bool = False,
) -> DataFrame:
    """One row per chunk: ``[doc_id, source, local_index, n_chunks,
    text, chunk_id]``.

    ``local_index`` is the chunk's position within its document —
    stable under any partitioning, so chunk ids stay idempotent across
    re-ingestion at any scale. The reference instead enumerates chunks
    globally across the whole corpus (``scripts/ingest_documents.py:
    206-215``), which is order-dependent; pass
    ``with_global_index=True`` to reproduce that exact scheme
    (adds ``global_index`` ordered by (doc_id, local_index) — requires
    a window over the full corpus, only for parity tests).
    """
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.text import (
        chunk_id,
    )

    src = docs.select(
        F.col(doc_id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
        F.col(source_col).alias("source"),
    )

    def _chunk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for doc_id, text, source in zip(pdf["doc_id"], pdf["text"], pdf["source"]):
                chunks = split_text(text or "", chunk_size, chunk_overlap)
                for i, c in enumerate(chunks):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "source": source,
                            "local_index": i,
                            "n_chunks": len(chunks),
                            "text": c,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in CHUNK_SCHEMA.fields])

    out = src.mapInPandas(_chunk_batches, schema=CHUNK_SCHEMA)
    if with_global_index:
        # scalable global enumeration (zipWithIndex's shape in pure
        # DataFrame ops): range-partition by the global sort key so
        # partition p holds exactly the keys between p's boundaries,
        # count rows per partition (the counts frame is |partitions|
        # rows — bounded by cluster config, not data), turn the counts
        # into cumulative offsets driver-side, and add a PARALLEL
        # per-partition row_number to each row's partition offset. No
        # single-partition WindowExec anywhere — the old
        # Window.orderBy(...) form funneled the whole corpus through
        # one task (tests/test_plans.py pins the new shape).
        # (doc_id, local_index) is unique per row, so the enumeration
        # is identical to the global-window form.
        from pyspark.sql import Window

        part = out.repartitionByRange(F.col("doc_id"), F.col("local_index"))
        pid = part.withColumn("__pid", F.spark_partition_id())
        counts = sorted(
            (r["__pid"], r["c"])
            for r in pid.groupBy("__pid").agg(F.count("*").alias("c")).collect()
        )
        offs, acc = [], 0
        for p, c in counts:
            offs.append((p, acc))
            acc += c
        spark = out.sparkSession
        off_df = spark.createDataFrame(offs, "__pid int, __off long")
        wl = Window.partitionBy("__pid").orderBy("doc_id", "local_index")
        out = (
            pid.join(F.broadcast(off_df), "__pid")
            .withColumn(
                "global_index",
                F.row_number().over(wl) - 1 + F.col("__off"),
            )
            .drop("__pid", "__off")
        )
        out = out.withColumn("chunk_id", chunk_id(F.col("global_index"), F.col("text")))
    else:
        out = out.withColumn("chunk_id", chunk_id(F.col("local_index"), F.col("text")))
    return out


def token_chunks(
    df: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> "DataFrame":
    """Token-budget chunker — the LLM-era splitter the char-based
    recursive chunker (above, LangChain parity) predates: fixed
    ``chunk_tokens``-sized windows over the whitespace token stream
    with ``overlap`` tokens carried between neighbors, so every chunk
    fits a known sequence budget BY CONSTRUCTION (composes with
    ``operators.packing`` which bins by the same whitespace count).

    Pure SQL — tokenize once, explode the window starts, slice the
    token array per window — no Python kernel (unlike the recursive
    chunker, whose separator ladder is inherently sequential). Chunk
    text is the single-space join of its tokens: whitespace runs are
    NOT preserved (documented semantic difference from the char
    chunker, which preserves raw text).

    Output: (id_col, chunk_index, n_tokens, chunk_text). Token-free
    docs yield no chunks. Deterministic; both engines reproduce it
    exactly.
    """
    from pyspark.sql import functions as F

    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    stride = chunk_tokens - overlap
    toks = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""
        ).alias("__arr"),
    )
    arr = F.col("__arr")
    starts = F.when(
        F.size(arr) > 0,
        F.sequence(F.lit(0), F.size(arr) - 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    exploded = toks.select(
        id_col, "__arr", F.posexplode(starts).alias("chunk_index", "__start")
    )
    piece = F.slice(arr, F.col("__start") + 1, chunk_tokens)
    return exploded.select(
        id_col,
        "chunk_index",
        F.size(piece).alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )
