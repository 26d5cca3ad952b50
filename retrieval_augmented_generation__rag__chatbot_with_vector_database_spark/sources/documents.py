"""Document sources (SURVEY.md §2a S1-S3).

Reference: ``load_documents``
(``/root/reference/scripts/ingest_documents.py:42-64``) — recursive
``**/*.txt`` one-Document-per-file, ``**/*.pdf`` one-Document-per-page
(PyPDFLoader), concatenated.

Spark-first: ``text`` wholetext reads (one row per file — Spark
parallelizes by file), ``binaryFile`` + a pypdf ``mapInPandas`` kernel
for PDFs. pypdf isn't in this container, so the PDF parse is stubbed
behind an import-try with the full Spark plumbing (schema, page
explode) real and tested via the injectable parser seam.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("page", T.IntegerType()),
    ]
)


def load_text_documents(spark: SparkSession, data_dir: str) -> DataFrame:
    """S1: one row per .txt file — `wholetext` keeps file integrity for
    the chunker; `input_file_name()` is the `source` metadata."""
    return (
        spark.read.format("text")
        .option("wholetext", True)
        .option("recursiveFileLookup", True)
        .option("pathGlobFilter", "*.txt")
        .load(data_dir)
        .select(
            F.col("value").alias("text"),
            F.input_file_name().alias("source"),
            F.lit(None).cast("int").alias("page"),
        )
    )


def _default_pdf_parser(content: bytes) -> list[str]:
    try:
        from pypdf import PdfReader  # optional dependency
    except ImportError as e:  # pragma: no cover - environment without pypdf
        raise NotImplementedError(
            "pypdf not installed in this environment; inject parse_fn"
        ) from e
    import io

    return [p.extract_text() or "" for p in PdfReader(io.BytesIO(content)).pages]


def load_pdf_documents(
    spark: SparkSession,
    data_dir: str,
    parse_fn: Callable[[bytes], list[str]] | None = None,
) -> DataFrame:
    """S2: one row per PDF *page* (PyPDFLoader semantics). Binary read
    + Arrow-batched parse kernel; `parse_fn` is injectable for tests
    (bytes -> list of page texts)."""
    import pandas as pd

    parse = parse_fn or _default_pdf_parser
    bin_df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", True)
        .option("pathGlobFilter", "*.pdf")
        .load(data_dir)
        .select("path", "content")
    )

    def _parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for i, page_text in enumerate(parse(bytes(content))):
                    rows.append({"text": page_text, "source": path, "page": i})
            yield pd.DataFrame(rows, columns=["text", "source", "page"])

    return bin_df.mapInPandas(_parse, schema=DOC_SCHEMA)


def load_documents(
    spark: SparkSession,
    data_dir: str,
    parse_fn: Callable[[bytes], list[str]] | None = None,
) -> DataFrame:
    """S3: txt ∪ pdf (unionByName, schema-aligned).

    The pypdf probe happens eagerly on the DRIVER: the kernel's
    NotImplementedError would otherwise only surface inside executors
    at action time (wrapped in PythonException), long after this call
    returned a plan that can never run. With no parser available the
    pdf leg is skipped up front; the kernel raise stays as a backstop.
    """
    txt = load_text_documents(spark, data_dir)
    if parse_fn is None:
        import importlib.util

        if importlib.util.find_spec("pypdf") is None:
            return txt
    pdf = load_pdf_documents(spark, data_dir, parse_fn)
    return txt.unionByName(pdf)


JSONL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


class JsonlScan(NamedTuple):
    """Result of :func:`load_jsonl_documents`. ``clean`` and
    ``quarantined`` both derive from one cached ``source_scan`` —
    returned as an explicit field (not a monkey-patched attribute,
    which vanishes on any transformation) so callers can
    ``source_scan.unpersist()`` once both frames are consumed."""

    clean: DataFrame
    quarantined: DataFrame
    source_scan: DataFrame


def load_jsonl_documents(spark: SparkSession, data_dir: str) -> JsonlScan:
    """JSONL corpus ingest — the interchange format LLM training
    corpora actually ship in (one JSON object per line: ``id``,
    ``text``, optional ``meta`` map).

    Schema is EXPLICIT, never inferred: at 100 TB, inference is a
    full extra pass over the data, and a single malformed shard would
    silently widen column types for everything. Malformed lines go
    through PERMISSIVE mode into ``_corrupt_record`` and are returned
    as a separate quarantine frame (same discipline as the streaming
    decontamination sink) — a bad line never kills the job and never
    silently disappears. Returns :class:`JsonlScan` ``(clean,
    quarantined, source_scan)``; ``clean`` carries (id, text, meta,
    source) with the file path as provenance.

    Both frames share the one CACHED ``source_scan`` (required
    SPARK-26108 workaround); release the cache with
    ``result.source_scan.unpersist()`` once both have been consumed
    (unpersisting a DERIVED frame would not free it).
    Quarantined rows always carry the offending line
    content: ``_corrupt_record`` holds the raw line for malformed
    JSON, and for well-formed JSON that fails the contract (null
    ``text``) it holds the parsed row re-serialized — triage never
    has to re-open the source file.
    """
    raw = (
        spark.read.schema(JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("recursiveFileLookup", True)
        .option("pathGlobFilter", "*.jsonl")
        .json(data_dir)
        .withColumn("source", F.input_file_name())
    )
    # Spark cannot filter on the corrupt column of an unmaterialized
    # json scan (SPARK-26108); route both frames through a cached
    # projection instead of re-reading the files per consumer. The
    # cache is shared by both returned frames, so unpersisting either
    # releases it.
    raw = raw.cache()
    clean = (
        raw.filter(F.col("_corrupt_record").isNull() & F.col("text").isNotNull())
        .select("id", "text", "meta", "source")
    )
    quarantined = raw.filter(
        F.col("_corrupt_record").isNotNull() | F.col("text").isNull()
    ).select(
        "source",
        # valid-JSON-but-null-text rows have a NULL _corrupt_record;
        # reconstruct the line from the parsed fields so the
        # quarantine always shows WHAT was rejected
        F.coalesce(
            F.col("_corrupt_record"),
            F.to_json(F.struct("id", "text", "meta")),
        ).alias("_corrupt_record"),
    )
    return JsonlScan(clean, quarantined, raw)

