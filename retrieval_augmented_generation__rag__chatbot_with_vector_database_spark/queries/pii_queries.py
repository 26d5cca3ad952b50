"""PII scrub queries (operators.pii) over ``documents``.

The synthetic corpus is PII-free word salad, so each query PLANTS
deterministic identifiers (email / IPv4 always; SSN, phone, card on
doc_id residue classes) into the text on BOTH engines — the planted
frame is the fixture, the scrub is what's under test. Regexes and
replacement order come from ``operators.pii.PII_PATTERNS``; the oracle
SQL is GENERATED from that same list so both engines execute the
identical automaton in the identical order (the ``text_queries``
marker-list convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.pii import (
    PII_PATTERNS,
    scrub_documents,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.queries import (
    load,
    register,
)


def _planted(docs: DataFrame) -> DataFrame:
    """documents + deterministic planted PII. Twin of ``_PLANTED_SQL``."""
    did = F.col("doc_id")
    pad4 = F.lpad((did % 10000).cast("string"), 4, "0")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        did.cast("string"),
        F.lit("@example.com from 10."),
        (did % 256).cast("string"),
        F.lit(".0."),
        ((did * 7) % 256).cast("string"),
        F.when(did % 3 == 0, F.concat(F.lit(" ssn 123-45-"), pad4)).otherwise(
            F.lit("")
        ),
        F.when(did % 5 == 0, F.concat(F.lit(" call 415-555-"), pad4)).otherwise(
            F.lit("")
        ),
        F.when(
            did % 7 == 0, F.concat(F.lit(" card 4111-1111-1111-"), pad4)
        ).otherwise(F.lit("")),
    )
    return docs.select("doc_id", planted.alias("text"))


_PLANTED_SQL = """
SELECT doc_id,
       text || ' contact user' || CAST(doc_id AS VARCHAR)
            || '@example.com from 10.' || CAST(doc_id % 256 AS VARCHAR)
            || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)
            || CASE WHEN doc_id % 3 = 0
                    THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    ELSE '' END
            || CASE WHEN doc_id % 5 = 0
                    THEN ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    ELSE '' END
            || CASE WHEN doc_id % 7 = 0
                    THEN ' card 4111-1111-1111-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    ELSE '' END
       AS text
FROM documents
"""


def _count_sql() -> str:
    # shielded, like the operator: class k counts on the text with
    # classes < k already replaced
    exprs, cur = [], "text"
    for cat, pat, token in PII_PATTERNS:
        exprs.append(f"len(regexp_extract_all({cur}, '{pat}')) AS n_{cat}")
        cur = f"regexp_replace({cur}, '{pat}', '{token}', 'g')"
    return ",\n         ".join(exprs)


def _scrub_sql() -> str:
    expr = "text"
    for _, pat, token in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{token}', 'g')"
    return expr


_CATS = [cat for cat, _, _ in PII_PATTERNS]
_N_PII_SQL = " + ".join(f"n_{c}" for c in _CATS)

_SCRUB_ORACLE = f"""
WITH planted AS ({_PLANTED_SQL}),
s AS (
  SELECT doc_id,
         {_count_sql()},
         {_scrub_sql()} AS scrubbed
  FROM planted
)
SELECT doc_id, {", ".join(f"n_{c}" for c in _CATS)},
       {_N_PII_SQL} AS n_pii,
       md5(scrubbed) AS scrub_md5,
       length(scrubbed) AS n_chars
FROM s
"""


@register("text_pii_scrub", _SCRUB_ORACLE)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII scrub: category counts + md5 of the scrubbed
    text (full-value proof that every planted identifier was replaced
    and nothing else changed). Pure narrow map — zero shuffles at any
    corpus size."""
    out = scrub_documents(_planted(load(spark, sf_dir, "documents")))
    return out.select(
        "doc_id",
        *[f"n_{c}" for c in _CATS],
        "n_pii",
        F.md5(F.col("text_scrubbed").cast("binary")).alias("scrub_md5"),
        F.length("text_scrubbed").cast("long").alias("n_chars"),
    )


_PROFILE_ORACLE = f"""
WITH planted AS ({_PLANTED_SQL}),
s AS (
  SELECT doc_id,
         {_count_sql()},
         {_scrub_sql()} AS scrubbed,
         text
  FROM planted
)
SELECT {", ".join(f"CAST(SUM(n_{c}) AS BIGINT) AS total_{c}" for c in _CATS)},
       CAST(SUM({_N_PII_SQL}) AS BIGINT) AS total_pii,
       COUNT(*) FILTER (WHERE {_N_PII_SQL} > 0) AS docs_with_pii,
       COUNT(*) AS docs,
       CAST(SUM(length(text) - length(scrubbed)) AS BIGINT) AS chars_removed
FROM s
"""


@register("text_pii_profile", _PROFILE_ORACLE)
def text_pii_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level PII exposure profile: per-category totals, docs
    touched, bytes removed. One partial-aggregated pass (map-side
    combine into a single global row)."""
    out = scrub_documents(_planted(load(spark, sf_dir, "documents")))
    return out.agg(
        *[F.sum(f"n_{c}").cast("long").alias(f"total_{c}") for c in _CATS],
        F.sum("n_pii").cast("long").alias("total_pii"),
        F.sum((F.col("n_pii") > 0).cast("long")).alias("docs_with_pii"),
        F.count("*").alias("docs"),
        F.sum(F.length("text") - F.length("text_scrubbed"))
        .cast("long")
        .alias("chars_removed"),
    )


# Scrub-ingest funnel oracle: planted PII corpus → scrub (the same
# generated regex fold) → the 500/50 greedy-merge chunker twin
# (ingest_queries.chunker_merge_oracle_sql) → content-addressed chunk
# ids. DISTINCT mirrors the VectorIndex's id-keyed LWW: chunks that
# collide on id are byte-identical text by construction (the id
# embeds md5(text) and local_index), so both engines collapse them
# identically. n_pii_residual re-runs the shielded counts on each
# CHUNK independently — every chunk is a contiguous span of scrubbed
# text, so it must be 0; a scrub-after-chunk (or no-scrub) defect
# breaks both the ids and this column.
def _scrub_pipe_oracle() -> str:
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.queries.ingest_queries import (
        chunker_merge_oracle_sql,
    )

    scrubbed = f"""
    SELECT doc_id, {_scrub_sql()} AS text
    FROM ({_PLANTED_SQL.strip()})
    WHERE doc_id < 50
    """
    chunked = chunker_merge_oracle_sql(scrubbed)
    counts, cur = [], "text"
    for cat, pat, token in PII_PATTERNS:
        counts.append(f"len(regexp_extract_all({cur}, '{pat}'))")
        cur = f"regexp_replace({cur}, '{pat}', '{token}', 'g')"
    residual = " + ".join(counts)
    return f"""
SELECT DISTINCT
       'doc_' || local_index || '_' || substr(md5(text), 1, 8) AS id,
       CAST(local_index AS INT) AS chunk_index,
       md5(text) AS chunk_md5,
       CAST({residual} AS BIGINT) AS n_pii_residual
FROM ({chunked})
"""


@register("corpus_scrub_ingest_pipeline", _scrub_pipe_oracle())
def corpus_scrub_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scrub-before-anything ingest funnel, end to end: planted-PII
    documents → ``pii_scrub`` → chunk → embed → ``VectorIndex`` LWW
    upsert → read back. The reference ingests raw user text verbatim
    (``scripts/ingest_documents.py:42-64``); this pipeline's contract
    is that raw text never survives past the first stage — chunk ids
    are content-addressed over the SCRUBBED text (a leak changes every
    id) and ``n_pii_residual`` re-scans every indexed chunk (must be
    0). Collected at the fixture slice (≤ ~120 chunks), not index
    scale; the dataflow under test (``docs_to_records(scrub=True)``)
    is the same narrow map at any scale."""
    import tempfile

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.embed.providers import (
        HashEmbedder,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.pii import (
        pii_counts,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.index_table import (
        VectorIndex,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.streaming.ingest import (
        docs_to_records,
    )

    planted = _planted(load(spark, sf_dir, "documents")).filter(F.col("doc_id") < 50)
    docs = planted.select(
        "text",
        F.concat(F.lit("mem://doc/"), F.col("doc_id").cast("string")).alias(
            "source"
        ),
    )
    with tempfile.TemporaryDirectory() as tmp:
        idx = VectorIndex(spark, tmp, "scrub-pipe").create(dimension=64)
        idx.upsert(
            docs_to_records(docs, HashEmbedder(dimension=64), scrub=True), batch=0
        )
        back = idx.read().select("id", "chunk_index", "text")
        rows = back.collect()
    out = spark.createDataFrame(rows, back.schema)
    residual = sum(pii_counts(F.col("text")).values())
    return out.select(
        "id",
        F.col("chunk_index").cast("int").alias("chunk_index"),
        F.md5(F.col("text").cast("binary")).alias("chunk_md5"),
        residual.cast("long").alias("n_pii_residual"),
    )
