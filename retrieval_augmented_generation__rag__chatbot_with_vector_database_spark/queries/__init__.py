"""Named query registry — the contract for ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 (and the scale
extensions) registers here as a ``(spark, sf_dir) -> DataFrame``
callable plus, when SQL-expressible, a DuckDB oracle SQL string over
the same parquet tables. The driver compares row-count + schema +
order-insensitive value hash at sf=0.01.

Conventions (FIXTURES.md):
- float scores rounded to 6 decimals in BOTH engines before hashing;
- ordered outputs carry an explicit ``rank`` column;
- ties broken by (score, id) deterministically;
- column names aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, None → rows-only check


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = QueryDef(fn, oracle)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table == "events":
        # Older Spark needs this to read TIMESTAMP(NANOS) at all (as
        # long nanos); Spark >= 4.1 ignores it and reads NANOS natively
        # as TIMESTAMP_NTZ. Harmless where ignored.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    # Normalize events.ts to TIMESTAMP_NTZ — the file's naive wall-clock
    # semantic, matching what DuckDB oracles see — across reader
    # behaviors: long nanos (legacy conf honored; integer division, a
    # double epoch would lose precision at ~1e18) or native NTZ
    # (Spark >= 4.1, already correct). timestampadd from the NTZ epoch
    # keeps the long branch independent of the session timezone.
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for f in df.schema.fields:
        if f.name == "ts" and isinstance(f.dataType, T.LongType):
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000, "
                    "TIMESTAMP_NTZ'1970-01-01 00:00:00')"
                ),
            )
        elif f.name == "ts" and isinstance(f.dataType, T.TimestampType):
            # LTZ from some other reader path: reinterpret in session tz
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


def epoch_micros(col) -> "Column":  # noqa: F821 - Column via F
    """Integer microseconds since epoch for a TIMESTAMP_NTZ column —
    the NTZ-safe twin of ``unix_micros`` (which requires LTZ and fails
    analysis on NTZ), timezone-independent by construction."""
    from pyspark.sql import functions as F

    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {col})"
    )


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _import_all()
    return {name: qd.fn for name, qd in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _import_all()
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}


#: The driver's correctness gate oracle-checks the FIRST 50 registry
#: entries at sf0.01 (the full registry runs in the local dual-scale
#: sweeps). Round-12 rotation, completing the cycle: the union of
#: r1–r11 windows left exactly 3 queries with no driver-green record
#: (the round-11 web primitives, registered after that window was
#: pinned) — they go FIRST, followed by this round's 4 new queries
#: (main-content gate, web ingest funnel, robots parse + filter);
#: after r12 every registered query has a driver-green record. The
#: remaining slots re-pin the families that would hurt most at scale —
#: dedup, ANN/quantization, top-k, hybrid-indexed, e2e composites,
#: index maintenance, and the skew/scrub/phash scale guards — so the
#: driver re-verifies them every round from here on. (To stay at 50,
#: four multi-round-green pins — ``index_stats``,
#: ``dedup_simhash_groups``, ``rag_chat_e2e``,
#: ``dedup_embedding_pairs_jl_512`` — rotated out this round; their
#: siblings ``index_upsert_*``/``dedup_simhash_candidates``/
#: ``rag_chat_ann_e2e``/``dedup_embedding_pairs_jl`` still guard those
#: families.)
DRIVER_WINDOW_PRIORITY = [
    # never driver-checked (r11 additions post-rotation + r12 additions)
    "text_html_extract",
    "web_url_dedup",
    "corpus_host_cap",
    "text_html_main_content",
    "corpus_web_ingest_funnel",
    "web_robots_parse",
    "web_robots_filter",
    "corpus_web_robots_funnel",
    "web_crawl_delay",
    # dedup family
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_candidates",
    "dedup_embedding_pairs",
    "dedup_embedding_pairs_ivf",
    "dedup_embedding_pairs_jl",
    "dedup_duplicate_groups_star",
    "corpus_dedup_cascade",
    "dedup_substring_spans",
    # ANN / quantization
    "ann_ivf_topk",
    "ann_ivf_topk_gemm",
    "ann_ivf_topk_gemm_int8",
    "ann_ivf_topk_filtered",
    "ann_ivf_topk_rerank",
    "ann_ivf_recall",
    "ann_ivf_upsert_probe",
    "ann_ivfpq_cosine",
    "ann_ivfpq_dotproduct",
    "ann_ivfpq_filtered",
    "ann_ivfpq_delete",
    "ann_ivfpq_opq",
    # top-k core
    "topk_cosine",
    "topk_cosine_gemm",
    "topk_cosine_dispatched",
    "topk_filtered",
    "topk_mmr",
    "topk_rerank_crossencoder",
    # hybrid (persisted-index paths)
    "hybrid_rrf_topk_indexed",
    "hybrid_bm25_topk_indexed",
    "hybrid_rrf_topk_ivf",
    # end-to-end composites
    "rag_e2e_echo",
    "rag_ann_e2e",
    "rag_chat_ann_e2e",
    "rag_hybrid_e2e",
    # index maintenance
    "index_upsert_lww",
    "index_upsert_bucketed",
    "index_delete_ids",
    # scale guards
    "corpus_scrub_ingest_pipeline",
    "multimodal_phash_neardup",
    "events_top_values_per_type_salted",
]


def _prioritize() -> None:
    missing = [n for n in DRIVER_WINDOW_PRIORITY if n not in REGISTRY]
    if missing:
        # A renamed/removed query must not silently un-pin a
        # scale-critical family from the driver's 50-entry window.
        raise RuntimeError(
            "DRIVER_WINDOW_PRIORITY names missing from REGISTRY "
            f"(rename the pin or restore the query): {missing}"
        )
    front = [n for n in DRIVER_WINDOW_PRIORITY if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(front)]
    ordered = {n: REGISTRY[n] for n in front + rest}
    REGISTRY.clear()
    REGISTRY.update(ordered)


def _import_all() -> None:
    # import for side effect: each module registers its queries
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.queries import (  # noqa: F401
        vector_queries,
        analytics_queries,
        text_queries,
        dedup_queries,
        rag_queries,
        ann_queries,
        multimodal_queries,
        ingest_queries,
        temporal_queries,
        hybrid_queries,
        curation_queries,
        bpe_queries,
        pii_queries,
        web_queries,
    )

    _prioritize()
