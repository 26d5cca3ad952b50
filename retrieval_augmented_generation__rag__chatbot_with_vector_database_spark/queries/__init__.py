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
#: sweeps). Round-13 rotation — STALENESS mode: with r12 completing
#: union coverage (every registered query has a driver-green record),
#: the window's job changed from first-coverage to record freshness.
#: Policy: this round's new queries first, then the 50-slot window
#: fills with the queries whose latest driver-green record is OLDEST
#: (sorted by last-checked round, then name — deterministic). This
#: round that re-pins the r1-vintage plan/multimodal probes, the r3/r4
#: RAG primitives, and the r9-vintage relational/analytics/text-stat
#: families, none of which have been driver-re-checked since the
#: registry tripled. The scale-critical dedup/ANN/topk/hybrid families
#: all carry fresh r12 records and rotate back in as they age.
DRIVER_WINDOW_PRIORITY = [
    # new in r13, never driver-checked
    "web_fetch_schedule",
    "web_sitemap_seeds",
    "web_seed_schedule",
    "web_link_graph",
    "web_host_degree",
    "web_host_pagerank",
    # stalest records: r1 vintage
    "ann_ivf_partition_sizes",
    "chunk_invariants",
    "multimodal_decode_roundtrip",
    "multimodal_frame_counts",
    "multimodal_resize_plan",
    # r3/r4 vintage (RAG primitives)
    "rag_empty_guard",
    "rag_prompt_template",
    "rag_context",
    "rag_history_rewrite",
    "rag_match_projection",
    "rag_truncate_docs",
    # r9 vintage (relational / analytics / text-stats families)
    "argmax_best_index",
    "batch_query_metrics",
    "corpus_cluster_mixture",
    "corpus_curation_pipeline",
    "corpus_mixture_sample",
    "corpus_top_terms",
    "corpus_weighted_sample",
    "dim_check",
    "documents_field_profile",
    "embeddings_jl_projection",
    "events_conversion_funnel",
    "events_daily_rollup",
    "events_distinct_users_exact",
    "events_hourly",
    "events_props_profile",
    "events_retention_cohorts",
    "events_rollup_day_type",
    "events_session_windows",
    "events_sessionized",
    "events_type_pivot",
    "events_value_histogram",
    "index_stats",
    "nation_revenue",
    "order_priority_stats",
    "pairwise_centroid_sim",
    "part_brand_share",
    "pricing_summary",
    "retrieval_frequency",
    "self_match_rank1",
    "text_fingerprint_uniques",
    "text_gopher_repetition",
    "text_langid_confusion",
    "text_quality_by_lang",
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
