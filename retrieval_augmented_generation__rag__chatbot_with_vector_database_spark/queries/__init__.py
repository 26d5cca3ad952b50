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
#: sweeps). Round-15 rotation — STALENESS mode (policy unchanged since
#: r13): this round's new queries first (no fixtures changed this
#: round, so no re-pins), then the 50-slot window fills with the
#: queries whose latest driver-green record is OLDEST (computed from
#: the union of CORRECTNESS_r*.json; sorted by last-checked round,
#: then name — deterministic). This round that re-freshens the full
#: r11 vintage (hybrid/events/packing/mixture families) and the
#: oldest 10 of the r12 vintage (the IVF/IVFPQ ladder).
DRIVER_WINDOW_PRIORITY = [
    # new in r15, never driver-checked
    "corpus_boilerplate_funnel",
    "web_fetch_schedule_curated",
    "web_crawl_loop_e2e",
    "web_anchor_text_index",
    "web_mirror_hosts",
    # r14-checked but fixture changed this round (fractional-seconds
    # lastmod leg added): re-pin
    "web_recrawl_candidates",
    # stalest records: r11 vintage
    "corpus_epoch_shuffle",
    "corpus_nb_quality_scores",
    "corpus_nb_quality_scores_indexed",
    "corpus_nb_threshold",
    "corpus_pack_sequences",
    "corpus_pack_sequences_bpe",
    "corpus_packing_stats",
    "corpus_perplexity_buckets",
    "corpus_perplexity_buckets_kll",
    "corpus_temperature_mixture",
    "corpus_temperature_mixture_redist",
    "corpus_training_sequences",
    "corpus_vocab_stats",
    "events_asof_purchase_click",
    "events_asof_tolerance",
    "events_audience_overlap_theta",
    "events_daily_users_hll",
    "events_histogram_rollup",
    "events_range_click_context",
    "events_scd2_tier_attribution",
    "events_session_examples",
    "events_value_percentiles",
    "events_value_quantiles_kll",
    "hybrid_bm25_topk",
    "hybrid_lexical_topk",
    "hybrid_prf_terms",
    "hybrid_prf_topk",
    "hybrid_rrf_topk",
    "multimodal_feature_selfmatch",
    "rag_context_budget",
    "text_bigram_nll",
    "text_bigram_nll_indexed",
    "text_bpe_full_encode",
    "text_bpe_token_counts",
    "text_pii_profile",
    "text_token_chunks",
    # r12 vintage (oldest 8 by name: the IVF/IVFPQ ladder)
    "ann_ivf_recall",
    "ann_ivf_topk",
    "ann_ivf_topk_filtered",
    "ann_ivf_topk_gemm",
    "ann_ivf_topk_gemm_int8",
    "ann_ivf_topk_rerank",
    "ann_ivf_upsert_probe",
    "ann_ivfpq_cosine",
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
