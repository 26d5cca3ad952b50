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
        # runtime SQL conf — the driver's session may not have it; the
        # events file stores TIMESTAMP(NANOS) which otherwise errors
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    # events.ts is TIMESTAMP(NANOS) → read as long nanos
    # (spark.sql.legacy.parquet.nanosAsLong); convert with integer
    # division — double division would lose precision at ~1e18.
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for f in df.schema.fields:
        if f.name == "ts" and isinstance(f.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _import_all()
    return {name: qd.fn for name, qd in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _import_all()
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}


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
    )
