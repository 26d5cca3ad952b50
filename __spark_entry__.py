"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship RAG retrieval pipeline at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 (plus the scale extensions) with DuckDB oracles.
Implementation lives in
``retrieval_augmented_generation__rag__chatbot_with_vector_database_spark/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.queries import (  # noqa: E402
    all_oracles,
    all_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: batch top-k cosine retrieval → context assembly →
    echo-stubbed answers over /root/testdata/sf0.001 (SURVEY.md §3
    entry point 1, Spark-shaped)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.queries.rag_queries import (
        rag_e2e_echo,
    )

    return rag_e2e_echo(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
