"""SparkSession factory tuned for the test/bench environment.

Local mode is ``local[N]`` (single JVM); on a real cluster the same
configs hold except driver memory. AQE is on so skewed similarity
joins and small-side broadcasts re-plan at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(app_name: str = "rag_spark", cpus: str | None = None) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata events.parquet stores TIMESTAMP(NANOS) which the
        # vectorized reader rejects; read as long and convert in load()
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # vector workloads allocate many multi-MB primitive arrays
        # (packed embedding blocks, Arrow batches); G1's default
        # region at an 8g heap is 4 MB, so those become "humongous"
        # allocations — region-sized, contiguous, GCLocker-prone —
        # and 32 concurrent tasks OOM a heap that is mostly free.
        # 32 MB regions make them ordinary allocations.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_DRIVER_JAVA_OPTS", "-XX:G1HeapRegionSize=32m"
            ),
        )
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
