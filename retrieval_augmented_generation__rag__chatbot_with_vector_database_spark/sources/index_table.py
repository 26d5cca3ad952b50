"""Vector index lifecycle + keyed upsert (SURVEY.md §2a S4-S8).

Reference: ``PineconeService``
(``/root/reference/app/services/pinecone_service.py``):
- create_index(dimension, metric) idempotent          :33-68  (S5)
- index_exists / get_index_dimension                  :70-100 (S7)
- upsert_vectors — batches of 100, last-write-wins    :108-146 (S4)
- delete_index                                        :184-191 (S6)
- describe_index_stats                                :193-204 (A2)

Spark shape: an index is a **Parquet table directory** with a small
JSON sidecar for ``(dimension, metric)`` properties (catalog-free so
it works against any path; swap for TBLPROPERTIES/Delta when a
metastore is available). Upsert = union + window-dedup by id keeping
the newest batch — the MERGE-emulation pattern; with Delta this
becomes ``MERGE INTO`` directly.

Scale notes: the upsert shuffles on ``id`` once; at 100 TB you'd
partition the table by a stable hash bucket of id (``bucket_col``) so
the merge only rewrites touched buckets, and ANN layouts add a
``centroid_id`` partition column (operators.ann). Batching (the
reference's 100-vector requests) is subsumed by Parquet writer
row groups.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

PROPS_FILE = "_index_properties.json"
N_BUCKETS = 32


class VectorIndex:
    """A named vector index backed by a Parquet table."""

    def __init__(self, spark: SparkSession, root: str, name: str):
        self.spark = spark
        self.root = root
        self.name = name

    @property
    def path(self) -> str:
        return os.path.join(self.root, self.name)

    @property
    def _props_path(self) -> str:
        return os.path.join(self.path, PROPS_FILE)

    # -- S5: create (idempotent, like pinecone_service.py:44-51) -----
    def create(self, dimension: int, metric: str = "cosine") -> "VectorIndex":
        from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.vector import (
            METRICS,
        )

        if metric not in METRICS:
            raise ValueError(f"metric must be one of {METRICS}")
        if self.exists():
            return self
        os.makedirs(self.path, exist_ok=True)
        with open(self._props_path, "w") as f:
            json.dump({"dimension": dimension, "metric": metric}, f)
        return self

    # -- S7: exists / describe ---------------------------------------
    def exists(self) -> bool:
        return os.path.exists(self._props_path)

    def properties(self) -> dict:
        with open(self._props_path) as f:
            return json.load(f)

    def dimension(self) -> int:
        return int(self.properties()["dimension"])

    # -- S6: delete ---------------------------------------------------
    def delete(self) -> None:
        if os.path.exists(self.path):
            shutil.rmtree(self.path)

    # -- read ---------------------------------------------------------
    def read(self) -> DataFrame:
        data = os.path.join(self.path, "data")
        if not os.path.exists(data):
            return self.spark.createDataFrame(
                [],
                "id string, embedding array<float>, text string, source string, "
                "chunk_index int, _batch long",
            )
        return self.spark.read.parquet(data)

    # -- S4: keyed upsert (last-write-wins by id) --------------------
    def upsert(self, records: DataFrame, batch: int) -> int:
        """Upsert ``records`` (id, embedding, text, source,
        chunk_index). Same id overwrites — Pinecone upsert semantics
        (pinecone_service.py:108-146). ``batch`` is a caller-supplied
        monotonic version (idempotent re-runs pass the same value).

        Enforces the dimension invariant the reference checks at
        ingest (scripts/ingest_documents.py:176-195).
        """
        dim = self.dimension()
        bad = records.filter(F.size("embedding") != dim).limit(1).count()
        if bad:
            raise ValueError(
                f"dimension mismatch: index {self.name} expects {dim} "
                "(reference would route to a new '{name}-{dim}' index)"
            )
        new = records.select(
            F.col("id").cast("string"),
            F.col("embedding").cast("array<float>"),
            "text",
            "source",
            F.col("chunk_index").cast("int"),
            F.lit(batch).cast("long").alias("_batch"),
        )
        merged = merge_last_write_wins(self.read(), new)
        data = os.path.join(self.path, "data")
        tmp = data + "._tmp"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(data):
            shutil.rmtree(data)
        os.rename(tmp, data)
        return self.read().count()

    # -- A2: stats ----------------------------------------------------
    def stats(self) -> DataFrame:
        return self.read().agg(
            F.count("*").alias("total_vector_count"),
            F.lit(self.dimension()).alias("dimension"),
            F.lit(0.0).alias("index_fullness"),
        )


def merge_last_write_wins(
    existing: DataFrame, new: DataFrame, id_col: str = "id", version_col: str = "_batch"
) -> DataFrame:
    """MERGE-by-key emulation: union → keep newest version per id.
    Ties (idempotent re-ingestion of the same batch) resolve to one
    arbitrary-but-deterministic row via a total order."""
    allr = existing.unionByName(new, allowMissingColumns=True)
    w = Window.partitionBy(id_col).orderBy(F.col(version_col).desc())
    return (
        allr.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def best_index_argmax(spark: SparkSession, root: str, candidates: list[str]) -> str | None:
    """A3: probe candidate indexes, pick the one with the most vectors
    (app/api/routes.py:78-116); None if all empty/missing."""
    best_name, best_count = None, 0
    for name in candidates:
        idx = VectorIndex(spark, root, name)
        if not idx.exists():
            continue
        n = idx.read().count()
        if n > best_count:
            best_name, best_count = name, n
    return best_name
