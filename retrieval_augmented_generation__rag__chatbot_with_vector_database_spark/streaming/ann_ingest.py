"""Streaming ANN-layout maintenance (SURVEY.md §2k × the ANN
north-star): vectors landing on a directory stream are incrementally
merged into the IVFPQ search layout — the piece that keeps approximate
search FRESH under continuous ingest instead of serving a stale
snapshot until the next full rebuild.

Each micro-batch runs ``operators.pq.upsert_ivfpq_index``: coarse-
assign + PQ-encode with the layout's own sidecar-persisted quantizers,
intra-batch last-write-wins, touched-centroid-partition merge under
the crash-consistent swap protocol. Because the upsert is an
id-idempotent merge (LWW by id), a replayed micro-batch after a
restart converges to the same layout — the checkpoint gives
at-least-once delivery and the merge supplies the idempotence, the
same exactly-once-end-state contract as the flat-index ingest stream
(``streaming/ingest.py``).

Retrain trigger: the caller watches ``rows upserted / rows at build``
(tracked by the IVF tier's ``ivf_staleness``; the IVFPQ sidecar can
carry the same counter) and schedules a full ``write_ivfpq_index``
rebuild when centroids have drifted — the layout stays correct
meanwhile, only recall decays gradually.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.pq import (
    upsert_ivfpq_index,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming import StreamingQuery

VEC_STREAM_SCHEMA = "vec_id long, embedding array<float>"


def start_ivfpq_ingest_stream(
    spark: SparkSession,
    landing_glob: str,
    layout_path: str,
    checkpoint_dir: str,
    schema: str = VEC_STREAM_SCHEMA,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "StreamingQuery":
    """Vectors drop into ``landing_glob``; every micro-batch is
    incrementally merged into the IVFPQ layout at ``layout_path``
    (which must already exist — ``write_ivfpq_index`` creates it).
    availableNow + checkpoint: drain-then-stop, restart-safe."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        upsert_ivfpq_index(
            batch.sparkSession, layout_path, batch, id_col, vec_col
        )

    stream = spark.readStream.schema(schema).parquet(landing_glob)
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
