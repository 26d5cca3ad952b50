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

Retrain trigger: quantizers (coarse centroids + PQ codebooks) drift as
the corpus moves — probe CORRECTNESS is unaffected meanwhile, but
recall decays. ``retrain_threshold`` watches ``rows upserted / rows at
build`` (the sidecar's staleness counter) after every micro-batch;
past the threshold the stream retrains + rebuilds via
``retrain_ivfpq_index`` from the caller-supplied full-precision
``retrain_source`` (the layout stores only lossy codes, so the primary
vector table must supply the training data). With a threshold but no
source, the breach is loudly logged instead — staleness never fails
silently either way.
"""

from __future__ import annotations

import logging
import warnings
from typing import TYPE_CHECKING, Callable

from pyspark.sql import DataFrame, SparkSession

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.pq import (
    retrain_ivfpq_index,
    upsert_ivfpq_index,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming import StreamingQuery

VEC_STREAM_SCHEMA = "vec_id long, embedding array<float>"

log = logging.getLogger(__name__)


def start_ivfpq_ingest_stream(
    spark: SparkSession,
    landing_glob: str,
    layout_path: str,
    checkpoint_dir: str,
    schema: str = VEC_STREAM_SCHEMA,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    retrain_threshold: float | None = None,
    retrain_source: Callable[[SparkSession], DataFrame] | None = None,
) -> "StreamingQuery":
    """Vectors drop into ``landing_glob``; every micro-batch is
    incrementally merged into the IVFPQ layout at ``layout_path``
    (which must already exist — ``write_ivfpq_index`` creates it).
    availableNow + checkpoint: drain-then-stop, restart-safe.

    ``retrain_threshold`` (e.g. ``0.5`` = half the layout upserted
    since the last build): when a micro-batch pushes staleness past
    it, ``retrain_source(spark)`` — the FULL-PRECISION corpus, i.e.
    the primary vector table the layout serves — feeds a quantizer
    retrain + rebuild (``retrain_ivfpq_index``), resetting staleness.
    Without a source the breach is logged loudly (logging + warning)
    so sustained drift is visible instead of silently eroding recall.
    The rebuild overwrites the whole layout; a crash mid-rebuild is
    recovered by re-running it (the source of truth is elsewhere)."""
    if retrain_threshold is not None and retrain_threshold <= 0:
        raise ValueError("retrain_threshold must be positive")

    def _process(batch: DataFrame, batch_id: int) -> None:
        res = upsert_ivfpq_index(
            batch.sparkSession, layout_path, batch, id_col, vec_col
        )
        stale = res.get("staleness", 0.0)
        if retrain_threshold is None or stale < retrain_threshold:
            return
        if retrain_source is not None:
            retrain_ivfpq_index(
                batch.sparkSession,
                layout_path,
                retrain_source(batch.sparkSession),
                id_col,
                vec_col,
            )
            log.info(
                "ivfpq layout %s retrained at staleness %.3f (threshold %.3f)",
                layout_path, stale, retrain_threshold,
            )
        else:
            msg = (
                f"ivfpq layout {layout_path} staleness {stale:.3f} exceeds "
                f"retrain_threshold {retrain_threshold:.3f} and no "
                "retrain_source was given — recall is decaying; schedule a "
                "retrain_ivfpq_index rebuild from the primary vector table"
            )
            log.warning(msg)
            warnings.warn(msg, stacklevel=2)

    stream = spark.readStream.schema(schema).parquet(landing_glob)
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
