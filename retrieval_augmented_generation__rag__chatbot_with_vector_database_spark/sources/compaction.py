"""Compaction for ``batch_id=<n>``-accumulating parquet layouts.

The exactly-once streaming sinks in this repo (``streaming/neardup``'s
persistent bucket table, ``streaming/enrich``'s enriched sink, the
near-dup pairs sink) write one ``batch_id=<n>`` partition directory
per micro-batch: replay-idempotent, but after 10k micro-batches the
table is 10k directories of small files and every read pays the
listing + open cost — the classic streaming small-files problem.

``compact_batch_partitions`` folds the settled prefix of those
partitions into a single ``batch_id=-1`` directory of right-sized
files. The protocol preserves BOTH streaming invariants:

- **Replay safety**: only the newest ``keep_latest`` real batches can
  ever be replayed (Structured Streaming replays at most the batches
  whose offsets are not yet committed; committed batch ids are never
  reused after restart). Those are never folded, so a replayed batch
  still overwrites exactly its own partition and the
  ``batch_id != current`` exclusion read still works. ``-1`` is a
  sentinel no real batch ever uses.
- **Crash consistency**: the fold reuses the marker-fenced
  rename-aside swap (``sources.layout``) — one fence covers moving
  the new ``batch_id=-1`` in AND deleting every folded directory, so
  a crash mid-compaction is detected by readers (loud
  ``check_not_torn``) and the pre-compaction data survives in
  ``_old_*`` asides.

Run it from a maintenance schedule or every N micro-batches from the
ingest driver; readers need no change (the parquet union sees one big
partition instead of many small ones). This is the plain-parquet
analog of Delta/Iceberg ``OPTIMIZE``/rewrite-data-files.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.layout import (
    check_not_torn,
    marker_path_for,
    swap_partition_dirs,
)

COMPACTED_ID = -1  # sentinel partition; real micro-batch ids are >= 0


def list_batch_ids(path: str) -> list[int]:
    """Sorted ``batch_id`` partition values present under ``path``
    (missing dir -> empty list)."""
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        if name.startswith("batch_id=") and os.path.isdir(
            os.path.join(path, name)
        ):
            try:
                out.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    return sorted(out)


def compact_batch_partitions(
    spark: SparkSession,
    path: str,
    keep_latest: int = 1,
    min_fold: int = 2,
    target_files: int = 1,
) -> dict:
    """Fold all but the newest ``keep_latest`` ``batch_id`` partitions
    of ``path`` into one ``batch_id=-1`` directory with
    ``target_files`` files. No-op (returning ``folded=0``) when fewer
    than ``min_fold`` foldable partitions exist — compaction should
    amortize, not churn. Returns
    ``{"folded": n, "kept": [...], "rows": n_rows_moved}``.

    Read results are unchanged by construction: the same rows, minus
    their lineage ``batch_id`` (folded rows all report ``-1``); row
    counts are preserved and verified cheaply via the written files'
    footer metadata before the swap.
    """
    if keep_latest < 0:
        raise ValueError(f"keep_latest must be >= 0, got {keep_latest}")
    check_not_torn(path)
    ids = list_batch_ids(path)
    kept = ids[len(ids) - keep_latest :] if keep_latest else []
    fold = [b for b in ids if b not in kept]
    if len(fold) < max(min_fold, 2) or fold == [COMPACTED_ID]:
        return {"folded": 0, "kept": ids, "rows": 0}

    df = (
        spark.read.parquet(path)
        .filter(F.col("batch_id").isin(fold))
        .drop("batch_id")
    )
    tmp = path.rstrip("/") + "._compact_tmp"
    (
        df.withColumn("batch_id", F.lit(COMPACTED_ID))
        .repartition(max(target_files, 1))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(tmp)
    )
    # row-count invariant: what we wrote must equal what we fold away
    n_new = spark.read.parquet(tmp).count()
    n_old = (
        spark.read.parquet(path).filter(F.col("batch_id").isin(fold)).count()
    )
    if n_new != n_old:
        raise RuntimeError(
            f"compaction row-count mismatch at {path}: wrote {n_new}, "
            f"folding {n_old} — aborting before the swap (tmp left at {tmp})"
        )
    parts = sorted({f"batch_id={b}" for b in fold} | {f"batch_id={COMPACTED_ID}"})
    swap_partition_dirs(path, tmp, parts, marker_path_for(path))
    return {"folded": len(fold), "kept": kept, "rows": n_new}
