"""Scale probe: batch_id-partition compaction (sources.compaction) —
the streaming small-files problem and its fix.

Simulates a long-running exactly-once stream: 150 micro-batches of 2k
rows, one ``batch_id=<n>`` directory each (single file per batch, as
the sinks write). Measures a full-scan aggregate before and after
compaction, plus directory/file counts.

Usage: python tools/scale_check_compaction.py [n_batches] [rows_per_batch]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.compaction import (
    compact_batch_partitions,
    list_batch_ids,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (
    get_spark,
)

N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 150
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

root = tempfile.mkdtemp(prefix="compact_scale_")
path = os.path.join(root, "acc")
try:
    t0 = time.time()
    for b in range(N_BATCHES):
        spark.range(ROWS).select(
            (F.col("id") + b * ROWS).alias("id"),
            F.md5(F.concat(F.lit(b), F.col("id"))).alias("payload"),
        ).coalesce(1).write.parquet(f"{path}/batch_id={b}")
    t_write = time.time() - t0

    def scan():
        t = time.time()
        n = (
            spark.read.parquet(path)
            .filter(F.col("id") % 7 == 0)
            .agg(F.count("*"), F.max("payload"))
            .first()[0]
        )
        return n, time.time() - t

    def n_files():
        return sum(
            1
            for d, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )

    n1, t_before = scan()
    f_before, d_before = n_files(), len(list_batch_ids(path))
    t0 = time.time()
    stats = compact_batch_partitions(spark, path, keep_latest=1, target_files=4)
    t_compact = time.time() - t0
    n2, t_after = scan()
    f_after, d_after = n_files(), len(list_batch_ids(path))

    assert n1 == n2, (n1, n2)
    print(f"batches={N_BATCHES} rows/batch={ROWS} (write {t_write:.1f}s)")
    print(
        f"before: {d_before} partitions / {f_before} files, scan {t_before:.2f}s"
    )
    print(
        f"compact: folded {stats['folded']} partitions ({stats['rows']} rows) "
        f"in {t_compact:.1f}s"
    )
    print(f"after: {d_after} partitions / {f_after} files, scan {t_after:.2f}s")
finally:
    shutil.rmtree(root, ignore_errors=True)
