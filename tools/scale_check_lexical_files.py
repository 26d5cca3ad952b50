"""File-count trajectory of the lexical-index layout under sustained
micro-batch maintenance (VERDICT r5 'next' #6): run 100 upsert batches
against one LexicalIndex — all touching the same hot term buckets —
and record parquet-file counts per bucket directory over time.

Expected (and verified): counts are BOUNDED BY CONSTRUCTION, not by a
compaction daemon. Every upsert rewrites each touched bucket directory
wholesale: the merged postings are repartitioned BY BUCKET (each
bucket's rows land in exactly one task → exactly one file per bucket
dir), and ``swap_partition_dirs`` renames the fresh directory over the
live one, deleting the ``_old_`` aside before returning. So a bucket
directory holds 1 data file no matter how many batches touched it —
the streaming small-files problem the ``batch_id=<n>``-accumulating
sinks need ``sources.compaction`` for simply does not arise here.

Usage: python tools/scale_check_lexical_files.py [n_batches]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parquet_files(root: str) -> dict[str, int]:
    """bucket-dir -> #parquet data files."""
    out = {}
    for dirpath, _dirnames, filenames in os.walk(root):
        n = sum(1 for f in filenames if f.endswith(".parquet"))
        if n:
            out[os.path.relpath(dirpath, root)] = n
    return out


def main() -> None:
    import tempfile

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (
        get_spark,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.lexical_index import (
        LexicalIndex,
    )

    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("scale_check_lexical_files", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "lex")
        seed = spark.createDataFrame(
            [(i, " ".join(words[i % 3 :])) for i in range(50)],
            "doc_id long, text string",
        )
        idx = LexicalIndex(spark, path).create(seed, term_buckets=8, doc_buckets=4)

        t0 = time.time()
        trajectory = []
        for b in range(1, n_batches + 1):
            # every batch rewrites the SAME hot docs/terms (worst case)
            batch = spark.createDataFrame(
                [(i, f"{words[i % len(words)]} batch{b} shared") for i in range(10)],
                "doc_id long, text string",
            )
            idx.upsert(batch, batch=b)
            if b in (1, 10, 25, 50, 100) or b == n_batches:
                files = parquet_files(path)
                trajectory.append(
                    (b, max(files.values()), sum(files.values()), len(files))
                )
                print(
                    f"batch {b:>3}: max files/bucket-dir "
                    f"{max(files.values())}, total files {sum(files.values())}, "
                    f"bucket dirs {len(files)}"
                )
        dt = time.time() - t0
        print(f"{n_batches} upsert batches in {dt:.1f}s "
              f"({dt / n_batches:.2f}s/batch)")
        maxes = {m for _, m, _, _ in trajectory}
        assert maxes == {1}, f"file count grew: {trajectory}"
        # totals bounded by bucket-dir count (postings + docs buckets)
        totals = [t for _, _, t, _ in trajectory]
        assert max(totals) == min(totals) or max(totals) <= 12 + 4, totals
        print("BOUNDED: every bucket dir holds exactly 1 data file at "
              "every checkpoint — no compaction pass needed")


if __name__ == "__main__":
    main()
