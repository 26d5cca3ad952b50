"""Crash-consistent partition-directory swap, shared by the flat
id-bucketed index (``sources.index_table``) and the IVF ANN layout
(``operators.ann``).

Both layouts are parquet tables partitioned on one column whose
incremental maintenance rewrites only the touched partition
directories. The swap itself is the dangerous window: a crash between
deleting the live partition and moving the new one in leaves a
missing-or-mixed layout that a plain reader would silently serve.

The protocol here makes a torn swap *detectable* and *recoverable*:

1. write a ``_swap_inprogress.json`` marker (the fence) listing the
   touched partitions and the tmp dir;
2. per partition: rename the live dir aside to ``_old_<part>``
   (underscore prefix → invisible to Spark's file scanner), rename
   the new dir in, delete the aside — each step an atomic rename on
   the same filesystem;
3. delete the tmp dir, then the marker.

Readers call :func:`check_not_torn` first; a surviving marker means
the swap died mid-flight, and the error message points at the aside
dirs that still hold the pre-swap data. On an object store swap the
rename-aside for a manifest-commit (write new files, then atomically
flip a manifest pointer — the Iceberg/Delta pattern); the marker
discipline is the same.
"""

from __future__ import annotations

import json
import os
import shutil

SWAP_MARKER = "_swap_inprogress.json"


def marker_path_for(data_path: str) -> str:
    """Default marker location: inside the partitioned table dir
    (underscore prefix keeps it invisible to Spark)."""
    return os.path.join(data_path, SWAP_MARKER)


def check_not_torn(data_path: str, marker_path: str | None = None) -> None:
    """Raise loudly if a previous swap died mid-flight."""
    mp = marker_path or marker_path_for(data_path)
    if os.path.exists(mp):
        with open(mp) as f:
            marker = json.load(f)
        raise RuntimeError(
            f"layout at {data_path} has a torn partition swap (marker "
            f"{os.path.basename(mp)} present, touched partitions "
            f"{marker.get('partitions')}); pre-swap data is preserved in "
            f"'_old_<partition>' aside dirs — recover manually, then "
            f"delete the marker"
        )


def swap_partition_dirs(
    data_path: str,
    tmp_path: str,
    partitions: list[str],
    marker_path: str | None = None,
) -> None:
    """Swap ``partitions`` (dir names like ``bucket=3``) from
    ``tmp_path`` into ``data_path`` under the marker fence described in
    the module doc. Partitions present in ``partitions`` but absent
    from ``tmp_path`` are treated as deletions of the live dir (the
    merge produced no rows for them)."""
    mp = marker_path or marker_path_for(data_path)
    with open(mp, "w") as f:
        json.dump({"partitions": partitions, "tmp": tmp_path}, f)
    for part in partitions:
        src = os.path.join(tmp_path, part)
        dst = os.path.join(data_path, part)
        old = os.path.join(data_path, f"_old_{part}")
        if os.path.exists(old):  # stale aside from a recovered run
            shutil.rmtree(old)
        if os.path.exists(dst):
            os.rename(dst, old)
        if os.path.exists(src):
            os.rename(src, dst)
        if os.path.exists(old):
            shutil.rmtree(old)
    shutil.rmtree(tmp_path)
    os.remove(mp)
