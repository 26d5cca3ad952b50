"""Stage-timing hooks for bench.py's build/probe attribution.

Three registry composites rebuild a persisted layout per call by the
honest-accounting convention (``hybrid_rrf_topk_indexed``,
``rag_ann_e2e``, ``rag_chat_ann_e2e`` — at serving time those layouts
are prebuilt and incrementally maintained). Their headline bench
number keeps the full rebuild cost, but a probe regression should not
be able to hide inside build noise — so the build sections mark
themselves with :func:`stage` and bench.py records ``build``/``probe``
splits alongside the totals.

Zero overhead off the bench path: the context manager is two
``time.time()`` calls per build; nothing else reads the dict.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Iterator

STAGE_TIMES: dict[str, float] = {}


@contextmanager
def stage(name: str) -> Iterator[None]:
    """Accumulate wall time under ``name`` (additive across nested or
    repeated sections within one query call)."""
    t0 = time.time()
    try:
        yield
    finally:
        STAGE_TIMES[name] = STAGE_TIMES.get(name, 0.0) + (time.time() - t0)


def reset() -> None:
    STAGE_TIMES.clear()
