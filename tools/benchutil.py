"""Shared helpers for the scale-check tools."""

from __future__ import annotations

import time


def gemm_canary() -> float:
    """Host-health reading (SCALE.md round-10 protocol): best-of-3
    1024x1024 numpy GEMM in GFLOPS. Healthy host ~140+; observed
    noisy-neighbor windows drop it to 0.8-5."""
    import numpy as np

    a = np.random.default_rng(0).random((1024, 1024))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        a @ a
        best = min(best, time.time() - t0)
    return round(2 * 1024**3 / best / 1e9, 1)
