"""Reliable device timing.

On the hosted axon TPU tunnel, ``block_until_ready`` returns before device
execution finishes; the only reliable synchronization is materializing a
result to the host. ``device_timeit`` times N dispatches and forces a
host fetch of (a reduction of) the final output, which drains the in-order
device stream. Keep outputs small or reduce them inside the timed fn.
"""
from __future__ import annotations

import time
from typing import Callable

import jax.numpy as jnp
import numpy as np


def fetch(x) -> float:
    """Force execution + host transfer of a small reduction of x."""
    leaves = [x] if not isinstance(x, (tuple, list)) else list(x)
    total = 0.0
    for leaf in leaves:
        total += float(np.asarray(jnp.sum(leaf.astype(jnp.float32)
                                          if hasattr(leaf, "astype") else leaf)))
    return total


def device_timeit(fn: Callable, *args, iters: int = 10, warmup: int = 2,
                  reps: int = 1) -> float:
    """Seconds per call, host-fetch synchronized.

    With ``reps > 1``, returns the MINIMUM over ``reps`` timing windows of
    ``iters`` calls each — the repo's standard for measurements through the
    drifting hosted-TPU tunnel (docs/PERFORMANCE.md landmines)."""
    for _ in range(warmup):
        fetch(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        fetch(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best
