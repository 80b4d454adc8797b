"""Sweep the encoder kernels' time-tiling factor (ticks per grid step) on
the live chip at the serving shape (round-2 verdict #3: close or roofline
the int8 encoder gap).

Interleaves configs round-robin with >=30 invocations each and reports
MINIMA (docs/PERFORMANCE.md landmine #6 — fresh executables ramp).

Usage: python benchmarks/bench_encoder_tiling.py [rows] [reps]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 24576
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    iters = 5
    E, H, V, T = 10, 512, 60, 24

    from inpaintnet_tpu.ops.encoder_pallas import (
        encoder_hn_pallas,
        encoder_hn_pallas_int8,
    )
    from inpaintnet_tpu.ops.gru import gru_init
    from inpaintnet_tpu.utils.timing import fetch

    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16),
        gru_init(jax.random.PRNGKey(0), E, H, 2, True),
    )
    table = jax.random.normal(jax.random.PRNGKey(1), (V, E), jnp.bfloat16)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (rows, T), 0, V)
    stage = jax.jit(lambda x: x)
    tokens = stage(tokens)

    configs = []
    # (k, tile) pairs: the k-deep ys blocks grow the double-buffered
    # pipeline footprint, so larger k needs a smaller batch tile
    for k, tb in ((1, 512), (2, 512), (2, 256), (3, 256), (4, 256),
                  (6, 256), (4, 128)):
        configs.append((
            f"int8 k={k} tile={tb}",
            lambda k=k, tb=tb: encoder_hn_pallas_int8(
                params, table, tokens, ticks_per_step=k, tile_b=tb),
        ))
    for k, tb in ((1, 256), (2, 256), (2, 128), (4, 128)):
        configs.append((
            f"bf16 k={k} tile={tb}",
            lambda k=k, tb=tb: encoder_hn_pallas(
                params, table, tokens, ticks_per_step=k, tile_b=tb),
        ))

    # compile + warm everything first; drop configs that exceed VMEM
    alive = []
    for name, fn in configs:
        try:
            fetch(fn())
            print(f"compiled {name}", flush=True)
            alive.append((name, fn))
        except Exception as e:  # noqa: BLE001
            print(f"SKIP {name}: {str(e)[:160]}", flush=True)
    configs = alive

    best = {name: float("inf") for name, _ in configs}
    for rep in range(reps):
        for name, fn in configs:
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            fetch(out)
            dt = (time.perf_counter() - t0) / iters * 1e3
            best[name] = min(best[name], dt)
    for name, _ in configs:
        print(f"{name:12s} {best[name]:7.2f} ms  "
              f"({rows / best[name] * 1e3 / 1e3:,.0f}k rows/s)")


if __name__ == "__main__":
    main()
