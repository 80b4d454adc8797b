"""Encoder-kernel roofline decomposition on the live chip (round-2 verdict
#3): how much of the int8 encoder time is MXU floor vs VPU gate math vs
overhead, and whether a larger int8 batch tile helps.

Variants (same shapes, serving workload 24,576 rows):
- full int8 kernel (production path)
- gates gutted (transcendentals replaced by a linear combine) — the delta
  is the NON-overlapped VPU cost; the gutted time bounds the MXU+pipeline
  floor from above
- int8 tile sweep incl. 1024 (int8 halves VMEM vs the bf16 512 limit)

Usage: python benchmarks/bench_encoder_roofline.py [rows]
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
    E, H, V, T = 10, 512, 60, 24

    from inpaintnet_tpu.ops import encoder_pallas as ep
    from inpaintnet_tpu.ops.gru import gru_init
    from inpaintnet_tpu.utils.timing import fetch

    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16),
        gru_init(jax.random.PRNGKey(0), E, H, 2, True),
    )
    table = jax.random.normal(jax.random.PRNGKey(1), (V, E), jnp.bfloat16)
    tokens = jax.jit(lambda x: x)(
        jax.random.randint(jax.random.PRNGKey(2), (rows, T), 0, V)
    )

    real_gates = ep.gru_gates_f32

    def cheap_gates(xw, hw, h, hidden):
        # shape-preserving, transcendental-free stand-in: 3H -> H combine
        s = xw + hw
        return 0.25 * (s[:, :hidden] + s[:, hidden:2 * hidden]
                       + s[:, 2 * hidden:]) + 0.5 * h

    def timeit(fn, reps=6, iters=5):
        fetch(fn())
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            fetch(out)
            best = min(best, (time.perf_counter() - t0) / iters * 1e3)
        return best

    results = {}
    for name, gates, tile in (
        ("int8 full tile=512", real_gates, 512),
        ("int8 full tile=1024", real_gates, 1024),
        ("int8 GUTTED-GATES tile=512", cheap_gates, 512),
        ("bf16 full tile=256", real_gates, -256),
        ("bf16 GUTTED-GATES tile=256", cheap_gates, -256),
    ):
        ep.gru_gates_f32 = gates
        # distinct tile values give distinct jit cache entries; gate fn is
        # captured at trace time, so clear the inner caches between variants
        ep._encoder_hn_pallas_int8.clear_cache()
        ep._encoder_hn_pallas.clear_cache()
        try:
            if tile > 0:
                fn = lambda: ep.encoder_hn_pallas_int8(  # noqa: E731
                    params, table, tokens, tile_b=tile)
            else:
                fn = lambda: ep.encoder_hn_pallas(  # noqa: E731
                    params, table, tokens, tile_b=-tile)
            results[name] = timeit(fn)
            print(f"{name:28s} {results[name]:7.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"SKIP {name}: {str(e)[:200]}", flush=True)
        finally:
            ep.gru_gates_f32 = real_gates
    ep._encoder_hn_pallas_int8.clear_cache()
    ep._encoder_hn_pallas.clear_cache()

    if "int8 full tile=512" in results and "int8 GUTTED-GATES tile=512" in results:
        full = results["int8 full tile=512"]
        gut = results["int8 GUTTED-GATES tile=512"]
        print(f"\nnon-overlapped VPU gate cost: {full - gut:.2f} ms "
              f"({(full - gut) / full * 100:.0f}% of the int8 kernel)")


if __name__ == "__main__":
    main()
