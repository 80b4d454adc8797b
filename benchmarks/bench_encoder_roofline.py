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

    def build_aot(gates, tile):
        """AOT-compile one variant with its gate fn so every variant's
        executable stays alive at once — enabling genuinely INTERLEAVED
        timing reps (the jit caches are shared across variants because the
        gate fn is a module global captured at trace time, so plain jit
        calls cannot coexist). The jit caches MUST be cleared before each
        lower(): ``jit.lower`` reuses a cached trace, which would silently
        bake the previous variant's gate fn (verified: without the clear,
        full and gutted compile to bit-identical executables)."""
        ep._encoder_hn_pallas_int8.clear_cache()
        ep._encoder_hn_pallas.clear_cache()
        ep.gru_gates_f32 = gates
        try:
            if tile > 0:
                compiled = ep._encoder_hn_pallas_int8.lower(
                    params, table, tokens, tile_b=tile, ticks_per_step=1,
                    out_dtype=None, interpret=False,
                ).compile()
            else:
                compiled = ep._encoder_hn_pallas.lower(
                    params, table, tokens, tile_b=-tile, ticks_per_step=1,
                    interpret=False,
                ).compile()
        finally:
            ep.gru_gates_f32 = real_gates
        return lambda: compiled(params, table, tokens)

    variants = (
        ("int8 full tile=512", real_gates, 512),
        ("int8 full tile=1024", real_gates, 1024),
        ("int8 GUTTED-GATES tile=512", cheap_gates, 512),
        ("bf16 full tile=256", real_gates, -256),
        ("bf16 GUTTED-GATES tile=256", cheap_gates, -256),
    )
    fns = {}
    for name, gates, tile in variants:
        try:
            fns[name] = build_aot(gates, tile)
        except Exception as e:  # noqa: BLE001
            print(f"SKIP {name}: {str(e)[:200]}", flush=True)

    # steady state first: freshly-compiled TPU executables ramp for up to
    # ~30 invocations (PERFORMANCE.md landmine #6)
    for fn in fns.values():
        for _ in range(30):
            fn()
        fetch(fn())

    # interleaved reps: each rep times every variant back to back, minima
    # per variant — cross-variant deltas are then drift-immune
    results = {name: float("inf") for name in fns}
    for _ in range(6):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            for _ in range(5):
                out = fn()
            fetch(out)
            results[name] = min(results[name],
                                (time.perf_counter() - t0) / 5 * 1e3)
    for name in fns:
        print(f"{name:28s} {results[name]:7.2f} ms", flush=True)

    if "int8 full tile=512" in results and "int8 GUTTED-GATES tile=512" in results:
        full = results["int8 full tile=512"]
        gut = results["int8 GUTTED-GATES tile=512"]
        print(f"\nnon-overlapped VPU gate cost: {full - gut:.2f} ms "
              f"({(full - gut) / full * 100:.0f}% of the int8 kernel)")


if __name__ == "__main__":
    main()
