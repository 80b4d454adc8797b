"""Micro-benchmark: XLA-scan GRU vs Pallas fused GRU on the encoder shape.

Usage: python benchmarks/bench_gru.py [batch] [hidden] [T]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from inpaintnet_tpu.ops import gru_init
from inpaintnet_tpu.ops.gru import gru_layer_apply

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
H = int(sys.argv[2]) if len(sys.argv) > 2 else 512
T = int(sys.argv[3]) if len(sys.argv) > 3 else 24
IN = 10

params = gru_init(jax.random.PRNGKey(0), IN, H, 1, False)[0][0]
x = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN))
h0 = jnp.zeros((B, H))


from inpaintnet_tpu.utils.timing import device_timeit


def timeit(fn, iters=20):
    return device_timeit(fn, iters=iters) * 1e3


scan = jax.jit(lambda: gru_layer_apply(params, x, h0, impl="xla")[1])
pallas = jax.jit(lambda: gru_layer_apply(params, x, h0, impl="pallas")[1])

import numpy as np
np.testing.assert_allclose(
    np.asarray(scan()), np.asarray(pallas()), atol=1e-4
)
t_scan = timeit(scan)
t_pallas = timeit(pallas)
print(f"B={B} H={H} T={T}: scan {t_scan:.3f} ms, "
      f"pallas-stream {t_pallas:.3f} ms, speedup {t_scan / t_pallas:.2f}x")

# The old whole-slab kernel (VMEM-capped tile_b) — pass --slab to measure.
if "--slab" in sys.argv:
    from inpaintnet_tpu.ops.gru_pallas import gru_layer_pallas
    xw = x @ params["w_ih"] + params["b_ih"]
    slab = jax.jit(lambda: gru_layer_pallas(xw, params["w_hh"], params["b_hh"], h0)[1])
    np.testing.assert_allclose(np.asarray(scan()), np.asarray(slab()), atol=1e-4)
    print(f"pallas-slab (tile 16): {timeit(slab):.3f} ms")

# The manual-DMA variant is fenced (deadlocks at grid > 8 on the hosted
# runtime); pass --dma to measure it at small grids only.
if "--dma" in sys.argv:
    from inpaintnet_tpu.ops.gru_pallas import gru_layer_pallas_dma
    xw = x @ params["w_ih"] + params["b_ih"]
    dma = jax.jit(lambda: gru_layer_pallas_dma(xw, params["w_hh"], params["b_hh"], h0)[1])
    np.testing.assert_allclose(np.asarray(scan()), np.asarray(dma()), atol=1e-4)
    t_dma = timeit(dma)
    print(f"pallas-dma (tile 256): {t_dma:.3f} ms, speedup vs scan {t_scan / t_dma:.2f}x")
