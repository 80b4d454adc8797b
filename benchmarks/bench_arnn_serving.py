"""AnticipationRNN serving-engine benchmark at the reference eval shape
(2x256 LSTMs, batch 512, 16-bar sequences, 4-measure span — the
`test at batch 512` config of train_arnn_baseline.py:33).

Reports the device step (staged inputs, the bound on a real TPU host)
and the full engine call (host packing + tunnel transfer). Numbers in
docs/SERVING.md "AnticipationRNN serving".

Usage: python benchmarks/bench_arnn_serving.py [batch] [bars]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 512
BARS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
SPAN = 4


def main():
    import jax

    if os.environ.get("INPAINTNET_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    from benchmarks.common_arnn import build_arnn
    from inpaintnet_tpu.serve import token_wire_dtype
    from inpaintnet_tpu.serve_arnn import ARNNServingEngine
    from inpaintnet_tpu.utils.timing import device_timeit

    small = os.environ.get("INPAINTNET_BENCH_SMALL") == "1"
    m = build_arnn(small=small, seed=0)
    dtype = ("float32" if jax.devices()[0].platform == "cpu"
             else "bfloat16")
    eng = ARNNServingEngine(m, batch_buckets=(BATCH,), dtype=dtype)
    print(f"platform={jax.devices()[0].platform} dtype={dtype} "
          f"batch={BATCH} bars={BARS} span={SPAN}", flush=True)

    toks = np.random.RandomState(0).randint(
        0, 60, (BATCH, BARS, 24)
    ).astype(np.int32)
    start = max(1, (BARS - SPAN) // 2)
    out = eng.inpaint(toks, start, SPAN)
    assert (out[:, :start] == toks[:, :start]).all()
    ramp = 3 if small else 30
    for _ in range(ramp):
        eng.inpaint(toks, start, SPAN)

    # device step with staged inputs (the real-TPU-host bound)
    bucket, fn = eng._compiled_for(BATCH, BARS, False)
    total = BARS * 24
    score = jax.device_put(
        np.zeros((bucket, total), token_wire_dtype(m.num_notes))
    )
    sw = jax.device_put(np.full((bucket,), start, np.int32))
    nw = jax.device_put(np.full((bucket,), SPAN, np.int32))
    key = jax.device_put(jax.random.PRNGKey(0))
    temp = jax.device_put(np.float32(1.0))
    dev = device_timeit(fn, eng._params, score, eng._metadata(total),
                        sw, nw, key, temp,
                        iters=10, warmup=ramp, reps=3) * 1e3

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            eng.inpaint(toks, start, SPAN)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"device step (staged inputs): {dev:7.1f} ms "
          f"({BATCH * SPAN / (dev / 1e3):,.0f} span-measures/s)")
    print(f"full engine call:            {best * 1e3:7.1f} ms "
          f"({BATCH * SPAN / best:,.0f} span-measures/s)")


if __name__ == "__main__":
    main()
