"""Benchmark: measures inpainted / sec / chip (the BASELINE.json metric).

Workload = the listening-test generation config of the reference
(script_gen_diff_models.py:141-148): past 6 / target 4 / future 6 measures,
LatentRNN non-autoregressive inpainting (the shipped config,
script_gen_diff_models.py:178) over a frozen full-size MeasureVAE
(512-hidden GRUs, z=256).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is TPU throughput over single-process CPU throughput of the
same program (the reference is a CPU/single-GPU eager-torch pipeline with
no published numbers — BASELINE.md pins "≥20x CPU inpainting throughput"
as the target), with the CPU number measured once and cached in
``bench_baseline.json``.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BATCH = 2048  # throughput peaks here (see docs/PERFORMANCE.md scaling table)
N_PAST, N_TARGET, N_FUTURE = 6, 4, 6
# WARMUP=30: freshly-compiled TPU executables RAMP — the first ~30
# invocations read up to 2x slow (docs/PERFORMANCE.md landmine #6); the
# timed window must start at steady state. ~1.4 s of extra warmup.
# ITERS=40 dispatches per fetch, best of REPS windows: each fetch
# barrier exposes the tail dispatches' tunnel round trips, a fixed tax
# that only amortizes with DEEPER windows, not more of them (landmine
# #7 — the serving steady state keeps the queue deep).
WARMUP, ITERS, REPS = 30, 40, 3
BASELINE_CACHE = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
# The CPU denominator runs the ACTUAL headline-batch program (no
# batch-linear extrapolation): ~2.8 min/iter on this machine class, so
# the measured result is cached (and committed) in bench_baseline.json;
# a fresh machine re-measures once (~8 min). CPU_BATCH is overridable
# for quick smoke (BENCH_CPU_BATCH=64 reproduces the old extrapolated
# denominator, labeled as such in the cache).
CPU_BATCH = int(os.environ.get("BENCH_CPU_BATCH", str(BATCH)))
CPU_ITERS = 2


def measure_throughput(batch: int = BATCH, iters: int = ITERS,
                       measure_latency: bool = True,
                       warmup: int = WARMUP) -> dict:
    import jax
    import numpy as np

    import __graft_entry__ as g

    ds, vae, model = g._build_models()
    # serving dtype: bf16 halves HBM traffic and quadruples MXU throughput;
    # logits/argmax decode is robust to it (set INPAINTNET_BENCH_DTYPE=float32
    # to measure full precision)
    dtype = os.environ.get("INPAINTNET_BENCH_DTYPE", "bfloat16")
    # quantized serving default on TPU: measured QUALITY-NEUTRAL on trained
    # weights (inpaint accuracy identical to f32 — docs/PERFORMANCE.md
    # "int8 serving", benchmarks/quality_check.py). Opt out with
    # INPAINTNET_SERVE_QUANT=none. Applied through the SCOPED override
    # (ops.quantize.serving_quant) — not by mutating os.environ, which
    # would leak into the CPU-baseline subprocess and later engines.
    serve_quant = os.environ.get(
        "INPAINTNET_SERVE_QUANT",
        "int8" if dtype != "float32" else "none",
    )
    if jax.default_backend() != "tpu":
        serve_quant = "none"  # kernel gates are TPU-only; report reality
    if dtype != "float32":
        import jax.numpy as jnp

        from inpaintnet_tpu.models.base import cast_pytree

        model.params = cast_pytree(model.params, jnp.dtype(dtype))
        vae.params = cast_pytree(vae.params, jnp.dtype(dtype))
    vocab = 60
    rng = np.random.RandomState(0)
    # serving-style shape specialization: the workload is a fixed 6/4/6
    # split, so contexts are exactly-sized (the mask machinery accepts any
    # padded length; training uses the full 16-measure buffers)
    past = rng.randint(0, vocab, (batch, N_PAST, 24)).astype(np.int32)
    future = rng.randint(0, vocab, (batch, N_FUTURE, 24)).astype(np.int32)
    target = rng.randint(0, vocab, (batch, N_TARGET, 24)).astype(np.int32)
    pm = np.ones((batch, N_PAST), np.float32)
    fm = np.ones((batch, N_FUTURE), np.float32)
    tm = np.ones((batch, N_TARGET), np.float32)

    from inpaintnet_tpu.ops.quantize import serving_quant

    @jax.jit
    def inpaint(params, vae_params, past, pm, future, fm, target, tm, key):
        # scope active while jit TRACES the body — when the model's
        # kernel gates read the serving mode
        with serving_quant(serve_quant):
            w, samples, z = model.apply(
                params, vae_params, past, future, target,
                past_mask=pm, future_mask=fm, target_mask=tm, train=False,
                rng=key,
            )
        return samples

    from inpaintnet_tpu.utils.timing import fetch

    # stage inputs device-side before timing: on a real TPU host the ~1MB
    # request batch moves over PCIe in ~0.1ms, but the development tunnel
    # uploads at ~10MB/s which would swamp the measurement
    stage = jax.jit(lambda *xs: xs)
    past, pm, future, fm, target, tm = stage(past, pm, future, fm, target, tm)
    args = (model.params, vae.params, past, pm, future, fm, target, tm)
    key = jax.random.PRNGKey(0)
    # NOTE: block_until_ready does not reliably block on hosted TPU tunnels;
    # a host fetch of the output is the only true synchronization.
    # pre-split per-iteration keys: a fold_in inside the loop is a separate
    # tiny dispatch whose tunnel round-trip would dominate the measurement
    reps = REPS if jax.devices()[0].platform == "tpu" else 1
    keys = list(np.asarray(jax.random.split(key, iters * reps + warmup)))
    for w in range(warmup):
        fetch(inpaint(*args, keys[w]))
    dt = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        for i in range(iters):
            out = inpaint(*args, keys[warmup + r * iters + i])
        fetch(out)
        dt = min(dt, (time.perf_counter() - t0) / iters)
    measures_per_sec = batch * N_TARGET / dt

    p50_ms = None
    if not measure_latency:
        return {
            "platform": jax.devices()[0].platform,
            "measures_per_sec": measures_per_sec,
            "batch": batch,
            "p50_latency_ms_2measure": p50_ms,
            "step_ms": dt * 1e3,
            "serve_quant": serve_quant,
        }
    # p50 latency of a single 2-measure inpaint (batch 1)
    small = tuple(
        a[:1] if hasattr(a, "shape") and a.shape and a.shape[0] == batch else a
        for a in args
    )
    tm1 = np.zeros_like(np.asarray(small[7]))
    tm1[:, :2] = 1.0
    small = small[:7] + (tm1,)
    lat_keys = list(np.asarray(jax.random.split(jax.random.PRNGKey(1), 21)))
    fetch(inpaint(*small, lat_keys[0]))
    lats = []
    for i in range(20):
        t0 = time.perf_counter()
        fetch(inpaint(*small, lat_keys[1 + i]))
        lats.append(time.perf_counter() - t0)
    p50_ms = sorted(lats)[len(lats) // 2] * 1e3

    # DEVICE-side p50 of the same batch-1 step, from the profiler's device
    # plane (the host number above is tunnel-RTT-bound; this one is the
    # actual on-device execution span)
    p50_dev_ms = None
    try:
        import tempfile

        from inpaintnet_tpu.utils.profiling import (
            device_event_durations,
            trace,
        )

        n_traced = 10
        with tempfile.TemporaryDirectory() as td:
            with trace(td):
                for i in range(n_traced):
                    fetch(inpaint(*small, lat_keys[1 + i]))
            # whole-executable spans only: sub-op events can carry the
            # module name as a prefix in some profiler versions
            durs = device_event_durations(td, "inpaint",
                                          line_match="XLA Modules")
            if not durs:
                # fall back to unfiltered, keeping only the largest span
                # per invocation (module spans dominate their sub-ops)
                durs = device_event_durations(td, "inpaint")[-n_traced:]
        if durs:
            p50_dev_ms = durs[len(durs) // 2]
    except Exception as e:  # noqa: BLE001 — profiling is best-effort
        print(f"warning: device-side trace unavailable: {e}", file=sys.stderr)

    return {
        "platform": jax.devices()[0].platform,
        "measures_per_sec": measures_per_sec,
        "batch": batch,
        "p50_latency_ms_2measure": p50_ms,
        "p50_device_ms_2measure": p50_dev_ms,
        "step_ms": dt * 1e3,
        "serve_quant": serve_quant,
    }


def _baseline_signature() -> str:
    """Workload fingerprint for the cached CPU denominator: if the bench
    geometry changes, a stale cache would silently skew vs_baseline."""
    return (
        f"b{CPU_BATCH}i{CPU_ITERS}-p{N_PAST}t{N_TARGET}f{N_FUTURE}"
        "-h512z256v60"
    )


def cpu_baseline() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
        if cached.get("signature") == _baseline_signature():
            return cached["measures_per_sec"]
        print(
            "warning: bench_baseline.json was measured for a different "
            "workload; re-measuring the CPU denominator",
            file=sys.stderr,
        )
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        # warmup=1: the 30-call TPU-executable ramp does not apply to the
        # eager-CPU denominator; one warmup absorbs compile
        "import bench, json; r = bench.measure_throughput(bench.CPU_BATCH, bench.CPU_ITERS, measure_latency=False, warmup=1);"
        "print('@@'+json.dumps(r))"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)), timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("@@")]
    if not line:
        raise RuntimeError(f"cpu baseline failed: {out.stderr[-2000:]}")
    r = json.loads(line[-1][2:])
    r["signature"] = _baseline_signature()
    r["iters"] = CPU_ITERS
    # labeled honestly either way: the default measures the headline
    # batch itself; a BENCH_CPU_BATCH override extrapolates batch-linearly
    r["extrapolation"] = (
        f"measured at the headline batch ({BATCH}) x {CPU_ITERS} iters"
        if CPU_BATCH == BATCH else
        f"measured at batch {CPU_BATCH} x {CPU_ITERS} iters; assumed "
        f"batch-linear vs the TPU batch ({BATCH})"
    )
    with open(BASELINE_CACHE, "w") as f:
        json.dump(r, f)
    return r["measures_per_sec"]


def main():
    result = measure_throughput()
    try:
        base = cpu_baseline()
        vs = result["measures_per_sec"] / base
        with open(BASELINE_CACHE) as f:
            base_label = json.load(f)["extrapolation"]
    except Exception as e:  # noqa: BLE001 — baseline is best-effort
        print(f"warning: cpu baseline unavailable: {e}", file=sys.stderr)
        vs = None
        base_label = None
    print(
        json.dumps(
            {
                "metric": "measures_inpainted_per_sec_per_chip",
                "value": round(result["measures_per_sec"], 2),
                "unit": "measures/s",
                "vs_baseline": round(vs, 2) if vs is not None else None,
                "extra": {
                    "platform": result["platform"],
                    "p50_latency_ms_2measure_b1": round(
                        result["p50_latency_ms_2measure"], 2
                    ),
                    "p50_device_ms_2measure_b1": (
                        round(result["p50_device_ms_2measure"], 2)
                        if result.get("p50_device_ms_2measure") is not None
                        else None
                    ),
                    "batch": result["batch"],
                    "step_ms": round(result["step_ms"], 2),
                    "serve_quant": result["serve_quant"],
                    "cpu_baseline": base_label,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
