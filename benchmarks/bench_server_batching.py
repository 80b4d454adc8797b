"""HTTP dynamic-batching benchmark: concurrent batch-1 inpaint clients
against `InpaintingServer` with coalescing OFF vs ON.

Without batching, concurrent requests serialize on the engine lock and
each pays a full dispatch round-trip (tunnel RTT ~30 ms here dominates).
With `batching=True`, co-arriving requests coalesce into ONE
`inpaint_hetero` device batch (per-row masks + per-row keys), so a burst
of N requests costs ~one device step — responses bit-identical either
way (tests/test_serve_batching.py).

Usage: python benchmarks/bench_server_batching.py [clients] [seconds]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import threading
import time

import numpy as np

CLIENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 64
SECONDS = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
N_BARS, MSL = 16, 24


# npy transport by default: JSON encode/decode dominates the server's
# per-request host cost at this rate (docs/SERVING.md "Bulk transport")
TRANSPORT = "json" if os.environ.get("INPAINTNET_BENCH_JSON") == "1" \
    else "npy"


def _client_loop(port: int, vocab: int, stop: float, lat, done, idx: int):
    from inpaintnet_tpu.client import InpaintingClient

    rs = np.random.RandomState(1000 + idx)
    n = 0
    with InpaintingClient("127.0.0.1", port, timeout=120,
                          transport=TRANSPORT) as client:
        while time.perf_counter() < stop:
            tokens = rs.randint(0, vocab, (1, N_BARS, MSL)).astype(np.int32)
            start = int(rs.randint(4, 11))
            num = int(rs.randint(1, 5))
            seed = int(rs.randint(0, 1 << 30))
            t0 = time.perf_counter()
            out = client.inpaint(tokens, start, num, seed=seed)
            lat.append(time.perf_counter() - t0)
            assert out.shape == tokens.shape
            n += 1
    done[idx] = n


def run_mode(engine, batching: bool) -> dict:
    from inpaintnet_tpu.server import InpaintingServer

    srv = InpaintingServer(engine, port=0, batching=batching,
                           max_wait_ms=8.0)
    port = srv.start()
    vocab = engine.model.vae_model.num_notes
    lat: list = []
    done = [0] * CLIENTS
    stop = time.perf_counter() + SECONDS
    threads = [
        threading.Thread(target=_client_loop,
                         args=(port, vocab, stop, lat, done, i))
        for i in range(CLIENTS)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    total = sum(done)
    out = {
        "batching": batching,
        "requests": total,
        "req_per_s": total / wall,
        "p50_ms": sorted(lat)[len(lat) // 2] * 1e3 if lat else None,
        "p99_ms": sorted(lat)[int(len(lat) * 0.99)] * 1e3 if lat else None,
    }
    if batching and srv._batcher is not None:
        out["device_calls"] = srv._batcher.calls
        out["mean_batch"] = (srv._batcher.requests
                             / max(1, srv._batcher.calls))
    srv.stop()
    return out


def main():
    import jax

    if os.environ.get("INPAINTNET_FORCE_CPU") == "1":
        # JAX_PLATFORMS env is overridden by the hosting TPU plugin; the
        # config API wins if set before backend init (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")

    import __graft_entry__ as g
    from inpaintnet_tpu.serve import InpaintingEngine

    small = os.environ.get("INPAINTNET_BENCH_SMALL") == "1"  # CPU smoke
    _, _, model = g._build_models(**(
        dict(hidden=16, z_dim=12, vocab=30, emb=8) if small else {}
    ))
    quant = os.environ.get("INPAINTNET_SERVE_QUANT",
                           "int8" if jax.devices()[0].platform == "tpu"
                           else "none")
    dtype = "int8" if quant == "int8" else (
        "float32" if jax.devices()[0].platform == "cpu" else "bfloat16"
    )
    buckets = (1, 8, 64) if small else (1, 64, 256)
    engine = InpaintingEngine(model, batch_buckets=buckets, dtype=dtype)
    print(f"platform={jax.devices()[0].platform} dtype={dtype} "
          f"clients={CLIENTS} seconds={SECONDS} buckets={buckets}",
          flush=True)

    # warm + ramp every program the two modes will touch (landmine #6)
    dummy = np.zeros((1, N_BARS, MSL), np.int32)
    req = {"tokens": dummy, "start_measure": 1, "num_measures": 1}
    fills = [{"tokens": np.zeros((bk, N_BARS, MSL), np.int32),
              "start_measure": 1, "num_measures": 1} for bk in buckets]
    for _ in range(3 if small else 30):
        engine.inpaint(dummy, 1, 1, seed=0)
        for f in fills:
            engine.inpaint_hetero([f])

    for batching in (False, True):
        r = run_mode(engine, batching)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
