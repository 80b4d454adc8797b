"""Mixed-workload soak of the HTTP serving stack on the TPU: concurrent
clients exercising every endpoint (LatentRNN inpaint + ticks +
variations + interpolation + ARNN argmax/sampled at MIXED span lengths)
against one batching server, with per-response validation. The point is
robustness under sustained concurrency (batcher grouping/holdover, lock
discipline, metrics, keep-alive churn), not throughput numbers.

``SOAK_AUTO_REG=1`` serves the auto_reg LatentRNN instead (round-5
verdict #6): the per-row key streams through the autoregressive
generation scan — the newest coalescing path — carry the concurrent
inpaint/ticks/variations traffic.

Reports per-kind request counts, req/s and client-side p50 latency;
exits nonzero on any error.

Usage: python benchmarks/soak_server.py [clients] [seconds]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import threading
import time

import numpy as np

CLIENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 24
SECONDS = float(sys.argv[2]) if len(sys.argv) > 2 else 60.0
VOCAB = 60


KINDS = ("inpaint", "ticks", "variations", "interp", "arnn", "arnn_sampled")


def _client(port: int, stop: float, idx: int, counts, errors, lat):
    from inpaintnet_tpu.client import InpaintingClient

    rs = np.random.RandomState(5000 + idx)
    kind = idx % 6
    with InpaintingClient("127.0.0.1", port, timeout=300) as c:
        while time.perf_counter() < stop:
            t0 = time.perf_counter()
            try:
                if kind == 0:  # batch-1 inpaint (coalesces)
                    t = rs.randint(0, VOCAB, (1, 16, 24))
                    out = c.inpaint(t, int(rs.randint(4, 11)), 2,
                                    seed=int(rs.randint(1 << 30)))
                    assert out.shape == t.shape
                elif kind == 1:  # tick API
                    t = rs.randint(0, VOCAB, (16 * 24,))
                    out = c.inpaint_ticks(t, 24 * 6, 24 * 8)
                    assert out.shape == t.shape
                    assert (out[: 24 * 6] == t[: 24 * 6]).all()
                elif kind == 2:  # variations
                    t = rs.randint(0, VOCAB, (1, 16, 24))
                    out = c.inpaint_variations(t, 6, 2, num_variations=3)
                    assert out.shape == (3,) + t.shape
                elif kind == 3:  # interpolation
                    a = rs.randint(0, VOCAB, (24,))
                    b = rs.randint(0, VOCAB, (24,))
                    out = c.interpolate(a, b, 3)
                    assert out.shape == (5, 24)
                elif kind == 4:  # ARNN argmax, MIXED span lengths
                    # (coalesces via measure buckets + state-holding
                    # tick masks — the round-4 mixed-length path)
                    n = int(rs.randint(1, 5))
                    start = int(rs.randint(1, 15 - n))
                    t = rs.randint(0, VOCAB, (1, 16, 24))
                    out = c.arnn_inpaint(t, start, n)
                    assert (np.asarray(out)[:, :start] == t[:, :start]).all()
                else:  # ARNN sampled, mixed lengths (per-row temperature)
                    n = int(rs.randint(1, 5))
                    t = rs.randint(0, VOCAB, (1, 16, 24))
                    out = c.arnn_inpaint(t, 8, n, seed=int(rs.randint(99)),
                                         temperature=1.5)
                    assert np.asarray(out).shape == t.shape
                counts[idx] += 1
                lat[kind].append(time.perf_counter() - t0)
            except Exception as exc:  # noqa: BLE001 — count, keep going
                errors.append(f"client {idx} ({KINDS[kind]}): {exc!r}")
                time.sleep(0.2)


def main():
    import jax

    if os.environ.get("INPAINTNET_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    from benchmarks.common_arnn import build_arnn
    from inpaintnet_tpu.serve import InpaintingEngine
    from inpaintnet_tpu.serve_arnn import ARNNServingEngine
    from inpaintnet_tpu.server import InpaintingServer

    small = os.environ.get("INPAINTNET_BENCH_SMALL") == "1"
    auto_reg = os.environ.get("SOAK_AUTO_REG") == "1"
    from inpaintnet_tpu.models.presets import build_flagship

    _, _, model = build_flagship(**(
        dict(hidden=16, z_dim=12, vocab_size=VOCAB, emb=8) if small else
        dict(vocab_size=VOCAB)
    ), auto_reg=auto_reg)
    arnn = build_arnn(small=small)

    dtype = "float32" if jax.devices()[0].platform == "cpu" else "int8"
    a_dtype = "float32" if dtype == "float32" else "bfloat16"
    engine = InpaintingEngine(model, batch_buckets=(1, 64),
                              dtype=dtype)
    arnn_engine = ARNNServingEngine(arnn, batch_buckets=(1, 64),
                                    dtype=a_dtype)
    srv = InpaintingServer(engine, port=0, batching=True, max_wait_ms=8,
                           arnn_engine=arnn_engine)
    port = srv.start()
    print(f"soaking {CLIENTS} clients x {SECONDS}s on :{port} "
          f"(dtype {dtype}, auto_reg={auto_reg})", flush=True)

    counts = [0] * CLIENTS
    errors: list = []
    lat = {k: [] for k in range(6)}
    stop = time.perf_counter() + SECONDS
    t_start = time.perf_counter()
    threads = [threading.Thread(target=_client,
                                args=(port, stop, i, counts, errors, lat))
               for i in range(CLIENTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.perf_counter() - t_start
    total = sum(counts)
    h = srv._health()
    srv.stop()
    print(f"requests ok: {total} ({total / elapsed:.1f} req/s aggregate); "
          f"errors: {len(errors)}")
    for k in range(6):
        ls = sorted(lat[k])
        if ls:
            print(f"  {KINDS[k]:>13}: {len(ls):6d} req "
                  f"({len(ls) / elapsed:7.1f} req/s)  "
                  f"p50 {ls[len(ls) // 2] * 1e3:7.1f} ms  "
                  f"p99 {ls[int(len(ls) * 0.99)] * 1e3:7.1f} ms")
    for e in errors[:5]:
        print("  ", e)
    print("batching:", h.get("batching"), "| arnn:", h.get("arnn_batching"))
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
