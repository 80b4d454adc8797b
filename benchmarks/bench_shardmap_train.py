"""Single-chip sanity for the shard_map training path (round-5 verdict
#3 "Done" clause): the explicit ``jax.shard_map`` wrapper that keeps the
Pallas trainfast kernels alive on multi-device meshes
(Trainer._use_shard_map_train) must not tax the step on ONE chip — where
the plain GSPMD-jitted step is the default. Times the REAL VAETrainer
train step (donated params/opt threaded through calls) at the flagship
shape (batch 256 windows = 4096 measure rows, bf16 + trainfast_pallas,
the TPU default config) in both formulations, A/B interleaved per
docs/PERFORMANCE.md landmine #6.

Usage: python benchmarks/bench_shardmap_train.py [rows_batch=256]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np


def main():
    import jax

    if os.environ.get("INPAINTNET_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    os.environ.setdefault("INPAINTNET_TRAIN_GRU_IMPL", "trainfast_pallas")

    from benchmarks.bench_training import _DS, T, V
    from inpaintnet_tpu.models.presets import build_flagship
    from inpaintnet_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from inpaintnet_tpu.train.vae_trainer import VAETrainer
    from inpaintnet_tpu.utils.timing import fetch

    windows = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rows = windows * 16
    ds = _DS()
    _, vae, _ = build_flagship(vocab_size=V, dataset=ds)
    vae.params = jax.tree_util.tree_map(np.asarray, vae.params)
    rs = np.random.RandomState(0)
    batch = rs.randint(0, V, (rows, T)).astype(np.int32)
    key = jax.random.PRNGKey(0)

    configs = []
    for name, force_shard_map in (("jit", False), ("shard_map", True)):
        tr = VAETrainer(ds, vae, lr=1e-4, compute_dtype="bfloat16",
                        mesh=make_mesh(num_devices=1))
        # pin the routing BOTH ways (the trainer's own predicate now
        # prefers shard_map on TPU even at one device — this bench is the
        # measurement behind that default, so it must isolate each path)
        tr._use_shard_map_train = lambda v=force_shard_map: v
        assert tr._use_shard_map_train() == force_shard_map
        tr._build_steps()
        state = [replicate(tr.mesh, vae.params), tr.optimizer.init(vae.params)]
        bd = shard_batch(tr.mesh, batch)

        def step(state, tr=tr, bd=bd):
            p, o, loss, _ = tr._train_step(state[0], state[1], bd, key, None)
            return [p, o], loss

        loss = None
        for _ in range(30):  # compile + executable ramp-out (landmine #6)
            state, loss = step(state)
        print(f"{name}: warm, loss={float(fetch(loss)):.4f}")
        configs.append([name, step, state])

    best = {name: float("inf") for name, _, _ in configs}
    iters = 10
    for _ in range(6):
        for cfg in configs:
            name, step, state = cfg
            t0 = time.perf_counter()
            for _ in range(iters):
                state, loss = step(state)
            fetch(loss)
            best[name] = min(best[name], (time.perf_counter() - t0) / iters * 1e3)
            cfg[2] = state
    for name in best:
        print(f"{name:10s} {best[name]:7.1f} ms/step  "
              f"{rows / best[name] * 1e3:9,.0f} measures/s  "
              f"({best['jit'] / best[name]:.3f}x vs jit)")


if __name__ == "__main__":
    main()
