"""Training step-time / MFU quantification (round-2 verdict #6).

Measures, on the live chip, at flagship model size:
- MeasureVAE train step (batch 256 windows = 4096 measure rows), bf16+f32
- LatentRNN train step (reference batch 32, plus 256)
- the frozen-VAE encode inside LatentRNN training: fused kernel vs XLA
  scan at the train-step row count — the measured basis for whether
  kerneling the in-training frozen encode (which takes no gradients) is
  worth carrying dropout masks into the kernel

MFU denominator: analytic model FLOPs (3x forward for the train step;
remat recompute excluded, so the true utilization is slightly higher).

Usage: python benchmarks/bench_training.py [vae] [latent] [enc]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

H, Z, E, V, T = 512, 256, 10, 60, 24
PEAK_BF16 = 197e12  # v5e chip
PEAK_F32 = 49e12


def vae_fwd_flops_per_row() -> float:
    """Matmul FLOPs of one measure row through the VAE forward."""
    enc_l0 = 2 * T * 2 * (64 * 3 * H + H * 3 * H)  # one-hot + recurrent, 2 dirs
    enc_l1 = 2 * T * 2 * (2 * H * 3 * H + H * 3 * H)
    heads = 2 * 2 * (4 * H * 2 * H + 2 * H * Z)
    dec_tick = 2 * T * ((E + H) * 3 * H + H * 3 * H + (H + H) * 3 * H + H * 3 * H)
    dec_head = 2 * T * H * V
    dec_misc = 2 * (Z * 2 * H + 4 * (H * 3 * H) * 2)
    return enc_l0 + enc_l1 + heads + dec_tick + dec_head + dec_misc


def timeit(fn, *args, iters=5, reps=5):
    """Best-of-reps ms/call; syncs on the FIRST output leaf only (the
    in-order device stream makes one leaf sufficient, and fetching a whole
    output tree would pay one tunnel RTT per leaf inside the window)."""
    from inpaintnet_tpu.utils.timing import device_timeit

    first_leaf = lambda *a: jax.tree_util.tree_leaves(fn(*a))[0]  # noqa: E731
    return device_timeit(first_leaf, *args, iters=iters, warmup=1,
                         reps=reps) * 1e3


def timeit_train_step(train_step, params, opt, bd, key, extra,
                      iters=5, reps=5):
    """Time the REAL jitted train step by threading the donated
    (params, opt) through successive calls — wrapping it to return only
    the loss would let XLA dead-code the entire backward + update."""
    from inpaintnet_tpu.utils.timing import fetch

    params, opt, loss, _ = train_step(params, opt, bd, key, extra)
    fetch(loss)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt, loss, _ = train_step(params, opt, bd, key, extra)
        fetch(loss)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


class _DS:
    """Minimal dataset stub carrying just the attributes model
    construction reads (also imported by bench_shardmap_train.py)."""

    note2index_dicts = [{f"t{i}": i for i in range(V)}]
    n_bars = 16
    subdivision = 6
    num_beats_per_bar = 4

    def __repr__(self):
        return "BenchTrainDS"


def main():
    from inpaintnet_tpu.models.presets import build_flagship
    from inpaintnet_tpu.train import LatentRNNTrainer, VAETrainer
    from inpaintnet_tpu.train.latent_rnn_trainer import pack_padded, split_score

    sections = set(sys.argv[1:]) or {"vae", "latent", "enc"}
    ds = _DS()
    _, vae, model = build_flagship(vocab_size=V, dataset=ds)
    # keep the master params on the HOST: replicate() of an already-placed
    # array can be a no-op device_put, and the train step DONATES its
    # params — which would delete the master copy between configurations
    vae.params = jax.tree_util.tree_map(np.asarray, vae.params)
    model.params = jax.tree_util.tree_map(np.asarray, model.params)
    rs = np.random.RandomState(0)

    fwd = vae_fwd_flops_per_row()
    if "vae" in sections:
        print("=== MeasureVAE train step (batch 256 windows = 4096 rows) ===")
    for dtype in ("bfloat16", None) if "vae" in sections else ():
        tr = VAETrainer(ds, vae, lr=1e-4, compute_dtype=dtype)
        tr._build_steps()
        rows = 256 * 16
        batch = rs.randint(0, V, (rows, T)).astype(np.int32)
        from inpaintnet_tpu.parallel.mesh import replicate, shard_batch

        params = replicate(tr.mesh, vae.params)
        opt = tr.optimizer.init(vae.params)
        bd = shard_batch(tr.mesh, batch)
        key = jax.random.PRNGKey(0)
        ms = timeit_train_step(tr._train_step, params, opt, bd, key, None)
        tf = 3 * fwd * rows / (ms * 1e-3)
        peak = PEAK_BF16 if dtype else PEAK_F32
        name = dtype or "float32"
        print(f"{name:9s} {ms:7.1f} ms/step  "
              f"{rows / ms * 1e3:9,.0f} measures/s  "
              f"{tf / 1e12:5.1f} TFLOP/s  MFU~{tf / peak * 100:4.1f}%")

    if "vaek" in sections:
        # Round-3 verdict #2: the fused encoder kernel routed into the
        # TRAINING forward (kernel primal + XLA-linearized backward,
        # kernel_with_xla_grad) at the flagship shape — batch 256 windows
        # = 4096 measure rows, at/above the measured serving crossover.
        # A/B interleaved per PERFORMANCE.md landmine #6.
        print("=== VAE train step: encoder train-kernel A/B "
              "(bf16, batch 256 = 4096 rows) ===")
        from inpaintnet_tpu.parallel.mesh import replicate, shard_batch
        from inpaintnet_tpu.utils.timing import fetch

        from inpaintnet_tpu.ops.gru import set_gru_impl

        rows = 256 * 16
        batch = rs.randint(0, V, (rows, T)).astype(np.int32)
        setups = [
            ("default", {}, "xla"),
            ("enc-kernel", {"INPAINTNET_TRAIN_ENCODER_IMPL": "pallas"},
             "xla"),
            ("trainfast", {}, "trainfast"),
            ("tf+enc-kernel",
             {"INPAINTNET_TRAIN_ENCODER_IMPL": "pallas"}, "trainfast"),
            ("unroll4", {"INPAINTNET_GRU_UNROLL": "4"}, "xla"),
            ("unroll8", {"INPAINTNET_GRU_UNROLL": "8"}, "xla"),
            ("tf-unroll4", {"INPAINTNET_TRAINFAST_UNROLL": "4"},
             "trainfast"),
            ("tf-bwdkernel", {"INPAINTNET_TRAINFAST_BWD": "pallas"},
             "trainfast"),
            ("tf-fullkernel", {"INPAINTNET_TRAINFAST_FWD": "pallas",
                               "INPAINTNET_TRAINFAST_BWD": "pallas"},
             "trainfast"),
        ]
        configs = []
        for name, env, gru_impl in setups:
            for k, v in env.items():
                os.environ[k] = v
            set_gru_impl(gru_impl)
            tr = VAETrainer(ds, vae, lr=1e-4, compute_dtype="bfloat16")
            tr._build_steps()
            state = [replicate(tr.mesh, vae.params),
                     tr.optimizer.init(vae.params)]
            bd = shard_batch(tr.mesh, batch)
            key = jax.random.PRNGKey(0)

            def step(state, tr=tr, bd=bd, key=key):
                p, o, loss, _ = tr._train_step(state[0], state[1], bd, key,
                                               None)
                return [p, o], loss

            try:
                loss = None
                for _ in range(30):  # trace under the env value + ramp-out
                    state, loss = step(state)
                fetch(loss)
                configs.append([name, step, state])
            except Exception as e:  # noqa: BLE001 — report, keep benching
                print(f"{name:14s} FAILED to compile/run: "
                      f"{type(e).__name__}: {str(e)[:200]}")
            finally:
                for k in env:
                    os.environ.pop(k, None)
                set_gru_impl("xla")
        best = {name: float("inf") for name, _, _ in configs}
        iters = 10
        for _ in range(6):
            for cfg in configs:
                name, step, state = cfg
                t0 = time.perf_counter()
                for _ in range(iters):
                    state, loss = step(state)
                fetch(loss)
                best[name] = min(
                    best[name], (time.perf_counter() - t0) / iters * 1e3
                )
                cfg[2] = state
        for name in best:
            print(f"{name:14s} {best[name]:7.1f} ms/step  "
                  f"{rows / best[name] * 1e3:9,.0f} measures/s  "
                  f"({best['default'] / best[name]:.3f}x)")

    if "decomp" in sections:
        # Where the bf16 train step's time goes: fwd vs fwd+bwd per
        # component at the flagship 4096-row shape (the verdict-requested
        # decomposition behind the adopt/reject call).
        print("=== VAE train-step decomposition (bf16, 4096 rows) ===")
        from inpaintnet_tpu.train.vae_trainer import VAETrainer as _VT

        rows = 256 * 16
        toks = jnp.asarray(rs.randint(0, V, (rows, T)), jnp.int32)
        p16 = jax.device_put(jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.bfloat16)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else x,
            vae.params,
        ))
        key = jax.random.PRNGKey(0)

        def enc_fwd(p, t):
            d = vae.encoder.apply(p["encoder"], t, train=True, rng=key)
            return jnp.sum(d.loc.astype(jnp.float32) ** 2) + jnp.sum(
                d.scale.astype(jnp.float32)
            )

        def dec_fwd(p, t):
            z = jnp.zeros((t.shape[0], vae.latent_space_dim), jnp.bfloat16)
            w, _ = vae.decoder.apply(p["decoder"], z, t, train=True, rng=key)
            return jnp.sum(w.astype(jnp.float32) ** 2)

        def full_loss(p, t):
            tr = _VT(ds, vae, lr=1e-4, compute_dtype="bfloat16")
            loss, _ = tr.loss_and_metrics(p, t, key, True)
            return loss

        from inpaintnet_tpu.ops.gru import gru_impl_scope

        # "trainfast_pallas" == the ADOPTED config (round-4: trainfast
        # custom-VJP + Pallas fwd-stream AND sequential-backward kernels)
        for impl in ("xla", "trainfast", "trainfast_pallas"):
            print(f"-- recurrence impl: {impl} --")
            for name, fn in (("encoder", enc_fwd), ("decoder", dec_fwd),
                             ("full loss", full_loss)):

                def scoped(p, t, fn=fn, impl=impl):
                    with gru_impl_scope(impl):
                        return fn(p, t)

                t_f = timeit(jax.jit(scoped), p16, toks, iters=10)
                t_fb = timeit(
                    jax.jit(lambda p, t, fn=scoped: jax.value_and_grad(fn)(
                        p, t
                    )),
                    p16, toks, iters=10,
                )
                print(f"{name:10s} fwd {t_f:6.2f} ms   fwd+bwd {t_fb:6.2f} ms")

        # non-recurrence components of the step (round-5 verdict #4):
        # masked f32 CE at vocab width, the adam update + apply at
        # parameter count, and the dropout-mask generation the training
        # forward pays per step
        print("-- non-recurrence components --")
        from inpaintnet_tpu.train.metrics import mean_crossentropy_loss

        logits = jnp.zeros((rows, T, V), jnp.bfloat16)

        def ce(lg, t):
            return mean_crossentropy_loss(lg, t)

        print(f"{'CE loss':10s} fwd "
              f"{timeit(jax.jit(ce), logits, toks, iters=10):6.2f} ms   "
              "fwd+bwd "
              f"{timeit(jax.jit(lambda lg, t: jax.value_and_grad(lambda l: ce(l.astype(jnp.float32), t))(lg)[0]), logits, toks, iters=10):6.2f} ms")

        import optax

        opt = optax.adam(1e-4)
        opt_state = opt.init(p16)

        def adam_step(p, s):
            g = jax.tree_util.tree_map(jnp.ones_like, p)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u)

        print(f"{'adam':10s} upd "
              f"{timeit(jax.jit(adam_step), p16, opt_state, iters=10):6.2f} ms"
              "   (update+apply on ones-grads, full param tree)")

        def dropmasks(k):
            ks = jax.random.split(k, 6)
            # encoder inter-layer (B,T,2H) + decoder tick/beat layers (B,T,H)x4
            ms = [jax.random.bernoulli(ks[0], 0.5, (rows, T, 2 * H))]
            ms += [jax.random.bernoulli(ks[i], 0.5, (rows, T, H))
                   for i in range(1, 5)]
            return sum(m.sum() for m in ms)

        print(f"{'dropout':10s} gen "
              f"{timeit(jax.jit(dropmasks), key, iters=10):6.2f} ms"
              "   (bernoulli masks at step shapes)")

    if "latent" in sections:
        print("=== LatentRNN train step (frozen VAE fwd + gen-path bwd) ===")
    for batch_w in (32, 256) if "latent" in sections else ():
        tr = LatentRNNTrainer(ds, model, lr=1e-4, compute_dtype="bfloat16")
        tr._build_steps()
        score = rs.randint(0, V, (batch_w, 1, 16 * T)).astype(np.int32)
        past, future, target = split_score(score, 4, 8, 4, T)
        packed = pack_padded(past, future, target, 16, 6)
        from inpaintnet_tpu.parallel.mesh import replicate, shard_batch

        params = replicate(tr.mesh, model.params)
        opt = tr.optimizer.init(model.params)
        extra = replicate(tr.mesh, vae.params)
        bd = shard_batch(tr.mesh, packed)
        key = jax.random.PRNGKey(0)
        ms = timeit_train_step(tr._train_step, params, opt, bd, key, extra)
        print(f"batch {batch_w:4d} {ms:7.1f} ms/step  "
              f"{batch_w * 4 / ms * 1e3:9,.0f} target measures/s")

    if "enc" not in sections:
        return
    print("=== frozen encode at LatentRNN train-step row counts ===")
    # LatentRNN training encodes (past+future+target valid rows); at batch
    # 32 that is ~<=512 rows. Kernel vs scan, eval-mode (the kernel carries
    # no dropout; if it cannot win HERE it cannot win with masks added).
    from inpaintnet_tpu.ops.encoder_pallas import encoder_hn_pallas
    from inpaintnet_tpu.ops.gru import gru_apply
    from inpaintnet_tpu.ops.linear import embedding_apply

    # device-resident params: the masters are host numpy (donation
    # protection above) and re-uploading ~MBs per timed call through the
    # tunnel would swamp the measurement
    enc_p = jax.device_put(
        jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.bfloat16), vae.params["encoder"]
        )
    )
    for rows in (384, 512, 4096):
        toks = jnp.asarray(rs.randint(0, V, (rows, T)), jnp.int32)

        def scan_fn(p, t):
            emb = embedding_apply(p["embedding"], t)
            return gru_apply(p["gru"], emb, last_outputs=False)[1]

        t_scan = timeit(jax.jit(scan_fn), enc_p, toks)
        t_ker = timeit(
            jax.jit(lambda p, t: encoder_hn_pallas(
                p["gru"], p["embedding"]["table"], t)),
            enc_p, toks,
        )
        print(f"rows {rows:5d}: XLA scan {t_scan:6.2f} ms   "
              f"Pallas {t_ker:6.2f} ms   ({t_scan / t_ker:4.2f}x)")


if __name__ == "__main__":
    main()
