"""Stage-level micro-benchmarks for the serving path on the live chip.

Times (a) the frozen encoder over B*16 measures with/without last-layer
output accumulation, and (b) the 24-step sampling decode in the current
formulation vs a reconstruction of the round-1 formulation (carry the
(B, E) embedding, full concat matmul in-loop), so regressions can be
pinned to a stage. Usage: python benchmarks/bench_stages.py [B]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timeit(fn, *args, iters=10, warmup=2):
    from inpaintnet_tpu.utils.timing import fetch

    for _ in range(warmup):
        fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / iters * 1e3


def decode_old(dec, params, z):
    """Round-1 formulation: carry prev embedding, concat, in-loop W_ih."""
    from inpaintnet_tpu.models.measure_vae import (
        NUM_BEATS_PER_MEASURE, NUM_TICKS_PER_MEASURE, TICKS_PER_BEAT,
    )
    from inpaintnet_tpu.ops import sample_argmax
    from inpaintnet_tpu.ops.gru import gru_stack_cell_apply
    from inpaintnet_tpu.ops.linear import embedding_apply, linear_apply

    rng = jax.random.PRNGKey(0)
    r_beat, r_scan = jax.random.split(rng)
    batch = z.shape[0]
    beat_out = dec._beat_outputs(params, z, train=False, rng=r_beat)
    tick_ctx = jax.nn.selu(linear_apply(params["beat_to_tick_input"], beat_out))
    h_inits = dec._tick_h0(
        params, beat_out.reshape(batch * NUM_BEATS_PER_MEASURE, -1)
    ).reshape(dec.num_layers, batch, NUM_BEATS_PER_MEASURE, -1)
    ts = jnp.arange(NUM_TICKS_PER_MEASURE)
    beat_idx = ts // TICKS_PER_BEAT
    reset = (ts % TICKS_PER_BEAT) == 0
    ctx_t = jnp.take(tick_ctx, beat_idx, axis=1)
    h_init_t = jnp.take(h_inits, beat_idx, axis=2)
    step_keys = jax.random.split(r_scan, NUM_TICKS_PER_MEASURE)
    x0 = jnp.broadcast_to(params["x_0"][None, :], (batch, dec.note_embedding_dim))
    h0 = jnp.zeros((dec.num_layers, batch, dec.rnn_hidden_size), params["x_0"].dtype)

    def step(carry, xs_t):
        h, prev_emb = carry
        ctx, h_init, do_reset, key, tick = xs_t
        h = jnp.where(do_reset, h_init, h)
        x = jnp.concatenate([prev_emb, ctx], axis=-1)
        h, out = gru_stack_cell_apply(params["tick_gru"], h, x)
        logits = jax.nn.relu(linear_apply(params["head"], out))
        sampled = sample_argmax(logits)
        new_emb = embedding_apply(params["embedding"], sampled)
        return (h, new_emb), sampled

    xs = (jnp.swapaxes(ctx_t, 0, 1), jnp.transpose(h_init_t, (2, 0, 1, 3)),
          reset, step_keys, ts)
    _, samples = lax.scan(step, (h0, x0), xs)
    return jnp.swapaxes(samples, 0, 1)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    import __graft_entry__ as g
    from inpaintnet_tpu.models.base import cast_pytree
    from inpaintnet_tpu.ops import gru_apply

    ds, vae, model = g._build_models()
    vae_params = cast_pytree(vae.params, jnp.bfloat16)
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, 60, (batch * 16, 24)), jnp.int32)
    enc = vae.encoder

    @jax.jit
    def encode_full(p, t):
        emb = jnp.take(p["encoder"]["embedding"]["table"], t, axis=0)
        _, h_n = gru_apply(p["encoder"]["gru"], emb, last_outputs=True)
        return h_n

    @jax.jit
    def encode_hn(p, t):
        return enc.apply(p["encoder"], t, train=False).loc

    print(f"B*16 = {batch * 16} measures, bf16 params")
    print(f"encoder last_outputs=True : {timeit(encode_full, vae_params, tokens):8.2f} ms")
    print(f"encoder h_n-only (current): {timeit(encode_hn, vae_params, tokens):8.2f} ms")

    dec = vae.decoder
    z = jnp.asarray(rng.randn(batch * 4, 256), jnp.bfloat16)

    @jax.jit
    def decode_now(p, z):
        return dec.decode_sampling(p["decoder"], z, train=False,
                                   rng=jax.random.PRNGKey(0))[1]

    @jax.jit
    def decode_r1(p, z):
        return decode_old(dec, p["decoder"], z)

    print(f"decode_sampling (current) : {timeit(decode_now, vae_params, z):8.2f} ms")
    print(f"decode_sampling (round-1) : {timeit(decode_r1, vae_params, z):8.2f} ms")


if __name__ == "__main__":
    main()
