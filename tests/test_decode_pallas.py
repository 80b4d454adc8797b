"""Parity tests for the fused Pallas sampling-decode kernel (interpret
mode on the CPU backend; real-chip numbers in docs/PERFORMANCE.md)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inpaintnet_tpu.models.measure_vae import (
    NUM_BEATS_PER_MEASURE,
    HierarchicalDecoder,
)
from inpaintnet_tpu.ops.decode_pallas import decode_sampling_pallas
from inpaintnet_tpu.ops.linear import linear_apply


def _setup(vocab=30, batch=12, hidden=32, z_dim=16):
    dec = HierarchicalDecoder(
        note_embedding_dim=10, num_notes=vocab, z_dim=z_dim,
        num_layers=2, rnn_hidden_size=hidden, dropout=0.5,
    )
    params = dec.init_params(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (batch, z_dim))
    beat_out = dec._beat_outputs(params, z, train=False, rng=jax.random.PRNGKey(9))
    tick_ctx = jax.nn.selu(linear_apply(params["beat_to_tick_input"], beat_out))
    h_inits = dec._tick_h0(
        params, beat_out.reshape(batch * NUM_BEATS_PER_MEASURE, -1)
    ).reshape(2, batch, NUM_BEATS_PER_MEASURE, -1)
    return dec, params, z, tick_ctx, h_inits


@pytest.mark.parametrize("batch", [12, 13])  # 13 exercises batch padding
def test_decode_pallas_matches_scan(batch):
    dec, params, z, tick_ctx, h_inits = _setup(batch=batch)
    lw, ls = dec.decode_sampling(params, z, train=False, rng=jax.random.PRNGKey(2))
    pw, ps = decode_sampling_pallas(params, tick_ctx, h_inits, tile_b=8,
                                    interpret=True)
    assert pw.shape == lw.shape and ps.shape == ls.shape
    np.testing.assert_array_equal(np.asarray(ps), np.asarray(ls))
    np.testing.assert_allclose(np.asarray(pw), np.asarray(lw), atol=1e-5)


def test_decode_gate_cpu():
    """CPU backend keeps the XLA scan path."""
    dec, params, *_ = _setup()
    assert not dec._use_pallas_decode(params)


def test_decode_kernel_grad_falls_back_to_scan(monkeypatch):
    """jax.grad through the kernel-routed decode must work (pallas_call has
    no AD rule; the custom_vjp wrapper differentiates the XLA scan) and
    match the pure-scan gradient."""
    monkeypatch.setenv("INPAINTNET_PALLAS_INTERPRET", "1")
    dec, params, z, *_ = _setup()
    monkeypatch.setattr(type(dec), "_use_pallas_decode", lambda self, p: True)

    def loss(params, use_kernel):
        if not use_kernel:
            monkeypatch.setattr(type(dec), "_use_pallas_decode",
                                lambda self, p: False)
        w, _ = dec.decode_sampling(params, z, train=False,
                                   rng=jax.random.PRNGKey(2))
        return jnp.sum(w ** 2)

    g_kernel = jax.grad(lambda p: loss(p, True))(params)
    monkeypatch.setattr(type(dec), "_use_pallas_decode", lambda self, p: False)
    g_scan = jax.grad(lambda p: loss(p, False))(params)
    flat_k = jax.tree_util.tree_leaves(g_kernel)
    flat_s = jax.tree_util.tree_leaves(g_scan)
    for a, b in zip(flat_k, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_decode_int8_tracks_f32(monkeypatch):
    """int8 decode kernel (interpret mode): high token agreement with the
    f32 scan; disagreements are argmax near-ties."""
    from inpaintnet_tpu.ops.decode_pallas import decode_sampling_pallas_int8

    dec, params, z, tick_ctx, h_inits = _setup(batch=16)
    lw, ls = dec.decode_sampling(
        params, z, train=False, rng=jax.random.PRNGKey(2)
    )
    pw, ps = decode_sampling_pallas_int8(
        params, tick_ctx, h_inits, tile_b=8, interpret=True
    )
    lw, ls, pw, ps = map(np.asarray, (lw, ls, pw, ps))
    agree = (ps == ls).mean()
    assert agree > 0.9, agree
    rel = np.linalg.norm(pw - lw) / np.linalg.norm(lw)
    assert rel < 0.1, rel


def test_decode_int8_unbounded_h_inits(monkeypatch):
    """The data-dependent hidden bound: init hiddens far outside (-1, 1)
    (selu outputs can be) must not blow up the quantized decode."""
    from inpaintnet_tpu.ops.decode_pallas import decode_sampling_pallas_int8

    dec, params, z, tick_ctx, h_inits = _setup(batch=12)
    h_inits = h_inits * 6.0  # force |h_init| >> 1

    lw, ls = jax.jit(
        lambda p, c, h: dec._decode_scan(
            p, c, h, train=False, rng=jax.random.PRNGKey(0), score_tensor=None
        )
    )(params, tick_ctx, h_inits)
    pw, ps = decode_sampling_pallas_int8(
        params, tick_ctx, h_inits, tile_b=8, interpret=True
    )
    lw, ls, pw, ps = map(np.asarray, (lw, ls, pw, ps))
    assert np.isfinite(pw).all()
    agree = (ps == ls).mean()
    assert agree > 0.85, agree


def test_decode_int8_per_row_bound_invariance():
    """Round-5 structural invariance: the int8 quant bound is PER ROW, so
    co-batching a row with an extreme |h_init| (adversarial selu output)
    leaves every other row's logits and tokens bit-identical."""
    from inpaintnet_tpu.ops.decode_pallas import decode_sampling_pallas_int8

    dec, params, z, tick_ctx, h_inits = _setup(batch=8)
    pw, ps = decode_sampling_pallas_int8(
        params, tick_ctx, h_inits, tile_b=8, interpret=True
    )
    # append one adversarial row with init hiddens 50x out of range
    ctx2 = jnp.concatenate([tick_ctx, tick_ctx[:1]], axis=0)
    h2 = jnp.concatenate([h_inits, h_inits[:, :1] * 50.0], axis=1)
    pw2, ps2 = decode_sampling_pallas_int8(
        params, ctx2, h2, tile_b=8, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ps2)[:8], np.asarray(ps))
    np.testing.assert_array_equal(np.asarray(pw2)[:8], np.asarray(pw))
    assert np.isfinite(np.asarray(pw2)).all()


@pytest.mark.parametrize("kw", [{"halves": 2}, {"pipelined": True}])
def test_decode_variant_kernels_match_scan(kw):
    """The experiment knobs (interleaved halves, software-pipelined hw
    precompute) are exact too — kept as documented negative results."""
    dec, params, z, tick_ctx, h_inits = _setup(batch=16)
    lw, ls = dec.decode_sampling(params, z, train=False,
                                 rng=jax.random.PRNGKey(2))
    pw, ps = decode_sampling_pallas(params, tick_ctx, h_inits, tile_b=16,
                                    interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(ps), np.asarray(ls))
    np.testing.assert_allclose(np.asarray(pw), np.asarray(lw), atol=1e-5)
