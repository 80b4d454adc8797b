"""Numerical parity of our scan-based GRU/LSTM against torch's cuDNN-layout
RNNs (CPU). This is the foundation for porting reference checkpoints."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from inpaintnet_tpu.ops import (
    gru_init,
    gru_apply,
    lstm_stack_init,
    lstm_stack_apply,
)
from inpaintnet_tpu.ops.gru import gru_layer_apply


def _copy_torch_gru_to_params(tg, params, num_layers, num_dirs):
    """Copy torch nn.GRU weights into our pytree (transposed layout)."""
    for layer in range(num_layers):
        for d in range(num_dirs):
            sfx = f"_l{layer}" + ("_reverse" if d == 1 else "")
            p = params[layer][d]
            p["w_ih"] = jnp.asarray(getattr(tg, f"weight_ih{sfx}").detach().numpy().T)
            p["w_hh"] = jnp.asarray(getattr(tg, f"weight_hh{sfx}").detach().numpy().T)
            p["b_ih"] = jnp.asarray(getattr(tg, f"bias_ih{sfx}").detach().numpy())
            p["b_hh"] = jnp.asarray(getattr(tg, f"bias_hh{sfx}").detach().numpy())
    return params


@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("num_layers", [1, 2])
def test_gru_matches_torch(bidirectional, num_layers):
    torch.manual_seed(0)
    B, T, IN, H = 3, 7, 5, 11
    tg = torch.nn.GRU(
        input_size=IN,
        hidden_size=H,
        num_layers=num_layers,
        bidirectional=bidirectional,
        batch_first=True,
    )
    num_dirs = 2 if bidirectional else 1
    params = gru_init(jax.random.PRNGKey(0), IN, H, num_layers, bidirectional)
    params = _copy_torch_gru_to_params(tg, params, num_layers, num_dirs)

    x = np.random.RandomState(1).randn(B, T, IN).astype(np.float32)
    with torch.no_grad():
        t_out, t_hn = tg(torch.from_numpy(x))
    j_out, j_hn = gru_apply(params, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_hn), t_hn.numpy(), atol=1e-5)


def test_gru_mask_equals_truncated_sequence():
    """Masked padded run == unpadded run (the static-shape trick used for
    ragged past/future contexts)."""
    key = jax.random.PRNGKey(42)
    B, T, IN, H, VALID = 2, 10, 4, 8, 6
    params = gru_init(key, IN, H, num_layers=2, bidirectional=True)
    x = jax.random.normal(jax.random.PRNGKey(7), (B, T, IN))
    mask = jnp.concatenate(
        [jnp.ones((B, VALID)), jnp.zeros((B, T - VALID))], axis=1
    )
    _, hn_masked = gru_apply(params, x, mask=mask)
    _, hn_trunc = gru_apply(params, x[:, :VALID, :])
    np.testing.assert_allclose(
        np.asarray(hn_masked), np.asarray(hn_trunc), atol=1e-5
    )


def test_gru_layer_reverse_matches_flip():
    key = jax.random.PRNGKey(3)
    B, T, IN, H = 2, 5, 3, 4
    params = gru_init(key, IN, H, 1, False)[0][0]
    x = jax.random.normal(jax.random.PRNGKey(8), (B, T, IN))
    h0 = jnp.zeros((B, H))
    out_rev, h_rev = gru_layer_apply(params, x, h0, reverse=True)
    out_flip, h_flip = gru_layer_apply(params, x[:, ::-1, :], h0)
    np.testing.assert_allclose(
        np.asarray(out_rev), np.asarray(out_flip)[:, ::-1, :], atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(h_rev), np.asarray(h_flip), atol=1e-6)


def test_lstm_stack_matches_torch():
    torch.manual_seed(0)
    B, T, IN, H = 2, 6, 5, 9
    layers = [torch.nn.LSTM(IN, H, batch_first=True), torch.nn.LSTM(H, H, batch_first=True)]
    params = lstm_stack_init(jax.random.PRNGKey(0), [(IN, H), (H, H)])
    for tl, p in zip(layers, params):
        p["w_ih"] = jnp.asarray(tl.weight_ih_l0.detach().numpy().T)
        p["w_hh"] = jnp.asarray(tl.weight_hh_l0.detach().numpy().T)
        p["b_ih"] = jnp.asarray(tl.bias_ih_l0.detach().numpy())
        p["b_hh"] = jnp.asarray(tl.bias_hh_l0.detach().numpy())

    x = np.random.RandomState(5).randn(B, T, IN).astype(np.float32)
    with torch.no_grad():
        out = torch.from_numpy(x)
        for tl in layers:
            out, (h, c) = tl(out)
    j_out, (j_hn, j_cn), _ = lstm_stack_apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), out.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_hn)[-1], h[0].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_cn)[-1], c[0].numpy(), atol=1e-5)


def test_kl_matches_torch():
    from inpaintnet_tpu.ops import DiagNormal, kl_diag_normal_vs_standard

    rs = np.random.RandomState(0)
    loc = rs.randn(4, 6).astype(np.float32)
    scale = np.exp(rs.randn(4, 6)).astype(np.float32)
    ours = kl_diag_normal_vs_standard(DiagNormal(jnp.asarray(loc), jnp.asarray(scale)))
    theirs = torch.distributions.kl.kl_divergence(
        torch.distributions.Normal(torch.from_numpy(loc), torch.from_numpy(scale)),
        torch.distributions.Normal(torch.zeros(4, 6), torch.ones(4, 6)),
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-5)


def test_bidir_fused_matches_directional():
    """The fused bidirectional scan equals two directional scans, with and
    without masks."""
    from inpaintnet_tpu.ops.gru import gru_layer_apply, gru_layer_bidir_fused

    key = jax.random.PRNGKey(11)
    B, T, IN, H = 3, 9, 5, 8
    params = gru_init(key, IN, H, 1, bidirectional=True)[0]
    x = jax.random.normal(jax.random.PRNGKey(12), (B, T, IN))
    h0 = jnp.zeros((2, B, H))
    for mask in (None, jnp.concatenate([jnp.ones((B, 5)), jnp.zeros((B, T - 5))], 1)):
        of, hf = gru_layer_apply(params[0], x, h0[0], mask=mask)
        ob, hb = gru_layer_apply(params[1], x, h0[1], reverse=True, mask=mask)
        out_fused, h_fused = gru_layer_bidir_fused(params[0], params[1], x, h0, mask=mask)
        np.testing.assert_allclose(
            np.asarray(out_fused), np.concatenate([of, ob], -1), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(h_fused[0]), np.asarray(hf), atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_fused[1]), np.asarray(hb), atol=1e-5)


# --------------------------------------------------------------------- #
# trainfast: minimal-residual custom-VJP GRU (ops/gru_trainfast.py)
# --------------------------------------------------------------------- #

@pytest.mark.parametrize("reverse", [False, True])
def test_trainfast_values_and_grads_match_scan(reverse):
    from inpaintnet_tpu.ops.gru import gru_cell_init
    from inpaintnet_tpu.ops.gru_trainfast import gru_layer_trainfast

    B, T, IN, H = 5, 7, 6, 8
    p = gru_cell_init(jax.random.PRNGKey(0), IN, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN))
    h0 = jax.random.normal(jax.random.PRNGKey(2), (B, H))
    wy = jax.random.normal(jax.random.PRNGKey(3), (B, T, H))
    wh = jax.random.normal(jax.random.PRNGKey(4), (B, H))

    def loss(fn, p, x, h0):
        ys, h_last = fn(p, x, h0, reverse=reverse)
        return jnp.sum(ys * wy) + jnp.sum(h_last * wh)

    ref = lambda p, x, h0, reverse: gru_layer_apply(  # noqa: E731
        p, x, h0, reverse=reverse
    )
    v_ref, g_ref = jax.value_and_grad(
        lambda *a: loss(ref, *a), argnums=(0, 1, 2)
    )(p, x, h0)
    v_tf, g_tf = jax.value_and_grad(
        lambda *a: loss(gru_layer_trainfast, *a), argnums=(0, 1, 2)
    )(p, x, h0)
    np.testing.assert_allclose(float(v_tf), float(v_ref), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_tf),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_trainfast_stack_matches_default_with_dropout_masks():
    """Full bidirectional 2-layer stack through gru_apply(impl=trainfast)
    with precomputed dropout masks == the default impl, values and grads."""
    from inpaintnet_tpu.ops.gru import gru_apply, gru_init

    B, T, IN, H = 4, 6, 5, 8
    params = gru_init(jax.random.PRNGKey(0), IN, H, 2, True)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN))
    keep = jax.random.bernoulli(jax.random.PRNGKey(2), 0.5, (B, T, 2 * H))

    def loss(impl, params, x):
        out, h_n = gru_apply(
            params, x, dropout=0.5, train=True, dropout_masks=[keep],
            impl=impl,
        )
        return jnp.sum(out ** 2) + jnp.sum(h_n ** 2)

    v_ref, g_ref = jax.value_and_grad(
        lambda *a: loss(None, *a), argnums=(0, 1)
    )(params, x)
    v_tf, g_tf = jax.value_and_grad(
        lambda *a: loss("trainfast", *a), argnums=(0, 1)
    )(params, x)
    np.testing.assert_allclose(float(v_tf), float(v_ref), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_tf),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_trainfast_vmap_grad():
    """vmapped (decoder-style per-beat) use under grad stays correct."""
    from inpaintnet_tpu.ops.gru import gru_cell_init
    from inpaintnet_tpu.ops.gru_trainfast import gru_layer_trainfast

    G, B, T, IN, H = 3, 4, 5, 6, 8
    p = gru_cell_init(jax.random.PRNGKey(0), IN, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (G, B, T, IN))
    h0 = jax.random.normal(jax.random.PRNGKey(2), (G, B, H))

    def one(fn, p, x, h0):
        ys, h_last = fn(p, x, h0)
        return jnp.sum(ys ** 2) + jnp.sum(h_last ** 2)

    def loss(fn, p):
        return jnp.sum(jax.vmap(lambda x, h: one(fn, p, x, h))(x, h0))

    ref = lambda p, x, h0: gru_layer_apply(p, x, h0)  # noqa: E731
    g_ref = jax.grad(lambda p: loss(ref, p))(p)
    g_tf = jax.grad(lambda p: loss(gru_layer_trainfast, p))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g_tf),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("reverse", [False, True])
def test_trainfast_pallas_bwd_matches_scan_bwd(reverse, monkeypatch):
    """INPAINTNET_TRAINFAST_BWD=pallas: the sequential-backward kernel
    (interpret mode) reproduces the scan backward's gradients."""
    from inpaintnet_tpu.ops.gru import gru_cell_init
    from inpaintnet_tpu.ops.gru_trainfast import gru_layer_trainfast

    B, T, IN, H = 5, 7, 6, 8
    p = gru_cell_init(jax.random.PRNGKey(0), IN, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN))
    h0 = jax.random.normal(jax.random.PRNGKey(2), (B, H))
    wy = jax.random.normal(jax.random.PRNGKey(3), (B, T, H))
    wh = jax.random.normal(jax.random.PRNGKey(4), (B, H))

    def loss(p, x, h0):
        ys, h_last = gru_layer_trainfast(p, x, h0, reverse=reverse)
        return jnp.sum(ys * wy) + jnp.sum(h_last * wh)

    g_scan = jax.grad(loss, argnums=(0, 1, 2))(p, x, h0)
    monkeypatch.setenv("INPAINTNET_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("INPAINTNET_TRAINFAST_BWD", "pallas")
    g_pal = jax.grad(loss, argnums=(0, 1, 2))(p, x, h0)
    for a, b in zip(jax.tree_util.tree_leaves(g_pal),
                    jax.tree_util.tree_leaves(g_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_trainfast_pallas_bwd_vmap_grad(monkeypatch):
    """The decoder-style vmapped use must still differentiate with the
    kernel backward selected (pallas_call batching rule)."""
    from inpaintnet_tpu.ops.gru import gru_cell_init
    from inpaintnet_tpu.ops.gru_trainfast import gru_layer_trainfast

    G, B, T, IN, H = 3, 4, 5, 6, 8
    p = gru_cell_init(jax.random.PRNGKey(0), IN, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (G, B, T, IN))
    h0 = jax.random.normal(jax.random.PRNGKey(2), (G, B, H))

    def loss(p):
        def one(x, h):
            ys, h_last = gru_layer_trainfast(p, x, h)
            return jnp.sum(ys ** 2) + jnp.sum(h_last ** 2)

        return jnp.sum(jax.vmap(one)(x, h0))

    g_scan = jax.grad(loss)(p)
    monkeypatch.setenv("INPAINTNET_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("INPAINTNET_TRAINFAST_BWD", "pallas")
    g_pal = jax.grad(loss)(p)
    for a, b in zip(jax.tree_util.tree_leaves(g_pal),
                    jax.tree_util.tree_leaves(g_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("reverse", [False, True])
def test_trainfast_pallas_fwd_matches_scan(reverse, monkeypatch):
    """INPAINTNET_TRAINFAST_FWD=pallas: the gate-emitting forward kernel
    (interpret mode) reproduces the scan — primal values AND grads (the
    stored gates feed the backward)."""
    from inpaintnet_tpu.ops.gru import gru_cell_init
    from inpaintnet_tpu.ops.gru_trainfast import gru_layer_trainfast

    B, T, IN, H = 5, 7, 6, 8
    p = gru_cell_init(jax.random.PRNGKey(0), IN, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN))
    h0 = jax.random.normal(jax.random.PRNGKey(2), (B, H))
    wy = jax.random.normal(jax.random.PRNGKey(3), (B, T, H))
    wh = jax.random.normal(jax.random.PRNGKey(4), (B, H))

    def loss(p, x, h0):
        ys, h_last = gru_layer_trainfast(p, x, h0, reverse=reverse)
        return jnp.sum(ys * wy) + jnp.sum(h_last * wh)

    v_scan, g_scan = jax.value_and_grad(loss, argnums=(0, 1, 2))(p, x, h0)
    monkeypatch.setenv("INPAINTNET_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("INPAINTNET_TRAINFAST_FWD", "pallas")
    monkeypatch.setenv("INPAINTNET_TRAINFAST_BWD", "pallas")
    v_pal, g_pal = jax.value_and_grad(loss, argnums=(0, 1, 2))(p, x, h0)
    np.testing.assert_allclose(float(v_pal), float(v_scan), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_pal),
                    jax.tree_util.tree_leaves(g_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_trainfast_pallas_scope_forces_both_kernels(monkeypatch):
    """gru_impl_scope("trainfast_pallas") routes BOTH kernels without the
    INPAINTNET_TRAINFAST_* env knobs, covers the custom-VJP backward
    tracing (the scope wraps value_and_grad), and restores state."""
    from inpaintnet_tpu.ops import gru_trainfast
    from inpaintnet_tpu.ops.gru import gru_apply, gru_impl_scope, gru_init

    monkeypatch.setenv("INPAINTNET_PALLAS_INTERPRET", "1")
    monkeypatch.delenv("INPAINTNET_TRAINFAST_FWD", raising=False)
    monkeypatch.delenv("INPAINTNET_TRAINFAST_BWD", raising=False)

    B, T, IN, H = 4, 6, 5, 8
    params = gru_init(jax.random.PRNGKey(0), IN, H, 2, True)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN))

    def loss(params, x):
        out, h_n = gru_apply(params, x, train=True, dropout=0.0)
        return jnp.sum(out ** 2) + jnp.sum(h_n ** 2)

    v_ref, g_ref = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
    seen = {}
    orig = gru_trainfast._kernels_on

    def spy(which):
        got = orig(which)
        seen[which] = got
        return got

    monkeypatch.setattr(gru_trainfast, "_kernels_on", spy)
    with gru_impl_scope("trainfast_pallas"):
        v_k, g_k = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
    assert seen == {"FWD": True, "BWD": True}
    assert gru_trainfast.FORCE_KERNELS is False  # restored
    np.testing.assert_allclose(float(v_k), float(v_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_k),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
