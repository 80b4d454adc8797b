"""Parity tests for the fused Pallas encoder kernels (interpret mode on the
CPU backend; the real-chip numbers live in docs/PERFORMANCE.md)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inpaintnet_tpu.ops.encoder_pallas import encoder_hn_pallas
from inpaintnet_tpu.ops.gru import gru_apply, gru_init


@pytest.mark.parametrize("batch,hidden,vocab", [(20, 32, 30), (8, 16, 61)])
def test_encoder_hn_matches_xla_scan(batch, hidden, vocab):
    E, T = 10, 24
    params = gru_init(jax.random.PRNGKey(0), E, hidden, 2, True)
    table = jax.random.normal(jax.random.PRNGKey(1), (vocab, E))
    tokens = jax.random.randint(jax.random.PRNGKey(2), (batch, T), 0, vocab)

    emb = jnp.take(table, tokens, axis=0)
    _, h_ref = gru_apply(params, emb)
    h_pal = encoder_hn_pallas(params, table, tokens, tile_b=8, interpret=True)
    assert h_pal.shape == h_ref.shape  # (4, B, H) torch layout
    np.testing.assert_allclose(
        np.asarray(h_pal), np.asarray(h_ref), atol=1e-5
    )


def test_encoder_hn_batch_padding():
    """Batch not a multiple of tile_b: padded rows must not leak."""
    E, H, V, T = 10, 16, 30, 24
    params = gru_init(jax.random.PRNGKey(0), E, H, 2, True)
    table = jax.random.normal(jax.random.PRNGKey(1), (V, E))
    tokens = jax.random.randint(jax.random.PRNGKey(2), (13, T), 0, V)
    emb = jnp.take(table, tokens, axis=0)
    _, h_ref = gru_apply(params, emb)
    h_pal = encoder_hn_pallas(params, table, tokens, tile_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref), atol=1e-5)


def test_encoder_model_gate_cpu():
    """On the CPU backend the Encoder must keep using the XLA path (the
    kernel gate checks the platform), so model-level behavior is unchanged."""
    from inpaintnet_tpu.models.measure_vae import Encoder

    enc = Encoder(
        note_embedding_dim=8, rnn_hidden_size=16, num_layers=2,
        num_notes=30, dropout=0.5, bidirectional=True, z_dim=12,
    )
    params = enc.init_params(jax.random.PRNGKey(0))
    assert not enc._use_pallas(params)  # cpu backend
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 24), 0, 30)
    dist = enc.apply(params, tokens, train=False)
    assert dist.loc.shape == (4, 12)


def test_encoder_kernel_grad_falls_back_to_scan(monkeypatch):
    """jax.grad through the kernel-routed encoder matches the scan grad."""
    from inpaintnet_tpu.models.measure_vae import Encoder

    monkeypatch.setenv("INPAINTNET_PALLAS_INTERPRET", "1")
    enc = Encoder(
        note_embedding_dim=8, rnn_hidden_size=16, num_layers=2,
        num_notes=30, dropout=0.0, bidirectional=True, z_dim=12,
    )
    params = enc.init_params(jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 24), 0, 30)

    def loss(params):
        dist = enc.apply(params, tokens, train=False)
        return jnp.sum(dist.loc ** 2) + jnp.sum(dist.scale)

    monkeypatch.setattr(type(enc), "_use_pallas", lambda self, p: True)
    g_kernel = jax.grad(loss)(params)
    monkeypatch.setattr(type(enc), "_use_pallas", lambda self, p: False)
    g_scan = jax.grad(loss)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_kernel),
                    jax.tree_util.tree_leaves(g_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_encoder_train_kernel_dropout_parity():
    """Training route (round-3 verdict #2): the kernel with a precomputed
    inter-layer keep mask equals ``gru_apply`` consuming the SAME mask via
    ``dropout_masks`` — including a batch that needs tile padding."""
    E, H, V, T, B = 10, 16, 30, 24, 12
    params = gru_init(jax.random.PRNGKey(0), E, H, 2, True)
    table = jax.random.normal(jax.random.PRNGKey(1), (V, E))
    tokens = jax.random.randint(jax.random.PRNGKey(2), (B, T), 0, V)
    keep = jax.random.bernoulli(jax.random.PRNGKey(3), 0.5, (B, T, 2 * H))

    emb = jnp.take(table, tokens, axis=0)
    _, h_ref = gru_apply(params, emb, dropout=0.5, train=True,
                         dropout_masks=[keep], last_outputs=False)
    h_pal = encoder_hn_pallas(params, table, tokens, tile_b=8,
                              interpret=True, keep=keep, rate=0.5)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref),
                               atol=1e-5)


def test_encoder_train_route_values_and_grads_match_scan(monkeypatch):
    """``INPAINTNET_TRAIN_ENCODER_IMPL=pallas`` route at train=True: same
    rng -> same dropout mask -> values AND grads match the default scan
    route (the mask is drawn with gru_apply's exact split sequence)."""
    from inpaintnet_tpu.models.measure_vae import Encoder

    monkeypatch.setenv("INPAINTNET_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("INPAINTNET_TRAIN_ENCODER_IMPL", "pallas")
    enc = Encoder(
        note_embedding_dim=8, rnn_hidden_size=16, num_layers=2,
        num_notes=30, dropout=0.5, bidirectional=True, z_dim=12,
    )
    params = enc.init_params(jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (6, 24), 0, 30)
    rng = jax.random.PRNGKey(7)

    def loss(params):
        dist = enc.apply(params, tokens, train=True, rng=rng)
        return jnp.sum(dist.loc ** 2) + jnp.sum(dist.scale)

    monkeypatch.setattr(type(enc), "_use_pallas", lambda self, p: True)
    v_kernel, g_kernel = jax.value_and_grad(loss)(params)
    monkeypatch.setattr(type(enc), "_use_pallas", lambda self, p: False)
    v_scan, g_scan = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(v_kernel), float(v_scan), atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_kernel),
                    jax.tree_util.tree_leaves(g_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_latent_rnn_training_grad_with_kernel_gates_on(monkeypatch):
    """End-to-end: the LatentRNN training loss (which differentiates
    through the frozen-VAE decode at train=True) must produce finite grads
    with the kernel gates forced on — the exact TPU-bf16-training case."""
    import numpy as np

    from inpaintnet_tpu.models.latent_rnn import LatentRNN
    from inpaintnet_tpu.models.measure_vae import HierarchicalDecoder, MeasureVAE

    monkeypatch.setenv("INPAINTNET_PALLAS_INTERPRET", "1")
    monkeypatch.setattr(HierarchicalDecoder, "_use_pallas_decode",
                        lambda self, p: True)

    class _DS:
        note2index_dicts = [{f"t{i}": i for i in range(30)}]

        def __repr__(self):
            return "ds"

    vae = MeasureVAE(_DS(), note_embedding_dim=8, num_encoder_layers=2,
                     encoder_hidden_size=16, latent_space_dim=12,
                     num_decoder_layers=2, decoder_hidden_size=16)
    vae.init(jax.random.PRNGKey(0))
    m = LatentRNN(_DS(), vae, num_rnn_layers=2, rnn_hidden_size=16,
                  dropout=0.0, auto_reg=False, max_target=4)
    m.init(jax.random.PRNGKey(1))
    B = 2
    past = jax.random.randint(jax.random.PRNGKey(2), (B, 5, 24), 0, 30)
    future = jax.random.randint(jax.random.PRNGKey(3), (B, 6, 24), 0, 30)
    target = jax.random.randint(jax.random.PRNGKey(4), (B, 4, 24), 0, 30)

    def loss(params):
        w, _, _ = m.apply(
            params, vae.params, past, future, target,
            past_mask=jnp.ones((B, 5)), future_mask=jnp.ones((B, 6)),
            target_mask=jnp.ones((B, 4)), train=True,
            rng=jax.random.PRNGKey(5),
        )
        logp = jax.nn.log_softmax(w, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, target[..., None], axis=-1))

    g = jax.grad(loss)(m.params)
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_quantize_cols_int8_roundtrip():
    """Per-channel quantization error bounded by scale/2 elementwise."""
    from inpaintnet_tpu.ops.quantize import quantize_cols_int8

    w = jax.random.normal(jax.random.PRNGKey(3), (64, 96)) * 0.3
    q, s = quantize_cols_int8(w)
    assert q.dtype == jnp.int8 and s.shape == (1, 96)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(w))
    assert (err <= np.asarray(s) / 2 + 1e-7).all()
    # columns hit the full int8 range (scale derived from the column max)
    assert int(np.abs(np.asarray(q)).max()) == 127


def test_encoder_int8_close_to_f32(monkeypatch):
    """int8 kernel (interpret mode) tracks the f32 scan within ~2%
    relative error — the int8 serving mode's accuracy envelope."""
    from inpaintnet_tpu.ops.encoder_pallas import encoder_hn_pallas_int8

    E, T, H, V, B = 10, 24, 32, 30, 20
    params = gru_init(jax.random.PRNGKey(0), E, H, 2, True)
    table = jax.random.normal(jax.random.PRNGKey(1), (V, E))
    tokens = jax.random.randint(jax.random.PRNGKey(2), (B, T), 0, V)
    emb = jnp.take(table, tokens, axis=0)
    _, h_ref = gru_apply(params, emb)
    h_q = encoder_hn_pallas_int8(params, table, tokens, tile_b=8,
                                 interpret=True)
    h_ref, h_q = np.asarray(h_ref), np.asarray(h_q, np.float32)
    rel = np.linalg.norm(h_q - h_ref) / np.linalg.norm(h_ref)
    assert rel < 0.02, rel
    cos = (h_q * h_ref).sum() / (
        np.linalg.norm(h_q) * np.linalg.norm(h_ref)
    )
    assert cos > 0.999


def test_encoder_int8_model_route(monkeypatch):
    """INPAINTNET_SERVE_QUANT=int8 routes Encoder.apply through the int8
    kernel when the pallas gate is open (interpret mode on CPU)."""
    from inpaintnet_tpu.models.measure_vae import Encoder

    monkeypatch.setenv("INPAINTNET_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("INPAINTNET_SERVE_QUANT", "int8")
    enc = Encoder(
        note_embedding_dim=8, rnn_hidden_size=16, num_layers=2,
        num_notes=30, dropout=0.0, bidirectional=True, z_dim=12,
    )
    params = enc.init_params(jax.random.PRNGKey(0))
    monkeypatch.setattr(type(enc), "_use_pallas", lambda self, p: True)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (6, 24), 0, 30)
    d_q = enc.apply(params, tokens, train=False)
    monkeypatch.setenv("INPAINTNET_SERVE_QUANT", "none")
    monkeypatch.setattr(type(enc), "_use_pallas", lambda self, p: False)
    d_ref = enc.apply(params, tokens, train=False)
    # int8 differs from f32 but only slightly
    loc_q, loc_r = np.asarray(d_q.loc), np.asarray(d_ref.loc)
    assert not np.array_equal(loc_q, loc_r)  # the quantized route ran
    rel = np.linalg.norm(loc_q - loc_r) / np.linalg.norm(loc_r)
    assert rel < 0.05, rel


@pytest.mark.parametrize("k", [2, 3, 4, 6])
def test_encoder_hn_time_tiled_matches_xla_scan(k):
    """ticks_per_step > 1 (k sequential ticks per grid step) must be exact
    vs the scan — same recurrence, different grid carving."""
    E, H, V, T = 10, 16, 30, 24
    params = gru_init(jax.random.PRNGKey(3), E, H, 2, True)
    table = jax.random.normal(jax.random.PRNGKey(4), (V, E))
    tokens = jax.random.randint(jax.random.PRNGKey(5), (20, T), 0, V)

    emb = jnp.take(table, tokens, axis=0)
    _, h_ref = gru_apply(params, emb)
    h_pal = encoder_hn_pallas(params, table, tokens, tile_b=8,
                              ticks_per_step=k, interpret=True)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref),
                               atol=1e-5)


@pytest.mark.parametrize("k", [2, 4])
def test_encoder_int8_time_tiled_matches_untiled(k):
    """int8 kernel: time tiling k=1 vs k>1 — identical in-kernel math.
    (Not asserted bitwise: the PRE-kernel f32 weight-quantization graph can
    fuse differently across the two separately-jitted programs, ~1e-5
    noise in the quantization scales.)"""
    from inpaintnet_tpu.ops.encoder_pallas import encoder_hn_pallas_int8

    E, H, V, T = 10, 16, 30, 24
    params = gru_init(jax.random.PRNGKey(6), E, H, 2, True)
    table = jax.random.normal(jax.random.PRNGKey(7), (V, E))
    tokens = jax.random.randint(jax.random.PRNGKey(8), (16, T), 0, V)
    h1 = encoder_hn_pallas_int8(params, table, tokens, tile_b=8,
                                interpret=True)
    hk = encoder_hn_pallas_int8(params, table, tokens, tile_b=8,
                                ticks_per_step=k, interpret=True)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(hk), atol=1e-4)
