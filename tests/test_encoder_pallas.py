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
