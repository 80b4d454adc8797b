"""Parity tests for the fused Pallas ARNN decode kernel (interpret mode on
the CPU backend; real-chip numbers in docs/PERFORMANCE.md)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inpaintnet_tpu.models.anticipation_rnn import ConstraintModelGaussianReg
from inpaintnet_tpu.ops.arnn_pallas import arnn_sampled_decode_pallas


class _FakeMetadata:
    def __init__(self, num_values, name):
        self.num_values = num_values
        self.name = name


class _FakeDataset:
    def __init__(self, vocab_size=30):
        self.note2index_dicts = [
            {**{f"t{i}": i for i in range(vocab_size - 1)}, "START": vocab_size - 1}
        ]
        self.metadatas = [_FakeMetadata(4, "beatmarker"), _FakeMetadata(6, "tick")]
        self.num_voices = 1

    def __repr__(self):
        return "FakeDataset(test)"


V, T = 30, 48


def _setup(batch=3):
    m = ConstraintModelGaussianReg(
        _FakeDataset(V), note_embedding_dim=8, metadata_embedding_dim=6,
        num_lstm_constraints_units=16, num_lstm_generation_units=16,
        linear_hidden_size=12, num_layers=2, unary_constraint=True,
        dropout_input_prob=0.0, dropout_prob=0.0,
    )
    m.init(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    score = jnp.asarray(rs.randint(0, V, (batch, T)))
    md = jnp.asarray(
        np.stack([rs.randint(0, 4, (batch, T)), rs.randint(0, 6, (batch, T)),
                  np.zeros((batch, T), np.int64)], axis=-1)
    )
    loc = np.ones((batch, T), np.int64)
    loc[:, 18:30] = 0
    return m, score, md, jnp.asarray(loc)


@pytest.mark.parametrize("batch", [3, 11])  # 11 exercises tile padding
def test_arnn_kernel_matches_scan(batch, monkeypatch):
    monkeypatch.setenv("INPAINTNET_PALLAS_INTERPRET", "1")
    m, score, md, loc = _setup(batch)
    lw, lt = m.apply_inpaint(m.params, score, md, loc, train=False,
                             rng=jax.random.PRNGKey(1))
    # build the kernel inputs exactly as forward_sampled does
    emb = m.embed_metadata(m.params, md, score, loc)
    ctx, _ = m.output_lstm_constraints(m.params, emb, train=False, rng=None)
    pw, ptoks = arnn_sampled_decode_pallas(
        m.params, ctx, score, loc, m._start_embedding(m.params, 1),
        tile_b=8, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ptoks), np.asarray(lt))
    np.testing.assert_allclose(np.asarray(pw), np.asarray(lw), atol=1e-4)


def test_arnn_kernel_routing_and_grad(monkeypatch):
    """With the gate forced on, apply_inpaint routes through the kernel
    (same outputs) and jax.grad falls back to the scan."""
    monkeypatch.setenv("INPAINTNET_PALLAS_INTERPRET", "1")
    m, score, md, loc = _setup()
    lw, lt = m.apply_inpaint(m.params, score, md, loc, train=False,
                             rng=jax.random.PRNGKey(1))
    monkeypatch.setattr(ConstraintModelGaussianReg, "_use_pallas_decode",
                        lambda self, p: True)
    kw, kt = m.apply_inpaint(m.params, score, md, loc, train=False,
                             rng=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(kt), np.asarray(lt))
    np.testing.assert_allclose(np.asarray(kw), np.asarray(lw), atol=1e-4)

    def loss(params, on):
        monkeypatch.setattr(ConstraintModelGaussianReg, "_use_pallas_decode",
                            lambda self, p: on)
        w, _ = m.apply_inpaint(params, score, md, loc, train=False,
                               rng=jax.random.PRNGKey(1))
        return jnp.sum(w ** 2)

    g_k = jax.grad(lambda p: loss(p, True))(m.params)
    g_s = jax.grad(lambda p: loss(p, False))(m.params)
    for a, b in zip(jax.tree_util.tree_leaves(g_k),
                    jax.tree_util.tree_leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_arnn_gate_cpu():
    m, *_ = _setup()
    assert not m._use_pallas_decode(m.params)  # cpu backend
