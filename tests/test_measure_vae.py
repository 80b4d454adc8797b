"""MeasureVAE unit tests: shapes, determinism, TF-parallel vs sequential
equivalence, gradient flow, save/load."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inpaintnet_tpu.models.measure_vae import (
    Encoder,
    HierarchicalDecoder,
    MeasureVAE,
    SRDecoder,
    SRDecoderNoInput,
)


class _FakeDataset:
    def __init__(self, vocab_size=30):
        self.note2index_dicts = [{f"t{i}": i for i in range(vocab_size)}]

    def __repr__(self):
        return "FakeDataset(test)"


V = 30
B = 4


@pytest.fixture(scope="module")
def vae():
    m = MeasureVAE(
        _FakeDataset(V),
        note_embedding_dim=8,
        num_encoder_layers=2,
        encoder_hidden_size=16,
        latent_space_dim=12,
        num_decoder_layers=2,
        decoder_hidden_size=16,
    )
    m.init(jax.random.PRNGKey(0))
    return m


def _batch(seed=0):
    return jax.random.randint(jax.random.PRNGKey(seed), (B, 24), 0, V)


def test_encoder_shapes(vae):
    dist = vae.encoder.apply(vae.params["encoder"], _batch())
    assert dist.loc.shape == (B, 12)
    assert dist.scale.shape == (B, 12)
    assert (np.asarray(dist.scale) > 0).all()


def test_forward_shapes_and_relu_logits(vae):
    w, s, z_dist, prior, z_tilde, z_prior = vae.apply(
        vae.params, _batch(), train=True, rng=jax.random.PRNGKey(1)
    )
    assert w.shape == (B, 24, V)
    assert s.shape == (B, 24)
    assert z_tilde.shape == (B, 12)
    # ReLU'd logits are non-negative (reference quirk decoder.py:369-372)
    assert (np.asarray(w) >= 0).all()
    assert np.asarray(s).min() >= 0 and np.asarray(s).max() < V


def test_eval_decode_deterministic(vae):
    w1, s1, *_ = vae.apply(vae.params, _batch(), train=False, rng=jax.random.PRNGKey(5))
    w2, s2, *_ = vae.apply(vae.params, _batch(), train=False, rng=jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=0)


def test_tf_parallel_equals_sequential_tf(vae):
    """The parallel teacher-forced path must equal the sequential path fed
    with ground truth (eval mode: no dropout)."""
    dec = vae.decoder
    params = vae.params["decoder"]
    z = jax.random.normal(jax.random.PRNGKey(2), (B, 12))
    score = _batch(3)
    w_par, _ = dec.decode_teacher_forced(params, z, score, train=False, rng=jax.random.PRNGKey(0))
    w_seq, _ = dec.decode_sampling(params, z, train=False, rng=jax.random.PRNGKey(0), score_tensor=score)
    np.testing.assert_allclose(np.asarray(w_par), np.asarray(w_seq), atol=1e-5)


def test_gradients_flow(vae):
    score = _batch()

    def loss_fn(params):
        w, *_ = vae.apply(params, score, train=True, rng=jax.random.PRNGKey(7))
        logp = jax.nn.log_softmax(w, axis=-1)
        return -jnp.take_along_axis(logp, score[..., None], axis=-1).mean()

    grads = jax.grad(loss_fn)(vae.params)
    flat = jax.tree_util.tree_leaves(grads)
    total = sum(float(jnp.abs(g).sum()) for g in flat)
    assert np.isfinite(total) and total > 0
    # encoder receives gradients through rsample (reparameterization)
    enc_grad = sum(
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["encoder"])
    )
    assert enc_grad > 0


def test_apply_test_multimeasure(vae):
    mt = jax.random.randint(jax.random.PRNGKey(9), (2, 3, 24), 0, V)
    w, s = vae.apply_test(vae.params, mt)
    assert w.shape == (2, 3, 24, V)
    assert s.shape == (2, 3, 24)


def test_save_load_roundtrip(vae, tmp_path):
    p = str(tmp_path / "vae.npz")
    vae.save(p)
    m2 = MeasureVAE(
        _FakeDataset(V),
        note_embedding_dim=8,
        num_encoder_layers=2,
        encoder_hidden_size=16,
        latent_space_dim=12,
        num_decoder_layers=2,
        decoder_hidden_size=16,
    )
    m2.init(jax.random.PRNGKey(123))
    m2.load(p)
    w1, s1, *_ = vae.apply(vae.params, _batch(), train=False, rng=jax.random.PRNGKey(0))
    w2, s2, *_ = m2.apply(m2.params, _batch(), train=False, rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_sr_decoders(vae):
    z = jax.random.normal(jax.random.PRNGKey(2), (B, 12))
    score = _batch()
    for cls in (SRDecoder, SRDecoderNoInput):
        dec = cls(
            note_embedding_dim=8, num_notes=V, z_dim=12, num_layers=2,
            rnn_hidden_size=16, dropout=0.1,
        )
        params = dec.init_params(jax.random.PRNGKey(4))
        w, s = dec.apply(params, z, score, train=True, rng=jax.random.PRNGKey(5))
        assert w.shape == (B, 24, V)
        assert s.shape == (B, 24)


def test_jit_forward(vae):
    fwd = jax.jit(lambda p, x, r: vae.apply(p, x, train=True, rng=r))
    w, s, *_ = fwd(vae.params, _batch(), jax.random.PRNGKey(0))
    assert w.shape == (B, 24, V)
