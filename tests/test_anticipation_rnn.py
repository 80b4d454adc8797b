"""AnticipationRNN tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inpaintnet_tpu.models.anticipation_rnn import (
    AnticipationRNNBaseline,
    ConstraintModelGaussianReg,
)


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


V, B, T = 30, 3, 48  # 2 measures


@pytest.fixture(scope="module")
def model():
    m = ConstraintModelGaussianReg(
        _FakeDataset(V),
        note_embedding_dim=8,
        metadata_embedding_dim=6,
        num_lstm_constraints_units=16,
        num_lstm_generation_units=16,
        linear_hidden_size=12,
        num_layers=2,
        unary_constraint=True,
    )
    m.init(jax.random.PRNGKey(0))
    return m


def _batch(seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    score = jax.random.randint(k1, (B, T), 0, V)
    md = jnp.stack(
        [
            jax.random.randint(k2, (B, T), 0, 4),
            jnp.arange(T)[None].repeat(B, 0) % 6,
            jnp.zeros((B, T), jnp.int32),
        ],
        axis=-1,
    )
    # contiguous inpainting mask: constrained outside [24, 36)
    loc = jnp.ones((B, T), jnp.int32).at[:, 24:36].set(0)
    return score, md, loc


def test_forward_tf_shapes(model):
    score, md, loc = _batch()
    logits = model.forward_tf(model.params, score, md, loc, train=True, rng=jax.random.PRNGKey(1))
    assert logits.shape == (B, T, V)


def test_forward_sampled_full_batch_decode(model):
    """Every batch row decodes independently (reference decoded only row 0)."""
    score, md, loc = _batch()
    logits, tokens = model.forward_sampled(
        model.params, score, md, loc, train=False, rng=jax.random.PRNGKey(2)
    )
    assert logits.shape == (B, T, V)
    assert tokens.shape == (B, T)
    rows = np.asarray(tokens)
    assert not (rows[0] == rows[1]).all() or not (rows[0] == rows[2]).all()


def test_inpaint_forces_context(model):
    score, md, loc = _batch()
    _, gen = model.apply_inpaint(
        model.params, score, md, loc, rng=jax.random.PRNGKey(3)
    )
    gen = np.asarray(gen)
    sc = np.asarray(score)
    m = np.asarray(loc)
    # forced (constrained) positions reproduce the ground truth
    np.testing.assert_array_equal(gen[m == 1], sc[m == 1])


def test_train_forward_and_grads(model):
    score, md, loc = _batch()

    def loss_fn(params):
        logits = model.apply(params, score, md, loc, train=True, rng=jax.random.PRNGKey(4))
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, score[..., None], axis=-1)[..., 0]
        mask = 1 - loc
        return (nll * mask).sum() / mask.sum()

    loss, grads = jax.value_and_grad(loss_fn)(model.params)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0


def test_generate_temperature(model):
    score, md, loc = _batch()
    _, t1 = model.generate(
        model.params, score, md, loc, temperature=1.5, rng=jax.random.PRNGKey(5)
    )
    _, t2 = model.generate(
        model.params, score, md, loc, temperature=1.5, rng=jax.random.PRNGKey(6)
    )
    assert t1.shape == (B, T)
    # stochastic: different seeds give different spans
    span1 = np.asarray(t1)[:, 24:36]
    span2 = np.asarray(t2)[:, 24:36]
    assert not (span1 == span2).all()


def test_baseline_variant_repr():
    ds = _FakeDataset(V)
    reg = ConstraintModelGaussianReg(ds, num_layers=1, unary_constraint=True)
    base = AnticipationRNNBaseline(ds, num_layers=1, unary_constraint=True)
    assert "AnticipationRNNReg" in repr(reg)
    assert "AnticipationRNNBaseline" in repr(base)
