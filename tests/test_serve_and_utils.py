"""Serving engine + debug/profiling utility tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inpaintnet_tpu.models import LatentRNN, MeasureVAE
from inpaintnet_tpu.serve import InpaintingEngine
from inpaintnet_tpu.utils.debug import assert_finite, checkify_wrap, nan_check
from inpaintnet_tpu.utils.profiling import StepTimer


class _FakeDataset:
    def __init__(self, vocab_size=30):
        self.note2index_dicts = [{f"t{i}": i for i in range(vocab_size)}]

    def __repr__(self):
        return "FakeDataset(test)"


V = 30


@pytest.fixture(scope="module")
def engine():
    vae = MeasureVAE(
        _FakeDataset(V), note_embedding_dim=8, num_encoder_layers=2,
        encoder_hidden_size=16, latent_space_dim=12, num_decoder_layers=2,
        decoder_hidden_size=16,
    )
    vae.init(jax.random.PRNGKey(0))
    m = LatentRNN(_FakeDataset(V), vae, num_rnn_layers=2, rnn_hidden_size=16,
                  dropout=0.5, auto_reg=False)
    m.init(jax.random.PRNGKey(1))
    # float32 serving on CPU test backend
    return InpaintingEngine(m, batch_buckets=(1, 4), dtype="float32")


def test_engine_inpaints_span_only(engine):
    tokens = np.random.RandomState(0).randint(0, V, (2, 16, 24)).astype(np.int32)
    out = engine.inpaint(tokens, start_measure=8, num_measures=2, seed=0)
    assert out.shape == tokens.shape
    np.testing.assert_array_equal(out[:, :8], tokens[:, :8])
    np.testing.assert_array_equal(out[:, 10:], tokens[:, 10:])
    assert out.min() >= 0 and out.max() < V


def test_engine_bucketing_compiles_once(engine):
    tokens = np.random.RandomState(1).randint(0, V, (3, 16, 24)).astype(np.int32)
    engine.inpaint(tokens, 4, 3)
    engine.inpaint(tokens[:2], 2, 1)  # same bucket (4)
    assert list(engine._compiled.keys()) == [4]
    engine.inpaint(tokens[:1], 2, 1)  # bucket 1
    assert sorted(engine._compiled.keys()) == [1, 4]


def test_engine_tick_api(engine):
    score = np.random.RandomState(2).randint(0, V, (1, 16 * 24)).astype(np.int32)
    out = engine.inpaint_ticks(score, (24 * 7, 24 * 9), seed=1)
    assert out.shape == score.shape
    np.testing.assert_array_equal(out[0, : 24 * 7], score[0, : 24 * 7])


def test_nan_check():
    good = {"a": jnp.ones((3,)), "b": [jnp.zeros((2, 2))]}
    nan_check(good)
    bad = {"a": jnp.array([1.0, np.nan])}
    with pytest.raises(ValueError, match="a"):
        nan_check(bad)
    with pytest.raises(ValueError):
        assert_finite(bad)


def test_checkify_wrap():
    def f(x):
        return jnp.log(x)

    wrapped = checkify_wrap(f)
    err, out = wrapped(jnp.array([-1.0]))
    with pytest.raises(Exception):
        err.throw()
    err2, out2 = wrapped(jnp.array([1.0]))
    err2.throw()  # no error


def test_step_timer():
    t = StepTimer(items_per_step=10, warmup=1)
    for _ in range(5):
        with t:
            pass
    assert t.throughput > 0
    assert "steps" in t.report()
