"""LatentRNN tests: shapes, masking exactness, frozen-VAE gradients,
generation modes, ablations."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inpaintnet_tpu.models.latent_rnn import LatentRNN, LatentRNNAblations
from inpaintnet_tpu.models.measure_vae import MeasureVAE


class _FakeDataset:
    def __init__(self, vocab_size=30):
        self.note2index_dicts = [{f"t{i}": i for i in range(vocab_size)}]

    def __repr__(self):
        return "FakeDataset(test)"


V, B, NBARS, MAXT = 30, 2, 16, 6


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


def _model(vae, auto_reg=False, tf=True, cls=LatentRNN, **kw):
    m = cls(
        _FakeDataset(V), vae, num_rnn_layers=2, rnn_hidden_size=16,
        dropout=0.5, auto_reg=auto_reg, teacher_forcing=tf, max_target=MAXT, **kw
    )
    m.init(jax.random.PRNGKey(1))
    return m


def _padded_batch(n_past=5, n_target=4, seed=0):
    """Build fixed-shape padded (past, future, target) + masks."""
    key = jax.random.PRNGKey(seed)
    n_future = NBARS - n_past - n_target
    score = jax.random.randint(key, (B, NBARS, 24), 0, V)
    past = jnp.zeros((B, NBARS, 24), jnp.int32).at[:, :n_past].set(score[:, :n_past])
    future = (
        jnp.zeros((B, NBARS, 24), jnp.int32)
        .at[:, :n_future]
        .set(score[:, n_past + n_target :])
    )
    target = (
        jnp.zeros((B, MAXT, 24), jnp.int32)
        .at[:, :n_target]
        .set(score[:, n_past : n_past + n_target])
    )
    pm = (jnp.arange(NBARS) < n_past)[None].repeat(B, 0).astype(jnp.float32)
    fm = (jnp.arange(NBARS) < n_future)[None].repeat(B, 0).astype(jnp.float32)
    tm = (jnp.arange(MAXT) < n_target)[None].repeat(B, 0).astype(jnp.float32)
    return past, pm, future, fm, target, tm


@pytest.mark.parametrize("auto_reg", [False, True])
def test_forward_shapes(vae, auto_reg):
    m = _model(vae, auto_reg=auto_reg)
    past, pm, future, fm, target, tm = _padded_batch()
    w, s, z = m.apply(
        m.params, vae.params, past, future, target,
        past_mask=pm, future_mask=fm, target_mask=tm,
        train=True, rng=jax.random.PRNGKey(2),
    )
    assert w.shape == (B, MAXT, 24, V)
    assert s.shape == (B, MAXT, 24)
    assert z.shape == (B, MAXT, 12)


def test_context_masking_exact(vae):
    """Padded context == truncated context (the static-shape guarantee)."""
    m = _model(vae)
    past, pm, future, fm, target, tm = _padded_batch(n_past=5, n_target=4)
    z = m.get_z_seq(vae.params, past, train=False, rng=jax.random.PRNGKey(3))
    h_pad = m.forward_context(m.params, z, pm, "past", train=False, rng=None)
    h_trunc = m.forward_context(
        m.params, z[:, :5], jnp.ones((B, 5)), "past", train=False, rng=None
    )
    np.testing.assert_allclose(np.asarray(h_pad), np.asarray(h_trunc), atol=1e-5)


def test_gradients_skip_frozen_vae(vae):
    m = _model(vae, auto_reg=False)
    past, pm, future, fm, target, tm = _padded_batch()

    def loss_fn(params, vae_params):
        w, _, _ = m.apply(
            params, vae_params, past, future, target,
            past_mask=pm, future_mask=fm, target_mask=tm,
            train=False, rng=jax.random.PRNGKey(4),
        )
        logp = jax.nn.log_softmax(w, axis=-1)
        nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
        return (nll * tm[:, :, None]).sum() / (tm.sum() * 24)

    g_model, g_vae = jax.grad(loss_fn, argnums=(0, 1))(m.params, vae.params)
    model_norm = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g_model))
    vae_norm = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g_vae))
    assert model_norm > 0
    assert vae_norm == 0  # stop_gradient freeze


def test_autoreg_sampled_path(vae):
    m = _model(vae, auto_reg=True, tf=False)
    past, pm, future, fm, target, tm = _padded_batch()
    w, s, z = m.apply(
        m.params, vae.params, past, future, target,
        past_mask=pm, future_mask=fm, target_mask=tm,
        train=False, rng=jax.random.PRNGKey(5),
    )
    assert w.shape == (B, MAXT, 24, V)
    assert np.asarray(s).max() < V


def test_autoreg_row_keys_batch_independent(vae):
    """Round-4 serving coalescing: with per-row keys, an auto_reg row's
    output depends on its own key/tokens alone — rows of a coalesced
    batch bit-equal their solo runs (context rsample AND the scan's
    per-step re-encode rsample both draw per-row streams)."""
    m = _model(vae, auto_reg=True, tf=False)
    past, pm, future, fm, _, tm = _padded_batch()
    row_keys = jnp.asarray(
        np.random.RandomState(3).randint(0, 2**32, (B, 2), np.uint64),
        jnp.uint32,
    )

    def run(idx):
        sel = lambda a: a[idx]  # noqa: E731
        _, s, _ = m.apply(
            m.params, vae.params, sel(past), sel(future), None,
            past_mask=sel(pm), future_mask=sel(fm), target_mask=sel(tm),
            train=False, rng=jax.random.PRNGKey(0),
            row_keys=row_keys[idx],
        )
        return np.asarray(s)

    both = run(np.arange(B))
    for i in range(B):
        solo = run(np.asarray([i]))
        np.testing.assert_array_equal(both[i], solo[0])
    # deterministic given keys; different keys -> different samples
    np.testing.assert_array_equal(both, run(np.arange(B)))
    assert not np.array_equal(both[0], both[1])
    # training still refuses row_keys
    with pytest.raises(ValueError, match="inference only"):
        m.apply(
            m.params, vae.params, past, future,
            jnp.zeros((B, MAXT, 24), jnp.int32),
            past_mask=pm, future_mask=fm, target_mask=tm,
            train=True, rng=jax.random.PRNGKey(0), row_keys=row_keys,
        )


def test_inference_without_target(vae):
    """Fixes the reference's broken no-target generate path
    (latent_rnn_tester.py:231-236 calls forward without target and crashes
    in the non-TF branch only by luck)."""
    m = _model(vae, auto_reg=False)
    past, pm, future, fm, _, tm = _padded_batch()
    w, s, z = m.apply(
        m.params, vae.params, past, future, None,
        past_mask=pm, future_mask=fm, target_mask=tm,
        train=False, rng=jax.random.PRNGKey(6),
    )
    assert s.shape == (B, MAXT, 24)


@pytest.mark.parametrize("which", ["past", "future"])
def test_ablations(vae, which):
    m = _model(vae, cls=LatentRNNAblations, type=which)
    past, pm, future, fm, target, tm = _padded_batch()
    w, s, z = m.apply(
        m.params, vae.params, past, future, target,
        past_mask=pm, future_mask=fm, target_mask=tm,
        train=True, rng=jax.random.PRNGKey(7),
    )
    assert w.shape == (B, MAXT, 24, V)


def test_jit_and_mask_variation_no_recompile(vae):
    """Different (n_past, n_target) splits reuse ONE compiled function —
    the whole point of the static-shape design."""
    m = _model(vae)
    compiled = jax.jit(
        lambda p, vp, past, fut, tgt, pm, fm, tm, r: m.apply(
            p, vp, past, fut, tgt,
            past_mask=pm, future_mask=fm, target_mask=tm, train=False, rng=r,
        )
    )
    for n_past, n_target in [(5, 4), (9, 2), (1, 6)]:
        past, pm, future, fm, target, tm = _padded_batch(n_past, n_target)
        w, s, z = compiled(
            m.params, vae.params, past, future, target, pm, fm, tm,
            jax.random.PRNGKey(0),
        )
        assert w.shape == (B, MAXT, 24, V)
    assert compiled._cache_size() == 1
