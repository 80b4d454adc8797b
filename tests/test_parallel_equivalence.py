"""Data-parallel correctness: a train step on an 8-device mesh produces the
same parameters as the same step on 1 device (XLA's gradient psum over the
sharded batch == unsharded gradient), and tensor-parallel sharding of gate
matrices doesn't change results."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from inpaintnet_tpu.models import MeasureVAE
from inpaintnet_tpu.ops import kl_diag_normal_vs_standard
from inpaintnet_tpu.parallel.mesh import make_mesh, replicate, shard_batch, shard_params
from inpaintnet_tpu.train.metrics import mean_crossentropy_loss


class _FakeDataset:
    def __init__(self, vocab_size=24):
        self.note2index_dicts = [{f"t{i}": i for i in range(vocab_size)}]

    def __repr__(self):
        return "FakeDataset(par)"


V, B = 24, 16


def _vae():
    m = MeasureVAE(
        _FakeDataset(V), note_embedding_dim=8, num_encoder_layers=2,
        encoder_hidden_size=16, latent_space_dim=12, num_decoder_layers=2,
        decoder_hidden_size=16, encoder_dropout_prob=0.0,
        decoder_dropout_prob=0.0,
    )
    m.init(jax.random.PRNGKey(0))
    return m


def _step_fn(model, optimizer):
    def step(params, opt_state, batch, key):
        def loss_fn(p):
            w, s, z_dist, prior, zt, zp = model.apply(p, batch, train=False, rng=key)
            return mean_crossentropy_loss(w, batch) + 0.001 * (
                kl_diag_normal_vs_standard(z_dist).sum(axis=1).mean()
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(step)


def test_dp8_matches_single_device(devices8):
    model = _vae()
    optimizer = optax.adam(1e-3)
    batch = np.random.RandomState(0).randint(0, V, (B, 24)).astype(np.int32)
    key = jax.random.PRNGKey(42)

    results = {}
    for ndev in (1, 8):
        mesh = make_mesh(num_devices=ndev)
        params = replicate(mesh, model.params)
        opt_state = replicate(mesh, optimizer.init(model.params))
        sharded = shard_batch(mesh, (jnp.asarray(batch),))[0]
        step = _step_fn(model, optimizer)
        new_params, _, loss = step(params, opt_state, sharded, key)
        results[ndev] = (
            jax.tree_util.tree_map(np.asarray, new_params),
            float(loss),
        )

    p1, l1 = results[1]
    p8, l8 = results[8]
    assert abs(l1 - l8) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_tensor_parallel_sharding_matches(devices8):
    """Gate-matrix sharding over the 'model' axis changes placement, not
    values. Uses 128-hidden GRUs — shard_params only annotates gate
    matrices whose output dim is a multiple of 128 (hardware lane tiles)."""
    model = MeasureVAE(
        _FakeDataset(V), note_embedding_dim=8, num_encoder_layers=2,
        encoder_hidden_size=128, latent_space_dim=12, num_decoder_layers=1,
        decoder_hidden_size=128, encoder_dropout_prob=0.0,
        decoder_dropout_prob=0.0,
    )
    model.init(jax.random.PRNGKey(2))
    batch = jnp.asarray(
        np.random.RandomState(1).randint(0, V, (B, 24)).astype(np.int32)
    )
    key = jax.random.PRNGKey(7)

    def fwd(params, batch, key):
        w, *_ = model.apply(params, batch, train=False, rng=key)
        return w

    mesh1 = make_mesh(num_devices=1)
    w_ref = jax.jit(fwd)(replicate(mesh1, model.params), batch, key)

    mesh = make_mesh(num_devices=8, model=2)
    params_tp = shard_params(mesh, model.params)
    # at least one leaf actually sharded over 'model'
    shardings = {
        str(x.sharding.spec) for x in jax.tree_util.tree_leaves(params_tp)
        if hasattr(x, "sharding") and hasattr(x.sharding, "spec")
    }
    assert any("model" in s for s in shardings), shardings
    w_tp = jax.jit(fwd)(params_tp, shard_batch(mesh, (batch,))[0], key)
    np.testing.assert_allclose(np.asarray(w_ref), np.asarray(w_tp), atol=1e-5)
