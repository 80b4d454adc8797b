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


def test_make_global_batch_single_process(devices8):
    """Single-process make_global_batch == shard_batch on a divisible batch
    (values, sharding, and per-device shard shapes)."""
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from inpaintnet_tpu.parallel.mesh import (
        batch_sharding,
        local_batch_size,
        make_global_batch,
        make_mesh,
        shard_batch,
    )

    mesh = make_mesh(num_devices=8)
    assert local_batch_size(mesh, 16) == 16
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    batch = {"x": x, "y": np.arange(16, dtype=np.int32)}
    g = make_global_batch(mesh, batch)
    s = shard_batch(mesh, batch)
    np.testing.assert_array_equal(np.asarray(g["x"]), np.asarray(s["x"]))
    np.testing.assert_array_equal(np.asarray(g["y"]), np.asarray(s["y"]))
    assert g["x"].sharding.spec == P("data")
    # addressable-shard math: 16 rows over an 8-way data axis -> 2 each
    assert batch_sharding(mesh).shard_shape((16, 3)) == (2, 3)
    shard_rows = sorted(
        int(sh.data.shape[0]) for sh in g["x"].addressable_shards
    )
    assert shard_rows == [2] * 8


def test_make_global_batch_feeds_train_step(devices8):
    """A make_global_batch batch runs through a jitted mesh step unchanged."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from inpaintnet_tpu.parallel.mesh import make_global_batch, make_mesh

    mesh = make_mesh(num_devices=8)
    batch = {"x": np.ones((16, 4), np.float32)}
    g = make_global_batch(mesh, batch)

    @jax.jit
    def step(b):
        return jnp.sum(b["x"] * 2.0)

    assert float(step(g)) == 128.0


def test_local_batch_size_validates(monkeypatch):
    """Per-process row math for a (simulated) 4-process run."""
    import pytest as _pytest

    from inpaintnet_tpu.parallel import mesh as mesh_mod

    m = mesh_mod.make_mesh(num_devices=8)
    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 4)
    assert mesh_mod.local_batch_size(m, 32) == 8
    with _pytest.raises(ValueError):
        mesh_mod.local_batch_size(m, 30)


def test_pad_rows_to_divisible_math():
    """Eval-tail padding: smallest local row count whose global total
    divides the data axis, zero fill, correct validity mask."""
    import numpy as np

    from inpaintnet_tpu.parallel.mesh import pad_rows_to_divisible

    batch = {"x": np.ones((5, 3), np.float32), "y": np.arange(5, dtype=np.int32)}
    # already divisible: returned untouched, mask None
    same, mask = pad_rows_to_divisible(batch, data_axis=4, process_count=4)
    assert mask is None and same is batch

    # 5 rows x 4 procs = 20 % 24 != 0; step = 24/gcd(24,4) = 6 -> pad to 6
    padded, mask = pad_rows_to_divisible(batch, data_axis=24, process_count=4)
    assert padded["x"].shape == (6, 3) and padded["y"].shape == (6,)
    np.testing.assert_array_equal(mask, [1, 1, 1, 1, 1, 0])
    np.testing.assert_array_equal(padded["x"][:5], batch["x"])
    np.testing.assert_array_equal(padded["x"][5], 0.0)
    assert padded["y"].dtype == batch["y"].dtype

    # single process, 8-way axis: 5 -> 8
    padded, mask = pad_rows_to_divisible(batch, data_axis=8, process_count=1)
    assert padded["x"].shape == (8, 3)
    assert mask.sum() == 5 and mask.shape == (8,)
