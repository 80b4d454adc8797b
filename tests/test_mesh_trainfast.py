"""Multi-device-mesh training with the trainfast Pallas kernels.

Round-5 verdict #3: the adopted VAE training kernels must survive on
multi-chip meshes. GSPMD cannot partition Pallas custom calls, so the
base trainer swaps the GSPMD-jitted grad computation for an explicit
``jax.shard_map`` over the data axis (Trainer._use_shard_map_train) —
each device runs the WHOLE kernel-bearing program on its local rows,
mirroring the serving layer's mesh path (serve.py ``_shard_mapped``).

These tests verify on the 8-virtual-device CPU mesh:
- exact parity of the shard_map step against a hand-computed per-shard
  reference (fold_in(d) keys, per-shard batch means, mean-of-means);
- the Pallas kernels actually executing inside shard_map (interpret
  mode) with finite, learning losses;
- the routing predicate itself.
"""
import numpy as np
import jax
import pytest

from inpaintnet_tpu.data import BeatMarkerMetadata, DatasetManager, TickMetadata
from inpaintnet_tpu.data.synthetic import generate_corpus
from inpaintnet_tpu.models import MeasureVAE
from inpaintnet_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from inpaintnet_tpu.train import VAETrainer


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    corpus = tmp_path_factory.mktemp("corpus")
    cache = tmp_path_factory.mktemp("cache")
    ckpt = tmp_path_factory.mktemp("ckpt")
    generate_corpus(str(corpus), num_tunes=10, num_bars=16, seed=1)
    mgr = DatasetManager(cache_dir=str(cache), corpus_dir=str(corpus))
    ds = mgr.get_dataset(
        "folk_4by4nbars_short",
        metadatas=[BeatMarkerMetadata(6), TickMetadata(6)],
        num_bars=16,
        train=True,
    )
    ds.arrays
    return ds, str(ckpt)


def _tiny_vae(ds, ckpt):
    return MeasureVAE(
        ds,
        note_embedding_dim=8,
        num_encoder_layers=1,
        encoder_hidden_size=16,
        latent_space_dim=12,
        num_decoder_layers=1,
        decoder_hidden_size=16,
        encoder_dropout_prob=0.5,
        decoder_dropout_prob=0.5,
        checkpoint_dir=ckpt,
    )


def _trainer_on_mesh(ds, ckpt, monkeypatch, n_dev=4, interpret=False):
    if interpret:
        monkeypatch.setenv("INPAINTNET_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("INPAINTNET_TRAIN_GRU_IMPL", "trainfast_pallas")
    model = _tiny_vae(ds, ckpt)
    model.init(jax.random.PRNGKey(3))
    trainer = VAETrainer(ds, model, lr=3e-3, mesh=make_mesh(num_devices=n_dev))
    assert trainer._use_shard_map_train()
    trainer._build_steps()
    return trainer


def test_use_shard_map_predicate(env):
    ds, ckpt = env
    model = _tiny_vae(ds, ckpt)
    model.init(jax.random.PRNGKey(0))
    t1 = VAETrainer(ds, model, mesh=make_mesh(num_devices=1))
    t1.train_gru_impl = "trainfast_pallas"
    # single device ON CPU: plain jit (on TPU the wrapper wins even at one
    # device — bench_shardmap_train.py — but these tests run CPU)
    assert not t1._use_shard_map_train()
    t8 = VAETrainer(ds, model, mesh=make_mesh(num_devices=8))
    t8.train_gru_impl = "trainfast_pallas"
    assert t8._use_shard_map_train()
    t8.train_gru_impl = "trainfast"  # no kernels -> GSPMD handles it
    assert not t8._use_shard_map_train()
    t8.train_gru_impl = None
    assert not t8._use_shard_map_train()


def test_shard_map_step_matches_per_shard_reference(env, monkeypatch):
    """The shard_map train step == a hand loop over shards: fold_in(d)
    key, per-shard batch-mean loss/grads, mean of shard means, one adam
    update — exact up to f32 reassociation."""
    import optax
    from inpaintnet_tpu.ops.gru import gru_impl_scope

    ds, ckpt = env
    n_dev = 4
    # kernels self-gate off (CPU, no interpret): shard_map wiring runs the
    # identical scan math, so the comparison isolates the DISTRIBUTION
    trainer = _trainer_on_mesh(ds, ckpt, monkeypatch, n_dev=n_dev)
    score = np.asarray(ds.arrays[0][:8])
    bd = trainer.process_batch_data((score, None))
    key = jax.random.PRNGKey(7)
    params0 = jax.tree_util.tree_map(np.asarray, trainer.model.params)

    got_params, _, got_loss, got_metrics = trainer._train_step(
        replicate(trainer.mesh, trainer.model.params),
        trainer.opt_state,
        shard_batch(trainer.mesh, bd),
        key,
        None,
    )

    # ---- reference: explicit per-shard loop ---- #
    rows = bd.shape[0] // n_dev
    losses, accs, gradss = [], [], []
    for d in range(n_dev):
        kd = jax.random.fold_in(key, d)
        shard = bd[d * rows:(d + 1) * rows]

        def loss_fn(p):
            return trainer.loss_and_metrics(p, shard, kd, True)

        with gru_impl_scope("trainfast_pallas"):
            (l, m), g = jax.value_and_grad(loss_fn, has_aux=True)(params0)
        losses.append(np.asarray(l))
        accs.append(np.asarray(m["accuracy"]))
        gradss.append(g)
    want_loss = np.mean(losses)
    want_acc = np.mean(accs)
    want_grads = jax.tree_util.tree_map(
        lambda *gs: np.mean(np.stack([np.asarray(x) for x in gs]), axis=0),
        *gradss,
    )
    opt = optax.adam(trainer.lr)
    updates, _ = opt.update(want_grads, opt.init(params0), params0)
    want_params = optax.apply_updates(params0, updates)

    np.testing.assert_allclose(float(got_loss), want_loss, rtol=2e-5)
    np.testing.assert_allclose(
        float(got_metrics["accuracy"]), want_acc, rtol=2e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(got_params),
        jax.tree_util.tree_leaves(want_params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=2e-4
        )


def test_kernels_execute_inside_shard_map_and_learn(env, monkeypatch):
    """Interpret mode: the Pallas fwd-stream + sequential-backward kernels
    run INSIDE shard_map on the 4-device mesh; losses stay finite and the
    step sequence learns."""
    ds, ckpt = env
    trainer = _trainer_on_mesh(ds, ckpt, monkeypatch, n_dev=4, interpret=True)
    score = np.asarray(ds.arrays[0][:8])
    bd = trainer.process_batch_data((score, None))
    params = replicate(trainer.mesh, trainer.model.params)
    opt_state = trainer.opt_state
    losses = []
    for i in range(4):
        params, opt_state, loss, metrics = trainer._train_step(
            params, opt_state, shard_batch(trainer.mesh, bd),
            jax.random.PRNGKey(i), None,
        )
        losses.append(float(loss))
        assert np.isfinite(losses[-1])
        assert np.isfinite(float(metrics["accuracy"]))
    assert losses[-1] < losses[0]
    for leaf in jax.tree_util.tree_leaves(params):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_train_model_on_mesh_end_to_end(env, monkeypatch):
    """Full train_model epoch loop on the 8-device mesh with the shard_map
    step (scan fallback inside: wiring + epoch machinery + resume path)."""
    ds, ckpt = env
    trainer = _trainer_on_mesh(ds, ckpt, monkeypatch, n_dev=8)
    train_loader, _, _ = ds.data_loaders(batch_size=8, split=(0.7, 0.2))
    l0, _ = trainer.loss_and_acc_on_epoch(train_loader, train=False)
    trainer.train_model(batch_size=8, num_epochs=2, split=(0.7, 0.2))
    l1, _ = trainer.loss_and_acc_on_epoch(train_loader, train=False)
    assert np.isfinite(l1)
    assert l1 < l0
