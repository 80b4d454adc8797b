"""End-to-end training smoke tests: tiny corpus -> datasets -> trainers.

Mirrors the reference's small-dataset fixture strategy
(dataset_manager.py:15-102 registry *_test entries) and exercises the full
stack: corpus -> tensor store -> jitted data-parallel train step ->
checkpoints. Runs on the 8-virtual-device CPU mesh.
"""
import os

import numpy as np
import jax
import pytest

from inpaintnet_tpu.data import BeatMarkerMetadata, DatasetManager, TickMetadata
from inpaintnet_tpu.data.synthetic import generate_corpus
from inpaintnet_tpu.models import (
    AnticipationRNNBaseline,
    ConstraintModelGaussianReg,
    LatentRNN,
    MeasureVAE,
)
from inpaintnet_tpu.parallel.mesh import make_mesh
from inpaintnet_tpu.train import (
    AnticipationRNNBaselineTrainer,
    AnticipationRNNGaussianRegTrainer,
    LatentRNNTrainer,
    VAETrainer,
)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    corpus = tmp_path_factory.mktemp("corpus")
    cache = tmp_path_factory.mktemp("cache")
    ckpt = tmp_path_factory.mktemp("ckpt")
    generate_corpus(str(corpus), num_tunes=10, num_bars=16, seed=1)
    mgr = DatasetManager(cache_dir=str(cache), corpus_dir=str(corpus))
    metadatas = [BeatMarkerMetadata(6), TickMetadata(6)]
    ds = mgr.get_dataset(
        "folk_4by4nbars_short", metadatas=metadatas, num_bars=16, train=True
    )
    ds.arrays  # force build
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


def test_vae_training_learns(env):
    ds, ckpt = env
    mesh = make_mesh(num_devices=4)  # 4-way data parallel on CPU devices
    model = _tiny_vae(ds, ckpt)
    trainer = VAETrainer(ds, model, lr=3e-3, mesh=mesh)
    train_loader, _, _ = ds.data_loaders(batch_size=8, split=(0.7, 0.2))
    l0, a0 = trainer.loss_and_acc_on_epoch(train_loader, train=False)
    trainer.train_model(batch_size=8, num_epochs=2, split=(0.7, 0.2))
    l1, a1 = trainer.loss_and_acc_on_epoch(train_loader, train=False)
    assert np.isfinite(l1)
    assert l1 < l0  # loss decreases after 2 epochs
    assert os.path.exists(model.filepath)
    assert os.path.exists(trainer.state_path + ".npz")


def test_vae_trainer_resume(env):
    ds, ckpt = env
    model = _tiny_vae(ds, ckpt)
    trainer = VAETrainer(ds, model, lr=3e-3)
    trainer.train_model(batch_size=8, num_epochs=1, split=(0.7, 0.2))
    # fresh trainer resumes params + opt state
    model2 = _tiny_vae(ds, ckpt)
    model2.init(jax.random.PRNGKey(99))
    t2 = VAETrainer(ds, model2, lr=3e-3)
    t2.load_state()
    leaves1 = jax.tree_util.tree_leaves(trainer.model.params)
    leaves2 = jax.tree_util.tree_leaves(t2.model.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_latent_rnn_training_step(env):
    ds, ckpt = env
    vae = _tiny_vae(ds, ckpt)
    vae.init(jax.random.PRNGKey(0))
    model = LatentRNN(
        ds, vae, num_rnn_layers=2, rnn_hidden_size=16, dropout=0.5,
        auto_reg=False, teacher_forcing=True, checkpoint_dir=ckpt,
    )
    trainer = LatentRNNTrainer(ds, model, lr=1e-3)
    train_loader, _, _ = ds.data_loaders(batch_size=4, split=(0.7, 0.2))
    loss, acc = trainer.loss_and_acc_on_epoch(train_loader, train=True)
    assert np.isfinite(loss) and loss > 0
    # frozen VAE params unchanged by a training pass
    for a, b in zip(
        jax.tree_util.tree_leaves(vae.params),
        jax.tree_util.tree_leaves(trainer.extra_params()),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize(
    "model_cls,trainer_cls",
    [
        (ConstraintModelGaussianReg, AnticipationRNNGaussianRegTrainer),
        (AnticipationRNNBaseline, AnticipationRNNBaselineTrainer),
    ],
)
def test_arnn_training_step(env, model_cls, trainer_cls):
    ds, ckpt = env
    model = model_cls(
        ds,
        note_embedding_dim=8,
        metadata_embedding_dim=4,
        num_lstm_constraints_units=16,
        num_lstm_generation_units=16,
        linear_hidden_size=12,
        num_layers=1,
        unary_constraint=True,
        checkpoint_dir=ckpt,
    )
    trainer = trainer_cls(ds, model, lr=1e-3)
    train_loader, _, _ = ds.data_loaders(batch_size=4, split=(0.7, 0.2))
    loss, acc = trainer.loss_and_acc_on_epoch(train_loader, train=True)
    assert np.isfinite(loss) and 0 <= acc <= 1


def test_vae_training_bf16_compute(env):
    """Mixed-precision training: bf16 compute, fp32 master params."""
    import jax.numpy as jnp

    ds, ckpt = env
    model = _tiny_vae(ds, ckpt)
    trainer = VAETrainer(ds, model, lr=3e-3, compute_dtype="bfloat16")
    train_loader, _, _ = ds.data_loaders(batch_size=8, split=(0.7, 0.2))
    l0, _ = trainer.loss_and_acc_on_epoch(train_loader, train=False)
    trainer.loss_and_acc_on_epoch(train_loader, train=True)
    trainer.loss_and_acc_on_epoch(train_loader, train=True)
    l1, _ = trainer.loss_and_acc_on_epoch(train_loader, train=False)
    assert np.isfinite(l1) and l1 < l0
    # master params remain fp32
    for leaf in jax.tree_util.tree_leaves(trainer.model.params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32


def test_arnn_gaussian_reg_active(env):
    """gaussian_reg_coeff > 0 adds the activation regularizer (the
    reference defined it but never used it; here it's a working opt-in)."""
    ds, ckpt = env
    model = ConstraintModelGaussianReg(
        ds, note_embedding_dim=8, metadata_embedding_dim=4,
        num_lstm_constraints_units=16, num_lstm_generation_units=16,
        linear_hidden_size=12, num_layers=1, unary_constraint=True,
        teacher_forcing=True, checkpoint_dir=ckpt,
    )
    base_tr = AnticipationRNNGaussianRegTrainer(ds, model, lr=1e-3, seed=5)
    reg_tr = AnticipationRNNGaussianRegTrainer(
        ds, model, lr=1e-3, gaussian_reg_coeff=1e-3, seed=5
    )
    loader, _, _ = ds.data_loaders(batch_size=4, split=(0.7, 0.2))
    batch = next(iter(loader))
    bd = base_tr.process_batch_data(batch)
    import jax

    l0, _ = base_tr.loss_and_metrics(model.params, bd, jax.random.PRNGKey(0), False)
    # reg path uses forward_tf internally; compute with train=False for
    # determinism and compare magnitudes
    l1, _ = reg_tr.loss_and_metrics(model.params, bd, jax.random.PRNGKey(0), False)
    assert float(l1) > float(l0)  # regularizer adds positive mass
