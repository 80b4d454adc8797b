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
    reg_a = AnticipationRNNGaussianRegTrainer(
        ds, model, lr=1e-3, gaussian_reg_coeff=1e-3, seed=5
    )
    reg_b = AnticipationRNNGaussianRegTrainer(
        ds, model, lr=1e-3, gaussian_reg_coeff=2e-3, seed=5
    )
    loader, _, _ = ds.data_loaders(batch_size=4, split=(0.7, 0.2))
    batch = next(iter(loader))
    bd = base_tr.process_batch_data(batch)
    import jax

    key = jax.random.PRNGKey(0)
    # TRAIN: the reg term scales with the coefficient (same TF forward,
    # same key -> the only difference is coeff * reg > 0)
    la, _ = reg_a.loss_and_metrics(model.params, bd, key, True)
    lb, _ = reg_b.loss_and_metrics(model.params, bd, key, True)
    assert float(lb) > float(la)
    # EVAL: the reg path must NOT change the objective — val loss equals
    # the coeff=0 trainer's exactly (same sampled-decode path, no reg),
    # so EarlyStopping tracks the serving-time objective
    l0, _ = base_tr.loss_and_metrics(model.params, bd, key, False)
    l1, _ = reg_a.loss_and_metrics(model.params, bd, key, False)
    assert float(l0) == float(l1)


def test_row_mask_excludes_pad_rows_all_trainers(env):
    """Multi-host eval-tail pad-and-mask: rows flagged 0 in ``row_mask``
    cannot influence the loss/accuracy of any trainer family. At fixed
    padded shape (so the rsample noise realization is identical), zero-fill
    vs garbage-fill of the pad rows must give bitwise-equal results; the
    deterministic ARNN eval must additionally equal the UNPADDED loss
    exactly."""
    from inpaintnet_tpu.parallel.mesh import pad_rows_to_divisible

    ds, ckpt = env
    vae = _tiny_vae(ds, ckpt)
    vae.init(jax.random.PRNGKey(3))
    lrnn = LatentRNN(
        ds, vae, num_rnn_layers=2, rnn_hidden_size=16, dropout=0.0,
        auto_reg=False, teacher_forcing=True, checkpoint_dir=ckpt,
    )
    arnn = ConstraintModelGaussianReg(
        ds, note_embedding_dim=8, metadata_embedding_dim=4,
        num_lstm_constraints_units=16, num_lstm_generation_units=16,
        linear_hidden_size=12, num_layers=1, unary_constraint=True,
        checkpoint_dir=ckpt,
    )
    trainers = [
        VAETrainer(ds, _tiny_vae(ds, ckpt), lr=1e-3),
        LatentRNNTrainer(ds, lrnn, lr=1e-3),
        AnticipationRNNGaussianRegTrainer(ds, arnn, lr=1e-3),
    ]
    loader, _, _ = ds.data_loaders(batch_size=5, split=(0.7, 0.2))
    batch = next(iter(loader))
    key = jax.random.PRNGKey(11)
    for tr in trainers:
        bd = tr.process_batch_data(batch)
        extra = tr.extra_params()
        # rows (5 or 5*16) x 4 processes don't divide a 24-way data axis
        padded, row_mask = pad_rows_to_divisible(bd, 24, 4)
        assert row_mask is not None, type(tr).__name__
        rows = int(row_mask.sum())
        assert rows == jax.tree_util.tree_leaves(bd)[0].shape[0]
        loss0, m0 = tr.loss_and_metrics(
            tr.model.params, padded, key, False, extra, row_mask=row_mask
        )
        assert np.isfinite(float(loss0)), type(tr).__name__

        def garble(x):
            # fill pad rows with copies of REAL rows (valid token/metadata
            # content that differs from the zero fill)
            x = np.array(x)
            n_pad = x.shape[0] - rows
            x[rows:] = x[np.arange(n_pad) % rows]
            return x

        garbled = jax.tree_util.tree_map(garble, padded)
        loss1, m1 = tr.loss_and_metrics(
            tr.model.params, garbled, key, False, extra, row_mask=row_mask
        )
        assert float(loss0) == float(loss1), type(tr).__name__
        assert float(m0["accuracy"]) == float(m1["accuracy"]), type(tr).__name__

    # the ARNN eval is deterministic (no sampling): padded+masked must
    # EQUAL the unpadded loss
    tr = trainers[2]
    bd = tr.process_batch_data(batch)
    base_loss, base_m = tr.loss_and_metrics(tr.model.params, bd, key, False)
    padded, row_mask = pad_rows_to_divisible(bd, 24, 4)
    pad_loss, pad_m = tr.loss_and_metrics(
        tr.model.params, padded, key, False, row_mask=row_mask
    )
    np.testing.assert_allclose(float(pad_loss), float(base_loss), rtol=1e-6)
    np.testing.assert_allclose(
        float(pad_m["accuracy"]), float(base_m["accuracy"]), rtol=1e-6
    )


def test_live_plot_png_headless(env, tmp_path, monkeypatch):
    """plot=True on a headless host renders the train/val curves to a PNG
    under runs/ every epoch (reference trainer.py:106-110 draws a live
    figure; the PNG is the headless equivalent)."""
    import glob

    ds, ckpt = env
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("DISPLAY", raising=False)
    model = _tiny_vae(ds, ckpt)
    trainer = VAETrainer(ds, model, lr=3e-3)
    trainer.train_model(batch_size=8, num_epochs=1, plot=True, split=(0.7, 0.2))
    pngs = glob.glob(str(tmp_path / "runs" / "MeasureVAE_*.png"))
    jsonls = glob.glob(str(tmp_path / "runs" / "MeasureVAE_*.jsonl"))
    assert len(pngs) == 1 and len(jsonls) == 1
    assert os.path.getsize(pngs[0]) > 1000  # a real rendered figure


def test_live_plot_curves_accumulate(tmp_path):
    """LivePlot.update accumulates epochs and rewrites the PNG."""
    from inpaintnet_tpu.utils.plotting import LivePlot

    png = str(tmp_path / "curves.png")
    lp = LivePlot(png, interactive=False)
    for e in range(3):
        lp.update(
            epoch_index=e, mean_loss_train=3.0 - e, mean_accuracy_train=0.1 * e,
            mean_loss_val=3.1 - e, mean_accuracy_val=0.1 * e,
        )
    assert lp.epochs == [0, 1, 2]
    assert os.path.exists(png)
    lp.close()


def test_numbered_checkpoint_roundtrip(env):
    """save_checkpoint's path loads back verbatim (np.savez silently
    appends .npz, which used to orphan the numbered checkpoints)."""
    ds, ckpt = env
    model = _tiny_vae(ds, ckpt)
    model.init(jax.random.PRNGKey(5))
    model.save_checkpoint(10)
    expected = model.filepath[:-4] + "_10.npz"
    assert os.path.exists(expected)
    model2 = _tiny_vae(ds, ckpt)
    model2.init(jax.random.PRNGKey(6))
    model2.load(model.filepath[:-4] + "_10")  # extensionless, like a user
    for a, b in zip(
        jax.tree_util.tree_leaves(model.params),
        jax.tree_util.tree_leaves(model2.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_resume_continues_epoch_numbering(env):
    """After load_state, train_model continues with ABSOLUTE epoch
    numbering ('true resume'): self.epoch counts completed epochs and a
    resumed run doesn't restart at 0."""
    ds, ckpt = env
    model = _tiny_vae(ds, ckpt)
    trainer = VAETrainer(ds, model, lr=3e-3)
    trainer.train_model(batch_size=8, num_epochs=2, split=(0.7, 0.2))
    assert trainer.epoch == 2
    model2 = _tiny_vae(ds, ckpt)
    model2.init(jax.random.PRNGKey(1))
    t2 = VAETrainer(ds, model2, lr=3e-3)
    t2.load_state()
    assert t2.epoch == 2
    t2.train_model(batch_size=8, num_epochs=1, split=(0.7, 0.2))
    assert t2.epoch == 3  # continued, not restarted


def test_vae_train_step_trainfast_matches_default(env, monkeypatch):
    """The minimal-residual trainfast recurrence (INPAINTNET_TRAIN_GRU_IMPL)
    reproduces the default train step: same loss, same updated params."""
    ds, ckpt = env

    def one_step(impl):
        if impl:
            monkeypatch.setenv("INPAINTNET_TRAIN_GRU_IMPL", impl)
        else:
            monkeypatch.delenv("INPAINTNET_TRAIN_GRU_IMPL", raising=False)
        model = _tiny_vae(ds, ckpt)
        model.init(jax.random.PRNGKey(3))
        trainer = VAETrainer(ds, model, lr=3e-3)
        assert trainer.train_gru_impl == (impl or None)
        trainer._build_steps()
        score = np.asarray(ds.arrays[0][:4])
        bd = trainer.process_batch_data((score, None))
        params, _, loss, _ = trainer._train_step(
            trainer.model.params, trainer.opt_state, bd,
            jax.random.PRNGKey(5), None,
        )
        return float(loss), jax.tree_util.tree_leaves(params)

    l_ref, p_ref = one_step(None)
    l_tf, p_tf = one_step("trainfast")
    np.testing.assert_allclose(l_tf, l_ref, rtol=1e-6)
    for a, b in zip(p_tf, p_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_vae_train_step_trainfast_pallas_matches_default(env, monkeypatch):
    """The adopted TPU default (trainfast + both Pallas kernels, forced by
    the "trainfast_pallas" scope — no env knobs) reproduces the default
    train step in interpret mode. On TPU this impl is the VAETrainer
    default (default_train_gru_impl); on CPU it must be opted into."""
    ds, ckpt = env
    monkeypatch.setenv("INPAINTNET_PALLAS_INTERPRET", "1")
    monkeypatch.delenv("INPAINTNET_TRAINFAST_FWD", raising=False)
    monkeypatch.delenv("INPAINTNET_TRAINFAST_BWD", raising=False)

    def one_step(impl):
        if impl:
            monkeypatch.setenv("INPAINTNET_TRAIN_GRU_IMPL", impl)
        else:
            monkeypatch.delenv("INPAINTNET_TRAIN_GRU_IMPL", raising=False)
        model = _tiny_vae(ds, ckpt)
        model.init(jax.random.PRNGKey(3))
        # single-device mesh: this test is about kernel-vs-scan MATH
        # parity in the jit path; the multi-device shard_map routing
        # (which decorrelates per-shard rng) is tests/test_mesh_trainfast
        trainer = VAETrainer(ds, model, lr=3e-3,
                             mesh=make_mesh(num_devices=1))
        trainer._build_steps()
        score = np.asarray(ds.arrays[0][:4])
        bd = trainer.process_batch_data((score, None))
        params, _, loss, _ = trainer._train_step(
            trainer.model.params, trainer.opt_state, bd,
            jax.random.PRNGKey(5), None,
        )
        return float(loss), jax.tree_util.tree_leaves(params)

    l_ref, p_ref = one_step(None)
    l_k, p_k = one_step("trainfast_pallas")
    np.testing.assert_allclose(l_k, l_ref, rtol=1e-5)
    for a, b in zip(p_k, p_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
