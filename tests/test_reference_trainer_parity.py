"""TRAINER-level parity against the ACTUAL reference trainers (CPU torch).

Round-2 verdict item #1: forward passes were already pinned against the
real reference modules (test_reference_parity.py); this family closes the
last unverified semantic layer — the training-step semantics. It drives the
reference's own ``loss_and_acc_for_batch`` implementations
(/root/reference/MeasureVAE/vae_trainer.py:16-40,
LatentRNN/latent_rnn_trainer.py:36-67,
AnticipationRNN/anticipation_rnn_trainer.py:21-49,185-210) on ported
weights and identical batches and asserts:

(a) loss/accuracy VALUE equality vs our ``loss_and_metrics``, with
    sampling neutralized (rsample -> mean monkeypatched on BOTH frameworks,
    teacher-forcing coin forced, dropout 0);
(b) multi-epoch TRAINING TRAJECTORIES agree: the reference's
    zero_grad/backward/step loop (utils/trainer.py:126-163, torch Adam)
    vs our jitted optax train step produce the same per-epoch mean
    loss/accuracy curves on the same data.

No trained reference checkpoint exists anywhere (SURVEY §6), so same-data
trajectory agreement is the ceiling for cross-framework training parity.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

# installs the music21/glob2/tensorboard_logger stubs + /root/reference on
# sys.path at import time, and re-exports the reference model classes
import test_reference_parity as refpar  # noqa: F401

from MeasureVAE.measure_vae import MeasureVAE as RefMeasureVAE  # noqa: E402
from MeasureVAE.vae_trainer import VAETrainer as RefVAETrainer  # noqa: E402
from LatentRNN.latent_rnn import LatentRNN as RefLatentRNN  # noqa: E402
from LatentRNN.latent_rnn_trainer import (  # noqa: E402
    LatentRNNTrainer as RefLatentRNNTrainer,
)
from AnticipationRNN.anticipation_rnn_gauss_reg_model import (  # noqa: E402
    ConstraintModelGaussianReg as RefARNN,
)
from AnticipationRNN.anticipation_rnn_trainer import (  # noqa: E402
    AnticipationRNNBaselineTrainer as RefARNNBaselineTrainer,
    AnticipationRNNGaussianRegTrainer as RefARNNRegTrainer,
)

from inpaintnet_tpu.models.anticipation_rnn import (  # noqa: E402
    ConstraintModelGaussianReg,
)
from inpaintnet_tpu.models.latent_rnn import LatentRNN  # noqa: E402
from inpaintnet_tpu.models.measure_vae import MeasureVAE  # noqa: E402
from inpaintnet_tpu.models.torch_port import (  # noqa: E402
    port_anticipation_rnn,
    port_latent_rnn,
    port_measure_vae,
)
from inpaintnet_tpu.ops import distributions as _dist  # noqa: E402
from inpaintnet_tpu.train.arnn_trainer import (  # noqa: E402
    AnticipationRNNBaselineTrainer,
    AnticipationRNNGaussianRegTrainer,
)
from inpaintnet_tpu.train.latent_rnn_trainer import (  # noqa: E402
    LatentRNNTrainer,
    pack_padded,
    split_score,
)
from inpaintnet_tpu.train.vae_trainer import VAETrainer  # noqa: E402

V, E, H, L, Z, B = 30, 10, 32, 2, 16, 8
NBARS, MSL = 9, 24
T = NBARS * MSL
MD_DIM, NUM_MD_VALUES = 6, 8


@pytest.fixture
def neutral_sampling(monkeypatch):
    """rsample -> distribution mean on BOTH frameworks.

    The stochastic z draw is the one sampling step that influences the loss
    value (TF coins are forced separately; decoder sample tokens never feed
    the loss). With it neutralized, both training steps are deterministic
    functions of (weights, batch)."""
    monkeypatch.setattr(
        _dist.DiagNormal, "rsample", lambda self, key: self.loc
    )
    monkeypatch.setattr(
        torch.distributions.Normal,
        "rsample",
        lambda self, sample_shape=torch.Size(): self.loc,
    )


class _TrainerDataset:
    """Minimal dataset stub carrying the attributes the trainer layer reads."""

    note2index_dicts = [{f"t{i}": i for i in range(V)}]
    n_bars = NBARS
    subdivision = 6
    num_beats_per_bar = 4

    def __repr__(self):
        return "TrainerParityFake"


class _ArnnTrainerDataset(_TrainerDataset):
    class _Md:
        num_values = NUM_MD_VALUES
        name = "md"

    metadatas = [_Md(), _Md()]
    num_voices = 1

    def empty_score_tensor(self, length):
        return torch.zeros(1, length, dtype=torch.long)


class _ListLoader(list):
    def __init__(self, batches, batch_size):
        super().__init__(batches)
        self.batch_size = batch_size


def _vae_pair(seed=11):
    torch.manual_seed(seed)
    ds = _TrainerDataset()
    kw = dict(
        note_embedding_dim=E, num_encoder_layers=L, encoder_hidden_size=H,
        encoder_dropout_prob=0.0, latent_space_dim=Z, num_decoder_layers=L,
        decoder_hidden_size=H, decoder_dropout_prob=0.0,
    )
    ref = RefMeasureVAE(ds, **kw)
    ours = MeasureVAE(ds, **kw)
    ours.params = port_measure_vae(ref.state_dict())
    # force the teacher-forcing branch on both sides (reference coin:
    # random.random() < prob, decoder.py:431-434; ours: bernoulli(prob))
    ref.decoder.teacher_forcing_prob = 1.1
    ours.decoder.teacher_forcing_prob = 1.0
    return ds, ref, ours


def _latent_rnn_pair(seed=13):
    torch.manual_seed(seed)
    ds = _TrainerDataset()
    vae_kw = dict(
        note_embedding_dim=E, num_encoder_layers=L, encoder_hidden_size=H,
        encoder_dropout_prob=0.0, latent_space_dim=Z, num_decoder_layers=L,
        decoder_hidden_size=H, decoder_dropout_prob=0.0,
    )
    ref_vae = RefMeasureVAE(ds, **vae_kw)
    ref = RefLatentRNN(
        ds, ref_vae, num_rnn_layers=L, rnn_hidden_size=H, dropout=0.0,
        rnn_class=torch.nn.GRU, auto_reg=False,
    )
    vae_ours = MeasureVAE(ds, **vae_kw)
    vae_ours.params = port_measure_vae(
        {k[len("vae_model."):]: v for k, v in ref.state_dict().items()
         if k.startswith("vae_model.")}
    )
    ours = LatentRNN(ds, vae_ours, num_rnn_layers=L, rnn_hidden_size=H,
                     dropout=0.0, auto_reg=False, max_target=6)
    ours.params = port_latent_rnn(ref.state_dict(), num_layers=L,
                                  auto_reg=False)
    return ds, ref, ours


def _arnn_pair(seed=17):
    torch.manual_seed(seed)
    ds = _ArnnTrainerDataset()
    kw = dict(
        note_embedding_dim=E, metadata_embedding_dim=MD_DIM,
        num_lstm_constraints_units=H, num_lstm_generation_units=H,
        linear_hidden_size=12, num_layers=L, dropout_input_prob=0.0,
        dropout_prob=0.0, unary_constraint=True,
    )
    ref = RefARNN(ds, **kw).eval()
    ours = ConstraintModelGaussianReg(ds, **kw)
    ours.params = port_anticipation_rnn(ref.state_dict(), num_layers=L,
                                        num_metadata=3)
    # force teacher forcing (reference coin: random.random() <= prob, :428)
    ref.teacher_forcing_prob = 2.0
    ours.teacher_forcing_prob = 1.0
    ref.train()  # trainer-path forward runs in train mode
    return ds, ref, ours


def _arnn_batch(rs, batch=B):
    score = rs.randint(0, V, (batch, T))
    md = rs.randint(0, NUM_MD_VALUES, (batch, T, 3))
    md[:, :, 2] = 0  # trailing channel is the voice id (num_voices == 1)
    return score, md


def _span_mask(num_past, num_target, batch=B):
    """The trainers' contiguous constraint mask
    (anticipation_rnn_trainer.py:93-128 semantics, fixed sizes)."""
    loc = np.zeros((batch, T), dtype=np.int64)
    start = (num_past + 1) * MSL
    end = start + num_target * MSL
    loc[:, :start] = 1
    if end < T - 1:
        loc[:, end:] = 1
    return loc


# --------------------------------------------------------------------------- #
# (a) loss/accuracy VALUE parity on identical batches
# --------------------------------------------------------------------------- #

@pytest.mark.parametrize("train", [True, False])
def test_vae_trainer_loss_value_parity(neutral_sampling, train):
    """VAETrainer.loss_and_acc_for_batch (vae_trainer.py:16-40) ==
    our VAETrainer.loss_and_metrics: ELBO reduction (CE mean over elements
    + beta=0.001 * KLD sum-over-z mean-over-batch) and accuracy."""
    ds, ref, ours = _vae_pair()
    ref_tr = RefVAETrainer(ds, ref, lr=1e-4)
    our_tr = VAETrainer(ds, ours, lr=1e-4)
    score = np.random.RandomState(0).randint(0, V, (B, MSL))
    with torch.no_grad():
        loss_t, acc_t = ref_tr.loss_and_acc_for_batch(
            torch.from_numpy(score), train=train
        )
    loss_j, metrics = our_tr.loss_and_metrics(
        ours.params, score.astype(np.int32), jax.random.PRNGKey(0), train
    )
    np.testing.assert_allclose(float(loss_j), float(loss_t), atol=2e-5)
    np.testing.assert_allclose(
        float(metrics["accuracy"]), float(acc_t), atol=1e-6
    )


@pytest.mark.parametrize("train", [True, False])
def test_latent_rnn_trainer_loss_value_parity(neutral_sampling, train):
    """LatentRNNTrainer.loss_and_acc_for_batch (latent_rnn_trainer.py:36-67)
    == ours on a fixed past/target/future split: target-only 4-D CE and
    accuracy over our padded/masked buffers equal the reference's
    exactly-sized tensors."""
    ds, ref, ours = _latent_rnn_pair()
    ref_tr = RefLatentRNNTrainer(ds, ref, lr=1e-4)
    our_tr = LatentRNNTrainer(ds, ours, lr=1e-4)
    rs = np.random.RandomState(1)
    score = rs.randint(0, V, (B, 1, T))
    num_past, num_target = 2, 4
    num_future = NBARS - num_past - num_target
    past, future, target = split_score(score, num_past, num_future,
                                       num_target, MSL)
    with torch.no_grad():
        loss_t, acc_t = ref_tr.loss_and_acc_for_batch(
            tuple(torch.from_numpy(np.ascontiguousarray(x))
                  for x in (past, future, target)),
            train=train,
        )
    packed = pack_padded(past, future, target, our_tr.max_context,
                         our_tr.max_num_measure_target)
    loss_j, metrics = our_tr.loss_and_metrics(
        ours.params, packed, jax.random.PRNGKey(0), train,
        extra=ours.vae_model.params,
    )
    np.testing.assert_allclose(float(loss_j), float(loss_t), atol=2e-5)
    np.testing.assert_allclose(
        float(metrics["accuracy"]), float(acc_t), atol=1e-6
    )


@pytest.mark.parametrize("trainer_cls", ["reg", "baseline"])
def test_arnn_trainer_loss_value_parity(trainer_cls):
    """ARNN trainers' loss_and_acc_for_batch
    (anticipation_rnn_trainer.py:21-49, shared by the baseline subclass)
    == ours: CE/accuracy on unconstrained ticks only, teacher forced.
    Covers both constraint-mask schemes (span / scattered Bernoulli)."""
    ds, ref, ours = _arnn_pair()
    rs = np.random.RandomState(2)
    score, md = _arnn_batch(rs)
    if trainer_cls == "reg":
        ref_tr = RefARNNRegTrainer(ds, ref, lr=1e-4)
        our_tr = AnticipationRNNGaussianRegTrainer(ds, ours, lr=1e-4)
        loc = _span_mask(num_past=2, num_target=3)
        start_tick, end_tick = 3 * MSL, 6 * MSL
    else:
        ref_tr = RefARNNBaselineTrainer(ds, ref, lr=1e-4)
        our_tr = AnticipationRNNBaselineTrainer(ds, ours, lr=1e-4)
        # one scattered mask shared across the batch (reference :201-202)
        single = (rs.random_sample(T) < 0.25).astype(np.int64)
        loc = np.broadcast_to(single[None], (B, T)).copy()
        start_tick = end_tick = None
    ref_batch = (
        torch.from_numpy(score[:, None, :]),
        torch.from_numpy(md[:, None, :, :]),
        torch.from_numpy(loc[:, None, :]),
        start_tick,
        end_tick,
    )
    with torch.no_grad():
        loss_t, acc_t = ref_tr.loss_and_acc_for_batch(ref_batch, train=True)
    loss_j, metrics = our_tr.loss_and_metrics(
        ours.params,
        (score.astype(np.int32), md.astype(np.int32), loc.astype(np.int32)),
        jax.random.PRNGKey(0),
        True,
    )
    np.testing.assert_allclose(float(loss_j), float(loss_t), atol=2e-5)
    np.testing.assert_allclose(
        float(metrics["accuracy"]), float(acc_t), atol=1e-6
    )


# --------------------------------------------------------------------------- #
# (b) same-data training-trajectory parity (torch Adam vs optax Adam)
# --------------------------------------------------------------------------- #

def _assert_curves(ours, ref, *, loss_cols, acc_cols):
    """Losses must agree to float32 accumulation noise (measured ~5e-7 over
    8 epochs — see docs/PARITY.md); accuracies get a looser bound because a
    near-tie argmax can flip a single token under fp reordering, which
    quantizes to 1/(valid positions)."""
    np.testing.assert_allclose(
        ours[:, loss_cols], ref[:, loss_cols], rtol=0, atol=1e-4
    )
    np.testing.assert_allclose(
        ours[:, acc_cols], ref[:, acc_cols], rtol=0, atol=5e-3
    )


def _ref_epoch(ref_tr, batches, train=True):
    """The reference's epoch loop (utils/trainer.py:126-163) verbatim:
    zero_grad -> loss_and_acc_for_batch -> backward -> step, mean over
    batches."""
    mean_loss = mean_acc = 0.0
    for batch in batches:
        ref_tr.zero_grad()
        loss, acc = ref_tr.loss_and_acc_for_batch(batch, train=train)
        if train:
            loss.backward()
            ref_tr.step()
        mean_loss += float(loss.detach())
        mean_acc += float(acc)
    return mean_loss / len(batches), mean_acc / len(batches)


def run_vae_trajectory(num_epochs=3, num_batches=5, seed=3):
    """Shared by the test below and benchmarks/trainer_parity_trajectory.py
    (which renders the docs table). Returns (ref_curve, ours_curve) of
    (train_loss, train_acc, val_loss) per epoch."""
    ds, ref, ours = _vae_pair()
    ref_tr = RefVAETrainer(ds, ref, lr=1e-4)
    our_tr = VAETrainer(ds, ours, lr=1e-4)
    rs = np.random.RandomState(seed)
    scores = rs.randint(0, V, (num_batches, B, 1, MSL))
    val = rs.randint(0, V, (2, B, 1, MSL))
    loader = _ListLoader([(s, 0) for s in scores], batch_size=B)
    val_loader = _ListLoader([(s, 0) for s in val], batch_size=B)

    ref_curve, ours_curve = [], []
    for _ in range(num_epochs):
        tl, ta = _ref_epoch(
            ref_tr, [torch.from_numpy(s.reshape(B, MSL)) for s in scores],
            train=True,
        )
        with torch.no_grad():
            vl, _ = _ref_epoch(
                ref_tr, [torch.from_numpy(s.reshape(B, MSL)) for s in val],
                train=False,
            )
        ref_curve.append((tl, ta, vl))
        otl, ota = our_tr.loss_and_acc_on_epoch(loader, train=True)
        ovl, _ = our_tr.loss_and_acc_on_epoch(val_loader, train=False)
        ours_curve.append((otl, ota, ovl))
    return np.asarray(ref_curve), np.asarray(ours_curve)


def test_vae_training_trajectory_parity(neutral_sampling):
    """N epochs of the reference's torch-Adam loop vs our jitted optax-Adam
    step on identical data and initial weights: per-epoch train/val NLL and
    accuracy curves must track."""
    ref_curve, ours_curve = run_vae_trajectory()
    _assert_curves(ours_curve, ref_curve, loss_cols=(0, 2), acc_cols=(1,))


class _FixedMaskARNNTrainer(AnticipationRNNGaussianRegTrainer):
    """Our ARNN trainer with the stochastic constraint placement replaced by
    a precomputed per-batch mask sequence (so both frameworks see identical
    masks)."""

    def __init__(self, *args, locs=None, **kw):
        super().__init__(*args, **kw)
        self._locs = locs
        self._i = 0

    def process_batch_data(self, batch):
        score = np.asarray(batch[0])
        md = np.asarray(batch[1])
        loc = self._locs[self._i % len(self._locs)]
        self._i += 1
        return (
            score.astype(np.int32),
            md.astype(np.int32),
            loc.astype(np.int32),
        )


def run_arnn_trajectory(num_epochs=3, num_batches=4, seed=5):
    ds, ref, ours = _arnn_pair()
    ref_tr = RefARNNRegTrainer(ds, ref, lr=1e-4)
    rs = np.random.RandomState(seed)
    data = [_arnn_batch(rs) for _ in range(num_batches)]
    # deterministic mask schedule shared by both frameworks
    spans = [(1, 3), (2, 4), (4, 2), (3, 3)]
    locs = [_span_mask(p, t) for p, t in spans]
    our_tr = _FixedMaskARNNTrainer(ds, ours, lr=1e-4, locs=locs)
    loader = _ListLoader(
        [(score, md) for score, md in data], batch_size=B
    )

    ref_curve, ours_curve = [], []
    for _ in range(num_epochs):
        ref_batches = [
            (
                torch.from_numpy(score[:, None, :]),
                torch.from_numpy(md[:, None, :, :]),
                torch.from_numpy(locs[i][:, None, :]),
                None,
                None,
            )
            for i, (score, md) in enumerate(data)
        ]
        ref_curve.append(_ref_epoch(ref_tr, ref_batches, train=True))
        our_tr._i = 0
        ours_curve.append(our_tr.loss_and_acc_on_epoch(loader, train=True))
    return np.asarray(ref_curve), np.asarray(ours_curve)


def test_arnn_training_trajectory_parity():
    """Fully deterministic once TF is forced (no rsample anywhere): the
    two frameworks' Adam trajectories on identical masks must track."""
    ref_curve, ours_curve = run_arnn_trajectory()
    _assert_curves(ours_curve, ref_curve, loss_cols=(0,), acc_cols=(1,))


class _FixedSplitLatentRNNTrainer(LatentRNNTrainer):
    """Our LatentRNN trainer with the stochastic split replaced by a shared
    deterministic schedule."""

    def __init__(self, *args, splits=None, **kw):
        super().__init__(*args, **kw)
        self._splits = splits
        self._i = 0

    def process_batch_data(self, batch):
        num_past, num_target = self._splits[self._i % len(self._splits)]
        self._i += 1
        score = np.asarray(batch[0])
        num_future = self.dataset.n_bars - num_past - num_target
        past, future, target = split_score(
            score, num_past, num_future, num_target, self.measure_seq_len
        )
        return pack_padded(past, future, target, self.max_context,
                           self.max_num_measure_target)


def run_latent_rnn_trajectory(num_epochs=2, num_batches=4, seed=7):
    ds, ref, ours = _latent_rnn_pair()
    ref_tr = RefLatentRNNTrainer(ds, ref, lr=1e-4)
    rs = np.random.RandomState(seed)
    scores = rs.randint(0, V, (num_batches, B, 1, T))
    splits = [(2, 4), (3, 2), (1, 6), (4, 3)]
    our_tr = _FixedSplitLatentRNNTrainer(ds, ours, lr=1e-4, splits=splits)
    loader = _ListLoader([(s, 0) for s in scores], batch_size=B)

    ref_curve, ours_curve = [], []
    for _ in range(num_epochs):
        ref_batches = []
        for i, s in enumerate(scores):
            num_past, num_target = splits[i % len(splits)]
            num_future = NBARS - num_past - num_target
            past, future, target = split_score(s, num_past, num_future,
                                               num_target, MSL)
            ref_batches.append(
                tuple(torch.from_numpy(np.ascontiguousarray(x))
                      for x in (past, future, target))
            )
        ref_curve.append(_ref_epoch(ref_tr, ref_batches, train=True))
        our_tr._i = 0
        ours_curve.append(our_tr.loss_and_acc_on_epoch(loader, train=True))
    return np.asarray(ref_curve), np.asarray(ours_curve)


def test_latent_rnn_training_trajectory_parity(neutral_sampling):
    """Gradients flow only to the LatentRNN (frozen VAE on both sides:
    requires_grad=False vs stop_gradient); trajectories must track."""
    ref_curve, ours_curve = run_latent_rnn_trajectory()
    _assert_curves(ours_curve, ref_curve, loss_cols=(0,), acc_cols=(1,))


# --------------------------------------------------------------------------- #
# auto_reg generation parity (the third generation mode): the sampled
# decode->re-encode loop (reference forward_generation else-branch,
# latent_rnn.py:241-260) vs our peeled lax.scan — EXACT once rsample is
# neutralized (argmax decode is deterministic).
# --------------------------------------------------------------------------- #

def test_reference_latent_rnn_autoreg_generation_parity(neutral_sampling):
    torch.manual_seed(23)
    ds = _TrainerDataset()
    vae_kw = dict(
        note_embedding_dim=E, num_encoder_layers=L, encoder_hidden_size=H,
        encoder_dropout_prob=0.0, latent_space_dim=Z, num_decoder_layers=L,
        decoder_hidden_size=H, decoder_dropout_prob=0.0,
    )
    from MeasureVAE.measure_vae import MeasureVAE as RefVAE

    ref_vae = RefVAE(ds, **vae_kw)
    ref = RefLatentRNN(
        ds, ref_vae, num_rnn_layers=L, rnn_hidden_size=H, dropout=0.0,
        rnn_class=torch.nn.GRU, auto_reg=True,
    ).eval()
    from inpaintnet_tpu.models.torch_port import port_latent_rnn

    vae_ours = MeasureVAE(ds, **vae_kw)
    vae_ours.params = port_measure_vae(
        {k[len("vae_model."):]: v for k, v in ref.state_dict().items()
         if k.startswith("vae_model.")}
    )
    ours = LatentRNN(ds, vae_ours, num_rnn_layers=L, rnn_hidden_size=H,
                     dropout=0.0, auto_reg=True, max_target=4)
    ours.params = port_latent_rnn(ref.state_dict(), num_layers=L,
                                  auto_reg=True)

    rs = np.random.RandomState(29)
    zp = rs.randn(B, 5, Z).astype(np.float32)
    zf = rs.randn(B, 7, Z).astype(np.float32)
    n_gen = 4
    with torch.no_grad():
        cp = ref.forward_context(torch.from_numpy(zp), type="past")
        cf = ref.forward_context(torch.from_numpy(zf), type="future")
        comb = torch.cat((cp, cf), 2)
        w_t, s_t, z_t = ref.forward_generation(
            comb, n_gen, seed=torch.from_numpy(zp[:, -1:, :]),
            measure_seq_len=24, teacher_forcing=False,
        )

    cp_j = ours.forward_context(ours.params, jnp.asarray(zp),
                                jnp.ones((B, 5)), "past", train=False,
                                rng=None)
    cf_j = ours.forward_context(ours.params, jnp.asarray(zf),
                                jnp.ones((B, 7)), "future", train=False,
                                rng=None)
    comb_j = ours._combine_contexts(cp_j, cf_j)
    w_j, s_j, z_j = ours._generate_autoregressive(
        ours.params, vae_ours.params, comb_j, jnp.ones((B, n_gen)),
        seed=jnp.asarray(zp[:, -1:, :]), train=False,
        rng=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(z_j), z_t.numpy(), atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(s_j), s_t.numpy().reshape(B, n_gen, 24)
    )
    np.testing.assert_allclose(np.asarray(w_j), w_t.numpy(), atol=1e-3)
