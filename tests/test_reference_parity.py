"""Parity against the ACTUAL reference implementation.

These tests ``sys.path``-import the reference's own torch modules from
/root/reference (MeasureVAE/encoder.py, decoder.py, LatentRNN/latent_rnn.py,
AnticipationRNN/anticipation_rnn_gauss_reg_model.py), port their live
``state_dict``s with ``models/torch_port.py``, and assert our forward passes
reproduce the reference outputs — no re-transcribed architectures anywhere
(those hand-built copies live in test_torch_port.py as fast unit tests; this
file is the ground truth).

music21/glob2 are not installed (and not needed for the model classes), so
the heavy data-layer imports the reference pulls in transitively are stubbed
out before import.
"""
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

REF = "/root/reference"


def _stub_module(name, **attrs):
    mod = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _install_reference():
    # the reference's model classes only touch music21 at data time; stub it
    # (and glob2) so importing the model modules works without the data deps
    m21 = _stub_module("music21", ABCHandlerException=Exception)
    for sub in ("interval", "meter", "note", "harmony", "expressions",
                "abcFormat", "converter", "stream", "key", "duration"):
        submod = _stub_module(f"music21.{sub}")
        setattr(m21, sub, submod)
    sys.modules["music21.abcFormat"].ABCHandlerException = type(
        "ABCHandlerException", (Exception,), {}
    )
    _stub_module("glob2", glob=lambda *a, **k: [])
    # pulled in by the reference's package __init__s (utils/trainer.py,
    # vae_tester.py); never exercised by these tests
    _stub_module("tensorboard_logger", configure=lambda *a, **k: None,
                 log_value=lambda *a, **k: None)
    if REF not in sys.path:
        sys.path.insert(0, REF)


_install_reference()

from MeasureVAE.decoder import HierarchicalDecoder as RefDecoder  # noqa: E402
from MeasureVAE.encoder import Encoder as RefEncoder  # noqa: E402
from MeasureVAE.measure_vae import MeasureVAE as RefMeasureVAE  # noqa: E402
from LatentRNN.latent_rnn import LatentRNN as RefLatentRNN  # noqa: E402
from AnticipationRNN.anticipation_rnn_gauss_reg_model import (  # noqa: E402
    ConstraintModelGaussianReg as RefARNN,
)

from inpaintnet_tpu.models.anticipation_rnn import (  # noqa: E402
    ConstraintModelGaussianReg,
)
from inpaintnet_tpu.models.latent_rnn import LatentRNN  # noqa: E402
from inpaintnet_tpu.models.measure_vae import (  # noqa: E402
    Encoder,
    HierarchicalDecoder,
    MeasureVAE,
)
from inpaintnet_tpu.models.torch_port import (  # noqa: E402
    port_anticipation_rnn,
    port_encoder,
    port_hierarchical_decoder,
    port_latent_rnn,
    port_measure_vae,
)

V, E, H, L, Z, B = 30, 10, 32, 2, 16, 4


class _FakeDataset:
    def __init__(self, vocab=V):
        self.note2index_dicts = [{f"t{i}": i for i in range(vocab)}]

    def __repr__(self):
        return "FakeDataset(refparity)"


def _prefix_sd(module, prefix):
    return {f"{prefix}.{k}": v for k, v in module.state_dict().items()}


# --------------------------------------------------------------------------- #
# MeasureVAE components (reference MeasureVAE/encoder.py + decoder.py)
# --------------------------------------------------------------------------- #

def test_reference_encoder_parity():
    torch.manual_seed(0)
    ref = RefEncoder(
        note_embedding_dim=E, rnn_hidden_size=H, num_layers=L, num_notes=V,
        dropout=0.0, bidirectional=True, z_dim=Z, rnn_class=torch.nn.GRU,
    ).eval()
    params = port_encoder(_prefix_sd(ref, "encoder"), num_layers=L)
    ours = Encoder(E, H, L, V, dropout=0.0, bidirectional=True, z_dim=Z)

    score = np.random.RandomState(0).randint(0, V, (B, 24))
    with torch.no_grad():
        dist_t = ref(torch.from_numpy(score))
    dist_j = ours.apply(params, jnp.asarray(score), train=False)
    np.testing.assert_allclose(np.asarray(dist_j.loc), dist_t.loc.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dist_j.scale), dist_t.scale.numpy(), atol=1e-5
    )


@pytest.fixture(scope="module")
def ref_decoder():
    torch.manual_seed(1)
    return RefDecoder(
        note_embedding_dim=E, num_notes=V, z_dim=Z, num_layers=L,
        rnn_hidden_size=H, dropout=0.0, rnn_class=torch.nn.GRU,
    ).eval()


def test_reference_decoder_teacher_forced_parity(ref_decoder):
    params = port_hierarchical_decoder(_prefix_sd(ref_decoder, "decoder"),
                                       num_layers=L)
    ours = HierarchicalDecoder(E, V, Z, L, H, dropout=0.0)
    rs = np.random.RandomState(1)
    z = rs.randn(B, Z).astype(np.float32)
    score = rs.randint(0, V, (B, 24))
    ref_decoder.teacher_forcing_prob = 1.1  # force the TF branch
    with torch.no_grad():
        w_t, _ = ref_decoder(torch.from_numpy(z), torch.from_numpy(score),
                             train=True)
    w_j, _ = ours.decode_teacher_forced(
        params, jnp.asarray(z), jnp.asarray(score), train=False,
        rng=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(w_j), w_t.numpy(), atol=1e-4)


def test_reference_decoder_sampling_parity(ref_decoder):
    """train=False decode is deterministic (argmax): the whole 24-step
    sampling scan — hidden resets, ReLU head, autoregressive feedback —
    must reproduce the reference's doubly-nested Python loop exactly."""
    params = port_hierarchical_decoder(_prefix_sd(ref_decoder, "decoder"),
                                       num_layers=L)
    ours = HierarchicalDecoder(E, V, Z, L, H, dropout=0.0)
    rs = np.random.RandomState(2)
    z = rs.randn(B, Z).astype(np.float32)
    dummy = torch.zeros(B, 24)
    with torch.no_grad():
        w_t, s_t = ref_decoder(torch.from_numpy(z), dummy, train=False)
    w_j, s_j = ours.decode_sampling(params, jnp.asarray(z), train=False,
                                    rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(s_j), s_t.numpy().reshape(B, 24))
    np.testing.assert_allclose(np.asarray(w_j), w_t.numpy(), atol=1e-4)


# --------------------------------------------------------------------------- #
# LatentRNN (reference LatentRNN/latent_rnn.py) — generation path over the
# frozen reference VAE, bypassing the stochastic encoders (fixed z inputs)
# --------------------------------------------------------------------------- #

def test_reference_latent_rnn_generation_parity():
    torch.manual_seed(3)
    ds = _FakeDataset()
    ref_vae = RefMeasureVAE(
        ds, note_embedding_dim=E, num_encoder_layers=L, encoder_hidden_size=H,
        encoder_dropout_prob=0.0, latent_space_dim=Z, num_decoder_layers=L,
        decoder_hidden_size=H, decoder_dropout_prob=0.0,
    )
    ref = RefLatentRNN(
        ds, ref_vae, num_rnn_layers=L, rnn_hidden_size=H, dropout=0.0,
        rnn_class=torch.nn.GRU, auto_reg=False,
    ).eval()

    vae_ours = MeasureVAE(
        ds, note_embedding_dim=E, num_encoder_layers=L, encoder_hidden_size=H,
        encoder_dropout_prob=0.0, latent_space_dim=Z, num_decoder_layers=L,
        decoder_hidden_size=H, decoder_dropout_prob=0.0,
    )
    vae_ours.params = port_measure_vae(
        {k[len("vae_model."):]: v for k, v in ref.state_dict().items()
         if k.startswith("vae_model.")}
    )
    ours = LatentRNN(ds, vae_ours, num_rnn_layers=L, rnn_hidden_size=H,
                     dropout=0.0, auto_reg=False, max_target=3)
    ours.params = port_latent_rnn(ref.state_dict(), num_layers=L, auto_reg=False)

    rs = np.random.RandomState(3)
    zp = rs.randn(B, 5, Z).astype(np.float32)
    zf = rs.randn(B, 7, Z).astype(np.float32)
    n_gen = 3
    with torch.no_grad():
        cp = ref.forward_context(torch.from_numpy(zp), type="past")
        cf = ref.forward_context(torch.from_numpy(zf), type="future")
        comb = torch.cat((cp, cf), 2)
        w_t, s_t, z_t = ref.forward_generation(
            comb, n_gen, seed=torch.from_numpy(zp[:, -1:, :]),
            measure_seq_len=24, teacher_forcing=False,
        )

    cp_j = ours.forward_context(ours.params, jnp.asarray(zp), jnp.ones((B, 5)),
                                "past", train=False, rng=None)
    cf_j = ours.forward_context(ours.params, jnp.asarray(zf), jnp.ones((B, 7)),
                                "future", train=False, rng=None)
    comb_j = ours._combine_contexts(cp_j, cf_j)
    w_j, s_j, z_j = ours._generate_parallel(
        ours.params, vae_ours.params, comb_j, jnp.ones((B, n_gen)),
        seed=None, train=False, rng=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(z_j), z_t.numpy(), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(s_j), s_t.numpy().reshape(B, n_gen, 24)
    )
    np.testing.assert_allclose(np.asarray(w_j), w_t.numpy(), atol=1e-4)


# --------------------------------------------------------------------------- #
# AnticipationRNN (reference anticipation_rnn_gauss_reg_model.py)
# --------------------------------------------------------------------------- #

class _Md:
    num_values = 8
    name = "md"


class _ArnnDataset:
    note2index_dicts = [{f"t{i}": i for i in range(V)}]
    metadatas = [_Md(), _Md()]
    num_voices = 1

    def empty_score_tensor(self, length):
        return torch.zeros(1, length, dtype=torch.long)

    def __repr__(self):
        return "ArnnFake"


MD_DIM = 6
T_ARNN = 48


def _build_arnn_pair(dropout_input=0.0):
    torch.manual_seed(4)
    ds = _ArnnDataset()
    ref = RefARNN(
        ds, note_embedding_dim=E, metadata_embedding_dim=MD_DIM,
        num_lstm_constraints_units=H, num_lstm_generation_units=H,
        linear_hidden_size=12, num_layers=2, dropout_input_prob=dropout_input,
        dropout_prob=0.0, unary_constraint=True,
    ).eval()
    ours = ConstraintModelGaussianReg(
        ds, note_embedding_dim=E, metadata_embedding_dim=MD_DIM,
        num_lstm_constraints_units=H, num_lstm_generation_units=H,
        linear_hidden_size=12, num_layers=2, dropout_input_prob=dropout_input,
        dropout_prob=0.0, unary_constraint=True,
    )
    params = port_anticipation_rnn(ref.state_dict(), num_layers=2,
                                   num_metadata=3)
    return ref, ours, params


def test_reference_arnn_teacher_forced_parity():
    ref, ours, params = _build_arnn_pair()
    rs = np.random.RandomState(4)
    score = rs.randint(0, V, (B, T_ARNN))
    md = rs.randint(0, 8, (B, T_ARNN, 3))
    md[:, :, 2] = 0  # trailing channel is the voice id (num_voices == 1)
    loc = np.ones((B, T_ARNN), np.int64)
    loc[:, 20:30] = 0
    with torch.no_grad():
        w_t, _ = ref._forward_tf(
            torch.from_numpy(score[:, None, :]),
            torch.from_numpy(md[:, None, :, :]),
            torch.from_numpy(loc[:, None, :]),
        )
    w_j = ours.forward_tf(
        params, jnp.asarray(score), jnp.asarray(md), jnp.asarray(loc),
        train=False, rng=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(w_j), w_t[0].numpy(), atol=1e-4)


class _ZeroStartARNN(ConstraintModelGaussianReg):
    """Test-only: the reference's burn-in feeds a ZEROS embedding at tick 0
    (forward_inpaint offset_seq, :428-433); our production model uses the
    START token embedding (documented deliberate fix). Equalize to compare
    the rest of the machinery exactly."""

    def _start_embedding(self, params, batch):
        return jnp.zeros((batch, self.note_embedding_dim))


def test_reference_arnn_inpaint_burn_in_equivalence():
    """VERDICT #6: our single force-mask scan must equal the reference's
    explicit past-burn-in + per-tick argmax decode (forward_inpaint,
    :261-346). B=1 because the reference decodes batch element 0 only."""
    torch.manual_seed(4)
    ds = _ArnnDataset()
    ref = RefARNN(
        ds, note_embedding_dim=E, metadata_embedding_dim=MD_DIM,
        num_lstm_constraints_units=H, num_lstm_generation_units=H,
        linear_hidden_size=12, num_layers=2, dropout_input_prob=0.0,
        dropout_prob=0.0, unary_constraint=True,
    ).eval()
    ours = _ZeroStartARNN(
        ds, note_embedding_dim=E, metadata_embedding_dim=MD_DIM,
        num_lstm_constraints_units=H, num_lstm_generation_units=H,
        linear_hidden_size=12, num_layers=2, dropout_input_prob=0.0,
        dropout_prob=0.0, unary_constraint=True,
    )
    params = port_anticipation_rnn(ref.state_dict(), num_layers=2,
                                   num_metadata=3)

    rs = np.random.RandomState(5)
    start, end = 18, 30
    score = rs.randint(0, V, (1, T_ARNN))
    md = rs.randint(0, 8, (1, T_ARNN, 3))
    md[:, :, 2] = 0  # trailing channel is the voice id (num_voices == 1)
    loc = np.ones((1, T_ARNN), np.int64)
    loc[:, start:end] = 0
    with torch.no_grad():
        w_t, gen_t = ref.forward_inpaint(
            torch.from_numpy(score[:, None, :]),
            torch.from_numpy(md[:, None, :, :]),
            torch.from_numpy(loc[:, None, :]),
            start_tick=start, end_tick=end,
        )
    logits_j, tokens_j = ours.apply_inpaint(
        params, jnp.asarray(score), jnp.asarray(md), jnp.asarray(loc),
        train=False, rng=jax.random.PRNGKey(0),
    )
    # reference emits weights/tokens for the decoded span only
    np.testing.assert_array_equal(
        np.asarray(tokens_j)[:, start:end], gen_t[:, 0, start:end].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(logits_j)[:, start:end], w_t[0].numpy(), atol=1e-4
    )
    # context ticks pass ground truth through unchanged
    np.testing.assert_array_equal(
        np.asarray(tokens_j)[:, :start], score[:, :start]
    )
    np.testing.assert_array_equal(
        np.asarray(tokens_j)[:, end:], score[:, end:]
    )
