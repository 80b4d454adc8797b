"""Export direction of the checkpoint converter: framework pytrees ->
reference-format torch ``state_dict``s (models/torch_port.py export_*).

Two guarantees, each tested against the ACTUAL reference classes (imported
from /root/reference via test_reference_parity's stub machinery):

1. exact inverse: ``port(export(params)) == params`` leaf-for-leaf;
2. reference-loadable: ``ref.load_state_dict(exported, strict=True)``
   succeeds (every key the reference module owns, correct shapes) AND the
   reference forward then reproduces our outputs — i.e. a model trained in
   this framework runs identically in the reference implementation
   (utils/model.py:16-53 checkpoints are plain state_dict saves).
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch

import test_reference_parity as rp  # installs /root/reference + stubs

from inpaintnet_tpu.models.anticipation_rnn import (  # noqa: E402
    ConstraintModelGaussianReg,
)
from inpaintnet_tpu.models.latent_rnn import LatentRNN  # noqa: E402
from inpaintnet_tpu.models.measure_vae import Encoder, MeasureVAE  # noqa: E402
from inpaintnet_tpu.models.torch_port import (  # noqa: E402
    export_anticipation_rnn,
    export_latent_rnn,
    export_measure_vae,
    load_torch_checkpoint,
    port_anticipation_rnn,
    port_latent_rnn,
    port_measure_vae,
    save_torch_checkpoint,
)

V, E, H, L, Z, B = rp.V, rp.E, rp.H, rp.L, rp.Z, rp.B


def _tree_assert_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=0,
                                   atol=0)


def _torch_sd(sd):
    return {k: torch.from_numpy(np.array(v, copy=True))
            for k, v in sd.items()}


def _our_vae(ds):
    vae = MeasureVAE(
        ds, note_embedding_dim=E, num_encoder_layers=L,
        encoder_hidden_size=H, encoder_dropout_prob=0.0,
        latent_space_dim=Z, num_decoder_layers=L, decoder_hidden_size=H,
        decoder_dropout_prob=0.0,
    )
    vae.init(jax.random.PRNGKey(11))
    return vae


def _ref_vae(ds):
    return rp.RefMeasureVAE(
        ds, note_embedding_dim=E, num_encoder_layers=L,
        encoder_hidden_size=H, encoder_dropout_prob=0.0,
        latent_space_dim=Z, num_decoder_layers=L, decoder_hidden_size=H,
        decoder_dropout_prob=0.0,
    )


def test_vae_export_roundtrip():
    vae = _our_vae(rp._FakeDataset())
    _tree_assert_equal(port_measure_vae(export_measure_vae(vae.params)),
                       jax.tree_util.tree_map(np.asarray, vae.params))


def test_vae_export_loads_into_reference_and_matches():
    ds = rp._FakeDataset()
    vae = _our_vae(ds)
    ref = _ref_vae(ds)
    ref.load_state_dict(_torch_sd(export_measure_vae(vae.params)),
                        strict=True)
    ref.eval()

    score = np.random.RandomState(5).randint(0, V, (B, 24))
    # encoder: distribution parity
    with torch.no_grad():
        dist_t = ref.encoder(torch.from_numpy(score))
    enc = Encoder(E, H, L, V, dropout=0.0, bidirectional=True, z_dim=Z)
    dist_j = enc.apply(vae.params["encoder"], jnp.asarray(score),
                       train=False)
    np.testing.assert_allclose(np.asarray(dist_j.loc), dist_t.loc.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dist_j.scale),
                               dist_t.scale.numpy(), atol=1e-5)
    # decoder: teacher-forced logits parity (catches transposed square
    # matrices that strict-load shape checks cannot)
    rs = np.random.RandomState(6)
    z = rs.randn(B, Z).astype(np.float32)
    ref.decoder.teacher_forcing_prob = 1.1  # force the TF branch
    with torch.no_grad():
        w_t, _ = ref.decoder(torch.from_numpy(z), torch.from_numpy(score),
                             train=True)
    w_j, _ = vae.decoder.decode_teacher_forced(
        vae.params["decoder"], jnp.asarray(z), jnp.asarray(score),
        train=False, rng=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(w_j), w_t.numpy(), atol=1e-4)


def test_latent_rnn_export_loads_into_reference_and_matches():
    ds = rp._FakeDataset()
    vae = _our_vae(ds)
    ours = LatentRNN(ds, vae, num_rnn_layers=L, rnn_hidden_size=H,
                     dropout=0.0, auto_reg=False, max_target=3)
    ours.init(jax.random.PRNGKey(12))

    # roundtrip
    _tree_assert_equal(
        port_latent_rnn(export_latent_rnn(ours.params), num_layers=L,
                        auto_reg=False),
        jax.tree_util.tree_map(np.asarray, ours.params),
    )

    ref = rp.RefLatentRNN(ds, _ref_vae(ds), num_rnn_layers=L,
                          rnn_hidden_size=H, dropout=0.0,
                          rnn_class=torch.nn.GRU, auto_reg=False)
    ref.load_state_dict(
        _torch_sd(export_latent_rnn(ours.params, vae_params=vae.params)),
        strict=True,
    )
    ref.eval()

    zp = np.random.RandomState(7).randn(B, 5, Z).astype(np.float32)
    with torch.no_grad():
        cp_t = ref.forward_context(torch.from_numpy(zp), type="past")
    cp_j = ours.forward_context(ours.params, jnp.asarray(zp),
                                jnp.ones((B, 5)), "past", train=False,
                                rng=None)
    np.testing.assert_allclose(np.asarray(cp_j), cp_t.numpy(), atol=1e-5)


def test_arnn_export_loads_into_reference_and_matches():
    ds = rp._ArnnDataset()
    ours = ConstraintModelGaussianReg(
        ds, note_embedding_dim=E, metadata_embedding_dim=rp.MD_DIM,
        num_lstm_constraints_units=H, num_lstm_generation_units=H,
        linear_hidden_size=12, num_layers=2, dropout_input_prob=0.0,
        dropout_prob=0.0, unary_constraint=True,
    )
    ours.init(jax.random.PRNGKey(13))

    _tree_assert_equal(
        port_anticipation_rnn(export_anticipation_rnn(ours.params),
                              num_layers=2, num_metadata=3),
        jax.tree_util.tree_map(np.asarray, ours.params),
    )

    ref = rp.RefARNN(
        ds, note_embedding_dim=E, metadata_embedding_dim=rp.MD_DIM,
        num_lstm_constraints_units=H, num_lstm_generation_units=H,
        linear_hidden_size=12, num_layers=2, dropout_input_prob=0.0,
        dropout_prob=0.0, unary_constraint=True,
    )
    ref.load_state_dict(_torch_sd(export_anticipation_rnn(ours.params)),
                        strict=True)
    ref.eval()

    rs = np.random.RandomState(8)
    score = rs.randint(0, V, (B, rp.T_ARNN))
    md = rs.randint(0, 8, (B, rp.T_ARNN, 3))
    md[:, :, 2] = 0
    loc = np.ones((B, rp.T_ARNN), np.int64)
    loc[:, 20:30] = 0
    with torch.no_grad():
        w_t, _ = ref._forward_tf(
            torch.from_numpy(score[:, None, :]),
            torch.from_numpy(md[:, None, :, :]),
            torch.from_numpy(loc[:, None, :]),
        )
    w_j = ours.forward_tf(
        ours.params, jnp.asarray(score), jnp.asarray(md), jnp.asarray(loc),
        train=False, rng=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(w_j), w_t[0].numpy(), atol=1e-4)


def test_save_load_checkpoint_roundtrip(tmp_path):
    vae = _our_vae(rp._FakeDataset())
    sd = export_measure_vae(vae.params)
    path = str(tmp_path / "vae_state_dict.pt")
    save_torch_checkpoint(sd, path)
    back = load_torch_checkpoint(path)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], np.asarray(sd[k]))
