"""Tester-layer integration tests over the synthetic corpus + MIDI export."""
import os

import numpy as np
import jax
import pytest

from inpaintnet_tpu.data import BeatMarkerMetadata, DatasetManager, TickMetadata
from inpaintnet_tpu.data.midi import read_midi_notes, write_midi
from inpaintnet_tpu.data.synthetic import generate_corpus
from inpaintnet_tpu.eval import (
    AnticipationRNNTester,
    LatentRNNTester,
    VAETester,
)
from inpaintnet_tpu.models import (
    ConstraintModelGaussianReg,
    LatentRNN,
    MeasureVAE,
)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    corpus = tmp_path_factory.mktemp("corpus")
    cache = tmp_path_factory.mktemp("cache")
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    generate_corpus(str(corpus), num_tunes=10, num_bars=16, seed=2)
    mgr = DatasetManager(cache_dir=str(cache), corpus_dir=str(corpus))
    ds = mgr.get_dataset(
        "folk_4by4nbars_short",
        metadatas=[BeatMarkerMetadata(6), TickMetadata(6)],
        num_bars=16,
        train=True,
    )
    ds.arrays
    vae = MeasureVAE(
        ds, note_embedding_dim=8, num_encoder_layers=1, encoder_hidden_size=16,
        latent_space_dim=12, num_decoder_layers=1, decoder_hidden_size=16,
        checkpoint_dir=ckpt,
    )
    vae.init(jax.random.PRNGKey(0))
    return ds, vae, ckpt


def test_vae_tester(env, tmp_path):
    ds, vae, _ = env
    tester = VAETester(ds, vae)
    loss, acc = tester.test_model(batch_size=4)
    assert np.isfinite(loss) and 0 <= acc <= 1
    # interpolation produces a decodable score
    score = tester.test_interp(n=3)
    assert score.highest_time == 5 * 4  # (n+2)=5 measures of 4 beats
    # alt eval path
    _, _, gen_test = ds.data_loaders(batch_size=2, split=(0.01, 0.01))
    loss2, acc2 = tester.loss_and_acc_test_alt(gen_test)
    assert np.isfinite(loss2)


def test_vae_latent_probes(env, tmp_path):
    ds, vae, _ = env
    tester = VAETester(ds, vae)
    z, attrs = tester.encode_test_set(batch_size=4, num_batches=2)
    assert z.shape[0] == attrs.shape[0] and z.shape[1] == 12
    f = tester.plot_attribute_dist(
        attribute="num_notes", plt_type="pca", out_dir=str(tmp_path)
    )
    assert os.path.exists(f)


def test_latent_rnn_tester_generation(env):
    ds, vae, ckpt = env
    model = LatentRNN(
        ds, vae, num_rnn_layers=2, rnn_hidden_size=16, dropout=0.5,
        auto_reg=False, checkpoint_dir=ckpt,
    )
    model.init(jax.random.PRNGKey(1))
    tester = LatentRNNTester(ds, model)
    loss, acc = tester.test_model(batch_size=2)
    assert np.isfinite(loss)
    # tick-range generation API — the product contract
    score_arr = ds.arrays[0][0]  # (1, 384)
    gen_score, gen_tensor, _ = tester.generation(
        tensor_score=score_arr, time_index_range_ticks=(24 * 7, 24 * 9)
    )
    assert gen_tensor.shape == (1, 16 * 24)
    # reference tick-range semantics (latent_rnn_tester.py:160-165):
    # a=24*7 -> start_measure 8 (1-based) -> past = measures 0..6, so the
    # regenerated span is ticks [24*7, 24*9); context outside is preserved
    np.testing.assert_array_equal(gen_tensor[0, : 24 * 7], score_arr[0, : 24 * 7])
    np.testing.assert_array_equal(gen_tensor[0, 24 * 9 :], score_arr[0, 24 * 9 :])
    # empty-context synthesis
    gen_score2, t2, _ = tester.generate(None, None, None, 2)
    assert t2.shape[1] == 3 + 2 + 1  # start(3) + gen(2) + end(1) measures


def test_arnn_tester(env):
    ds, vae, ckpt = env
    model = ConstraintModelGaussianReg(
        ds, note_embedding_dim=8, metadata_embedding_dim=4,
        num_lstm_constraints_units=16, num_lstm_generation_units=16,
        linear_hidden_size=12, num_layers=1, unary_constraint=True,
        checkpoint_dir=ckpt,
    )
    model.init(jax.random.PRNGKey(2))
    tester = AnticipationRNNTester(ds, model)
    loss, acc = tester.loss_and_acc_test(
        ds.data_loaders(batch_size=2, split=(0.01, 0.01))[2]
    )
    assert np.isfinite(loss)
    gen_score, gen, orig = tester.generation_test(temperature=1.5)
    assert gen.shape[1] == 16 * 24


def test_midi_roundtrip(env, tmp_path):
    ds, _, _ = env
    score = next(ds.iterator_gen())
    path = str(tmp_path / "tune.mid")
    write_midi(score, path)
    notes = read_midi_notes(path)
    orig = [
        (n.offset, n.duration, n.pitch.midi) for n in score.notes if n.is_note
    ]
    assert len(notes) == len(orig)
    for (o1, d1, p1), (o2, d2, p2) in zip(notes, orig):
        assert p1 == p2 and o1 == o2 and d1 == d2


def test_eval_report(env, tmp_path):
    """One HTML artifact collating metrics, latent plots and ABC samples."""
    from inpaintnet_tpu.eval.report import build_report
    from inpaintnet_tpu.models import LatentRNN

    ds, vae, ckpt = env
    model = LatentRNN(
        ds, vae, num_rnn_layers=2, rnn_hidden_size=16, dropout=0.5,
        auto_reg=False, checkpoint_dir=ckpt,
    )
    model.init(jax.random.PRNGKey(3))
    vt = VAETester(ds, vae)
    lt = LatentRNNTester(ds, model)
    out = build_report(
        vae_tester=vt, latent_tester=lt,
        out_path=str(tmp_path / "report.html"), num_samples=1, batch_size=4,
        plot=False,
    )
    with open(out) as f:
        doc = f.read()
    assert "MeasureVAE reconstruction" in doc
    assert "LatentRNN (InpaintNet) inpainting" in doc
    assert "Inpainting sample 0" in doc
    assert "X:1" in doc  # embedded ABC


def test_latent_rnn_generation_test_first_batch(env):
    """generation_test with the skip-ahead drawing 0 (forced via a 1-draw
    rng) must still take a batch (previously UnboundLocalError)."""
    ds, vae, ckpt = env
    model = LatentRNN(
        ds, vae, num_rnn_layers=2, rnn_hidden_size=16, dropout=0.0,
        auto_reg=False, checkpoint_dir=ckpt,
    )
    model.init(jax.random.PRNGKey(7))
    tester = LatentRNNTester(ds, model)
    tester._np_rng = np.random.RandomState(0)

    class _ZeroFirst:
        """randint that returns 0 for the skip draw, then real draws."""

        def __init__(self, rng):
            self._rng = rng
            self._first = True

        def randint(self, lo, hi=None):
            if self._first:
                self._first = False
                return 0
            return self._rng.randint(lo, hi)

    tester._np_rng = _ZeroFirst(np.random.RandomState(1))
    gen_score, gen_tensor, _ = tester.generation_test()
    assert gen_tensor is not None
