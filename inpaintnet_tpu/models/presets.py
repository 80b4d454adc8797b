"""Model presets / factories.

Public construction helpers used by benchmarks, the driver entry points and
quick-start code, so they don't have to replicate the flagship
configuration (reference defaults: train_measure_vae.py:12-44,
train_inpaintnet.py:14-58).
"""
from __future__ import annotations

import jax


class VocabOnlyDataset:
    """Minimal dataset stand-in carrying just a vocabulary — for building
    models without a corpus (benchmarks, serving with ported weights)."""

    def __init__(self, vocab_size: int = 60, name: str = "vocab-only"):
        names = [f"N{i}" for i in range(vocab_size - 4)] + [
            "START", "END", "__", "rest",
        ]
        self.note2index_dicts = [{n: i for i, n in enumerate(names)}]
        self.name = name
        self.n_bars = 16
        self.subdivision = 6
        self.num_beats_per_bar = 4
        self.num_voices = 1
        self.metadatas = []

    def __repr__(self):
        return f"VocabOnlyDataset({self.name},{len(self.note2index_dicts[0])})"


def build_flagship(
    vocab_size: int = 60,
    hidden: int = 512,
    z_dim: int = 256,
    emb: int = 10,
    layers: int = 2,
    auto_reg: bool = False,
    seed: int = 0,
    dataset=None,
):
    """Full-size MeasureVAE + LatentRNN (the shipped reference config).

    :return: (dataset, vae_model, latent_rnn_model) with params initialized
    """
    from inpaintnet_tpu.models.latent_rnn import LatentRNN
    from inpaintnet_tpu.models.measure_vae import MeasureVAE

    ds = dataset if dataset is not None else VocabOnlyDataset(vocab_size)
    vae = MeasureVAE(
        ds,
        note_embedding_dim=emb,
        num_encoder_layers=layers,
        encoder_hidden_size=hidden,
        latent_space_dim=z_dim,
        num_decoder_layers=layers,
        decoder_hidden_size=hidden,
    )
    vae.init(jax.random.PRNGKey(seed))
    model = LatentRNN(
        ds, vae, num_rnn_layers=2, rnn_hidden_size=hidden, dropout=0.5,
        auto_reg=auto_reg, teacher_forcing=True,
    )
    model.init(jax.random.PRNGKey(seed + 1))
    return ds, vae, model
