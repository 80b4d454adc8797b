"""Shared synthetic-ARNN setup for the serving benchmarks (one copy of
the dataset stub + model hyperparameters so the soak and the ARNN bench
exercise the same configuration)."""
from __future__ import annotations

import jax

from inpaintnet_tpu.data.metadata import BeatMarkerMetadata, TickMetadata
from inpaintnet_tpu.models.anticipation_rnn import AnticipationRNNBaseline

VOCAB = 60


class BenchDS:
    note2index_dicts = [{f"t{i}": i for i in range(VOCAB)}]
    metadatas = [BeatMarkerMetadata(), TickMetadata()]
    num_voices = 1

    def __repr__(self):
        return "ds"


def build_arnn(small: bool = False, seed: int = 1):
    """Flagship (2x256) or tiny (2x16, for CPU smoke runs) baseline ARNN
    with initialized params."""
    h = 16 if small else 256
    m = AnticipationRNNBaseline(
        BenchDS(), note_embedding_dim=10, metadata_embedding_dim=2,
        num_lstm_constraints_units=h, num_lstm_generation_units=h,
        linear_hidden_size=h, num_layers=2, unary_constraint=True,
    )
    m.init(jax.random.PRNGKey(seed))
    return m
