"""ABC writer roundtrip + 3/4-time dataset path."""
import os
from fractions import Fraction

import numpy as np
import pytest

from inpaintnet_tpu.data import BeatMarkerMetadata, DatasetManager, TickMetadata
from inpaintnet_tpu.data.abc_parser import parse_abc
from inpaintnet_tpu.data.abc_writer import write_abc
from inpaintnet_tpu.data.synthetic import generate_corpus

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _notes_sig(score):
    return [
        (n.pitch.name if n.pitch else "rest", n.offset, n.duration)
        for n in score.notes
    ]


@pytest.mark.parametrize(
    "fixture", ["tune_simple.abc", "tune_triplet.abc", "tune_16bars.abc"]
)
def test_abc_writer_roundtrip(fixture):
    with open(os.path.join(FIX, fixture)) as f:
        score = parse_abc(f.read())
    text = write_abc(score)
    back = parse_abc(text)
    assert back.time_signature == score.time_signature
    assert _notes_sig(back) == _notes_sig(score)


def test_abc_writer_roundtrip_generated_inpainting(tmp_path):
    """The real use: export a token tensor back to readable ABC."""
    from inpaintnet_tpu.data.tokenizer import (
        Vocabulary,
        score_tokens,
        score_to_tensor,
        tensor_to_score,
    )

    with open(os.path.join(FIX, "tune_16bars.abc")) as f:
        score = parse_abc(f.read())
    vocab = Vocabulary.build(score_tokens(score))
    t = score_to_tensor(score, vocab)
    decoded = tensor_to_score(t, vocab)
    text = write_abc(decoded, title="roundtrip")
    again = parse_abc(text)
    assert _notes_sig(again) == _notes_sig(decoded)


def test_3by4_dataset_path(tmp_path):
    corpus = tmp_path / "corpus34"
    generate_corpus(str(corpus), num_tunes=8, num_bars=8, seed=9, time_sig=(3, 4))
    mgr = DatasetManager(cache_dir=str(tmp_path / "cache"), corpus_dir=str(corpus))
    ds = mgr.get_dataset(
        "folk_3by4_test",
        metadatas=[BeatMarkerMetadata(6), TickMetadata(6)],
        sequences_size=12,
    )
    score_arr, md_arr = ds.arrays
    assert score_arr.shape[2] == 12 * 6  # 12-beat windows on the tick grid
    # beatmarker: downbeat every 3 beats = every 18 ticks
    bm = BeatMarkerMetadata(6)
    down = bm.beat_symbol2index_dicts["B"]
    scores = list(ds.iterator_gen())
    ch = bm.evaluate(scores[0], 6)
    assert (ch[0::18] == down).all()
    assert (ch[6] != down) and (ch[12] != down)
    # 4/4 tunes are rejected by the 3/4 registry's validity filter
    gen44 = tmp_path / "corpus44"
    generate_corpus(str(gen44), num_tunes=3, num_bars=8, seed=1, time_sig=(4, 4))
    mgr2 = DatasetManager(cache_dir=str(tmp_path / "cache2"), corpus_dir=str(gen44))
    ds2 = mgr2.get_dataset(
        "folk_3by4_test", metadatas=[BeatMarkerMetadata(6), TickMetadata(6)]
    )
    assert ds2.corpus_it_gen.valid_tune_filenames == []
