"""Corpus statistics sweep + prefetch iterator."""
import numpy as np

from inpaintnet_tpu.data import FolkCorpus
from inpaintnet_tpu.data.dataset import BatchIterator, PrefetchIterator
from inpaintnet_tpu.data.synthetic import generate_corpus


def test_scan_dataset(tmp_path):
    corpus_dir = tmp_path / "corpus"
    generate_corpus(str(corpus_dir), num_tunes=6, num_bars=8, seed=5)
    corpus = FolkCorpus(raw_dir=str(corpus_dir), cache_dir=str(tmp_path))
    stats = corpus.scan_dataset()
    assert stats["num_files"] == len(corpus.valid_tune_filenames)
    assert 0 <= stats["min_pitch"] <= stats["max_pitch"] <= 127
    assert stats["pitch_dist"].sum() > 0
    assert stats["time_signatures"] == {(4, 4): stats["num_files"]}
    assert sum(stats["dur_dist"].values()) > 0


def test_prefetch_iterator_matches_inner():
    arrays = (np.arange(40).reshape(20, 2), np.arange(20))
    inner = BatchIterator(arrays, batch_size=4, shuffle=True, seed=3)
    pf = PrefetchIterator(BatchIterator(arrays, batch_size=4, shuffle=True, seed=3))
    a = [b[0].copy() for b in inner]
    b = [b[0].copy() for b in pf]
    assert len(a) == len(b) == len(pf)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
