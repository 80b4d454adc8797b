"""End-to-end data pipeline tests over a synthetic corpus."""
import json
import os

import numpy as np
import pytest

from inpaintnet_tpu.data import (
    BeatMarkerMetadata,
    DatasetManager,
    FolkCorpus,
    TickMetadata,
)
from inpaintnet_tpu.data.synthetic import generate_corpus


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    generate_corpus(str(d), num_tunes=12, num_bars=8, seed=0)
    return str(d)


@pytest.fixture(scope="module")
def manager(corpus_dir, tmp_path_factory):
    cache = tmp_path_factory.mktemp("cache")
    return DatasetManager(cache_dir=str(cache), corpus_dir=corpus_dir)


def _metadatas():
    return [BeatMarkerMetadata(6), TickMetadata(6)]


def test_corpus_validity_filter(corpus_dir, tmp_path):
    corpus = FolkCorpus(raw_dir=corpus_dir, cache_dir=str(tmp_path))
    names = corpus.valid_tune_filenames
    assert len(names) > 0
    # cached list is reread
    corpus2 = FolkCorpus(raw_dir=corpus_dir, cache_dir=str(tmp_path))
    assert corpus2.valid_tune_filenames == names
    scores = list(corpus())
    assert len(scores) == len(names)
    for s in scores:
        assert s.time_signature == (4, 4)
        # fixed last measure: integral number of bars
        assert int(s.highest_time) % 4 == 0


def test_nbars_dataset_build_and_loaders(manager):
    ds = manager.get_dataset(
        "folk_4by4nbars_short",
        metadatas=_metadatas(),
        sequences_size=32,
        num_bars=16,
        train=True,
    )
    score, md = ds.arrays
    n = score.shape[0]
    assert score.shape == (n, 1, 16 * 24)
    assert md.shape[0] == n and md.shape[2] == 16 * 24 and md.shape[3] == 3
    # loaders
    train, val, test = ds.data_loaders(batch_size=4, split=(0.7, 0.2))
    xb, mb = next(iter(train))
    assert xb.shape == (4, 1, 384)
    # all tokens within vocab
    assert xb.min() >= 0 and xb.max() < len(ds.vocab)
    # shuffling differs across epochs but is seeded
    first_epoch = [b[0].copy() for b in train]
    second_epoch = [b[0].copy() for b in train]
    assert not all(np.array_equal(a, b) for a, b in zip(first_epoch, second_epoch))


def test_nbars_split_is_seeded_and_disjoint(manager):
    train_ds = manager.get_dataset(
        "folk_4by4nbars_short", metadatas=_metadatas(), num_bars=16, train=True
    )
    test_ds = manager.get_dataset(
        "folk_4by4nbars_short", metadatas=_metadatas(), num_bars=16, train=False
    )
    with open(train_ds.split_manifest_path) as f:
        manifest = json.load(f)
    assert set(manifest["train"]).isdisjoint(manifest["test"])
    assert train_ds.dataset_filenames == manifest["train"]
    assert test_ds.dataset_filenames == manifest["test"]


def test_nbars_cache_roundtrip(manager):
    ds = manager.get_dataset(
        "folk_4by4nbars_short", metadatas=_metadatas(), num_bars=16, train=True
    )
    a1 = ds.arrays
    assert os.path.exists(ds.store_path)
    ds2 = manager.get_dataset(
        "folk_4by4nbars_short", metadatas=_metadatas(), num_bars=16, train=True
    )
    a2 = ds2.arrays
    np.testing.assert_array_equal(a1[0], a2[0])


def test_measures_dataset(manager):
    ds = manager.get_dataset("folk_4by4measures_test2", metadatas=_metadatas())
    score, md = ds.arrays
    assert score.shape[1] == 24
    assert md.shape[1:] == (24, 3)


def test_measures_transpose_dataset_larger(manager):
    base = manager.get_dataset("folk_4by4measures_test", metadatas=_metadatas())
    tr = manager.get_dataset("folk_4by4measurestr_test", metadatas=_metadatas())
    assert tr.arrays[0].shape[0] > base.arrays[0].shape[0]


def test_attribute_probes(manager):
    ds = manager.get_dataset("folk_4by4measures_test", metadatas=_metadatas())
    m = ds.arrays[0][:8]
    nn = ds.get_num_notes_in_measure(m)
    nr = ds.get_note_range_of_measure(m)
    ent = ds.get_rhythmic_entropy(m)
    bs = ds.get_beat_strength(m)
    assert nn.shape == nr.shape == ent.shape == bs.shape == (8,)
    assert (0 <= nn).all() and (nn <= 1).all()
    assert (0 <= nr).all() and (nr <= 1).all()


def test_score_tensor_roundtrip_via_dataset(manager):
    ds = manager.get_dataset("folk_4by4measures_test2", metadatas=_metadatas())
    score = next(ds.iterator_gen())
    t = ds.get_score_tensor(score)
    back = ds.tensor_to_score(t)
    t2 = ds.get_score_tensor(back)
    np.testing.assert_array_equal(t, t2)


def test_prefetch_iterator_propagates_errors():
    """A raising inner iterator must surface the error, not deadlock the
    consumer (the worker previously died without queueing the sentinel)."""
    import pytest as _pytest

    from inpaintnet_tpu.data.dataset import PrefetchIterator

    class Boom:
        batch_size = 1

        def __len__(self):
            return 3

        def __iter__(self):
            yield ("a",)
            raise RuntimeError("inner failure")

    it = PrefetchIterator(Boom())
    got = []
    with _pytest.raises(RuntimeError, match="inner failure"):
        for item in it:
            got.append(item)
    assert got == [("a",)]


def test_store_path_distinguishes_split_seed_and_corpus(tmp_path):
    """Different split seeds (and corpus dirs) must NOT share a cached
    tensor store — a seed-1 'test' build loading the seed-0 store would
    silently evaluate on seed-0 train files."""
    from inpaintnet_tpu.data.corpus import FolkCorpus
    from inpaintnet_tpu.data.dataset import FolkDatasetNBars
    from inpaintnet_tpu.data.synthetic import generate_corpus

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    generate_corpus(str(corpus), num_tunes=4, num_bars=16, seed=3)

    def build(seed):
        gen = FolkCorpus(raw_dir=str(corpus), cache_dir=str(tmp_path / "cache"))
        return FolkDatasetNBars(
            name="t", corpus_it_gen=gen, metadatas=[],
            cache_dir=str(tmp_path / "cache"), num_bars=16, train=True,
            split_seed=seed,
        )
    d0, d1 = build(0), build(1)
    assert repr(d0) == repr(d1)  # model-facing identity unchanged
    assert d0.store_path != d1.store_path  # cache identity differs
