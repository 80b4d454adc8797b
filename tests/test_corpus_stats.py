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


def test_mixed_time_signature_registry(tmp_path):
    """The 'folk_test' registry entry accepts both 3/4 and 4/4 tunes."""
    from inpaintnet_tpu.data import BeatMarkerMetadata, DatasetManager, TickMetadata

    corpus = tmp_path / "mixed"
    generate_corpus(str(corpus), num_tunes=3, num_bars=8, seed=2, time_sig=(4, 4))
    # add 3/4 tunes with distinct names
    import os

    from inpaintnet_tpu.data.synthetic import generate_tune
    import random

    rng = random.Random(3)
    for i in range(3, 6):
        with open(os.path.join(str(corpus), f"tune_{i}.abc"), "w") as f:
            f.write(generate_tune(rng, i, num_bars=8, time_sig=(3, 4)))
    mgr = DatasetManager(cache_dir=str(tmp_path / "cache"), corpus_dir=str(corpus))
    ds = mgr.get_dataset(
        "folk_test",
        metadatas=[BeatMarkerMetadata(6), TickMetadata(6)],
        sequences_size=12,
    )
    names = ds.corpus_it_gen.valid_tune_filenames
    assert len(names) == 6  # both meters accepted
    sigs = {tuple(s.time_signature) for s in ds.iterator_gen()}
    assert sigs == {(3, 4), (4, 4)}


def test_native_tokenizer_corpus_scale(tmp_path):
    """Corpus-scale AOT tokenization throughput sanity: 300 tunes with all
    transpositions should encode in well under a minute via the native
    path (the reference takes hours through music21 at 13.7k tunes)."""
    import time

    from inpaintnet_tpu.data.native import NativeTokenizer

    if not NativeTokenizer.available():
        import pytest

        pytest.skip("native library not built")
    corpus = tmp_path / "big"
    names = generate_corpus(str(corpus), num_tunes=300, num_bars=16, seed=4)
    from inpaintnet_tpu.data.abc_parser import parse_abc
    from inpaintnet_tpu.data.tokenizer import (
        Vocabulary,
        all_transposition_semitones,
        score_tokens,
    )

    # vocab over untransposed corpus is enough for this sanity check
    toks = []
    for n in names[:50]:
        with open(corpus / n) as f:
            toks.extend(score_tokens(parse_abc(f.read())))
    toks += ["OOR"]
    vocab = Vocabulary.build(toks)
    nt = NativeTokenizer([vocab.token(i) for i in range(len(vocab))])
    t0 = time.perf_counter()
    total = 0
    for n in names:
        with open(corpus / n) as f:
            text = f.read()
        info = NativeTokenizer.info(text)
        semis = list(range(55 - info["min_pitch"], 84 - info["max_pitch"] + 1))
        rows = nt.encode_transpositions(text, semis)
        total += sum(1 for r in rows if r is not None)
    dt = time.perf_counter() - t0
    assert total > 3000  # ~300 tunes x ~15 transpositions
    assert dt < 60, f"native tokenization too slow: {dt:.1f}s"
