"""Byte-level golden tests for the tokenization pipeline (round-2 verdict
item #9): the committed ``goldens/tokenizer_v1.json`` freezes transposition
selection, token streams, vocabulary, and encoded id tensors for the
fixture tunes. Any diff is a SEMANTIC change to the data layer and must be
intentional (bump ``tokenizer_goldens.VERSION`` and regenerate).

The native C++ tokenizer is held to the SAME goldens — not just to
"whatever Python currently does" — so a coordinated drift of both paths
still fails."""
import json

import numpy as np
import pytest

from inpaintnet_tpu.data.native import NativeTokenizer

import tokenizer_goldens as G


@pytest.fixture(scope="module")
def goldens():
    with open(G.GOLDEN_PATH) as f:
        data = json.load(f)
    assert data["version"] == G.VERSION
    return data["tunes"]


def _texts():
    import os

    out = {}
    for fn in sorted(os.listdir(G.FIX)):
        if fn.endswith(".abc"):
            with open(os.path.join(G.FIX, fn)) as f:
                out[fn] = f.read()
    return out


def test_golden_file_covers_all_fixtures(goldens):
    assert set(goldens) == set(_texts())


def test_python_pipeline_matches_goldens(goldens):
    for fn, text in _texts().items():
        g = goldens[fn]
        score, semis, tokens, vocab, encodings = G.pipeline(text)
        assert list(score.time_signature) == g["time_signature"], fn
        assert list(score.pitch_range()) == g["pitch_range"], fn
        assert int(score.highest_time * 6) == g["total_ticks"], fn
        assert list(semis) == g["semitones"], fn
        assert [vocab.token(i) for i in range(len(vocab))] == g["vocab"], fn
        for s in semis:
            assert tokens[s] == g["tokens"][str(s)], (fn, s)
            np.testing.assert_array_equal(
                encodings[s], g["encodings"][str(s)], err_msg=f"{fn} @ {s}"
            )


@pytest.fixture(scope="module")
def structured_goldens():
    data = G.load_structured_goldens()
    assert data["version"] == G.STRUCTURED_VERSION
    tunes = data["tunes"]
    assert len(tunes) == G.STRUCTURED_COUNT
    return tunes


def test_structured_python_pipeline_matches_goldens(structured_goldens):
    """Corpus-scale byte freeze (100 structured tunes; the ABC text is
    frozen inside the golden file, so this pins the tokenizer even if
    the generator evolves)."""
    for key, g in structured_goldens.items():
        score, semis, tokens, vocab, encodings = G.pipeline(g["abc"])
        assert list(score.time_signature) == g["time_signature"], key
        assert list(score.pitch_range()) == g["pitch_range"], key
        assert int(score.highest_time * 6) == g["total_ticks"], key
        assert list(semis) == g["semitones"], key
        assert [vocab.token(i) for i in range(len(vocab))] == g["vocab"], key
        for s in semis:
            assert tokens[s] == g["tokens"][str(s)], (key, s)
            np.testing.assert_array_equal(
                encodings[s], g["encodings"][str(s)], err_msg=f"{key} @ {s}"
            )


@pytest.mark.skipif(not NativeTokenizer.available(),
                    reason="native library not built")
def test_structured_native_matches_goldens(structured_goldens):
    for key, g in structured_goldens.items():
        semis = g["semitones"]
        native_tokens = NativeTokenizer.scan_tokens(g["abc"], semis)
        expect = [t for s in semis for t in g["tokens"][str(s)]]
        assert native_tokens == expect, key
        nt = NativeTokenizer(g["vocab"])
        rows = nt.encode_transpositions(g["abc"], semis)
        assert rows is not None, NativeTokenizer.last_error()
        for s, row in zip(semis, rows):
            np.testing.assert_array_equal(
                row, g["encodings"][str(s)], err_msg=f"{key} @ {s}"
            )


@pytest.mark.skipif(not NativeTokenizer.available(),
                    reason="native library not built")
def test_native_tokenizer_matches_goldens(goldens):
    for fn, text in _texts().items():
        g = goldens[fn]
        semis = g["semitones"]
        native_tokens = NativeTokenizer.scan_tokens(text, semis)
        expect = [t for s in semis for t in g["tokens"][str(s)]]
        assert native_tokens == expect, fn
        nt = NativeTokenizer(g["vocab"])
        rows = nt.encode_transpositions(text, semis)
        assert rows is not None, NativeTokenizer.last_error()
        for s, row in zip(semis, rows):
            np.testing.assert_array_equal(
                row, g["encodings"][str(s)], err_msg=f"{fn} @ {s}"
            )
