"""Native C++ tokenizer equivalence vs the Python reference implementation:
same parse, same transposition spelling, same tick-grid token ids — over the
hand-written fixtures AND a synthetic corpus."""
import os

import numpy as np
import pytest

from inpaintnet_tpu.data.abc_parser import parse_abc
from inpaintnet_tpu.data.native import NativeTokenizer
from inpaintnet_tpu.data.synthetic import generate_corpus, generate_tune
from inpaintnet_tpu.data.tokenizer import (
    Vocabulary,
    all_transposition_semitones,
    score_to_tensor,
    score_tokens,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")

pytestmark = pytest.mark.skipif(
    not NativeTokenizer.available(), reason="native library not built"
)


def _python_pipeline(text):
    score = parse_abc(text).fix_pick_up_measure().fix_last_measure()
    semis = all_transposition_semitones(score)
    tokens = []
    for s in semis:
        tokens.extend(score_tokens(score.transpose(s)))
    vocab = Vocabulary.build(tokens)
    encodings = [score_to_tensor(score.transpose(s), vocab) for s in semis]
    return score, semis, vocab, encodings


def _all_texts():
    texts = []
    for fn in sorted(os.listdir(FIX)):
        if fn.endswith(".abc"):
            with open(os.path.join(FIX, fn)) as f:
                texts.append(f.read())
    import random

    rng = random.Random(7)
    for i in range(15):
        texts.append(generate_tune(rng, i, num_bars=8))
    return texts


@pytest.mark.parametrize("idx", range(6))
def test_fixture_equivalence(idx):
    texts = _all_texts()
    _check(texts[idx])


def test_synthetic_corpus_equivalence():
    for text in _all_texts()[6:]:
        _check(text)


def _check(text):
    score, semis, vocab, py_encodings = _python_pipeline(text)

    info = NativeTokenizer.info(text)
    assert info is not None, NativeTokenizer.last_error()
    assert info["ts"] == tuple(score.time_signature)
    lo, hi = score.pitch_range()
    assert info["min_pitch"] == lo and info["max_pitch"] == hi
    assert info["total_ticks"] == int(score.highest_time * 6)
    assert info["on_grid"]

    # vocab scan parity
    native_tokens = NativeTokenizer.scan_tokens(text, semis)
    py_tokens = []
    for s in semis:
        py_tokens.extend(score_tokens(score.transpose(s)))
    assert native_tokens == py_tokens

    # encoding parity
    nt = NativeTokenizer([vocab.token(i) for i in range(len(vocab))])
    rows = nt.encode_transpositions(text, semis)
    assert rows is not None, NativeTokenizer.last_error()
    for py, nat in zip(py_encodings, rows):
        np.testing.assert_array_equal(py, nat)


def test_native_speedup():
    """The native path should be dramatically faster; assert a sane floor so
    regressions surface."""
    import time

    text = _all_texts()[3]  # 16-bar fixture
    score, semis, vocab, _ = _python_pipeline(text)
    nt = NativeTokenizer([vocab.token(i) for i in range(len(vocab))])

    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        for s in semis:
            score_to_tensor(score.transpose(s), vocab)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        nt.encode_transpositions(text, semis)
    t_nat = time.perf_counter() - t0
    # native re-parses the ABC text each call and still should win big
    assert t_nat < t_py, (t_nat, t_py)


def test_mid_tune_field_equivalence():
    """Mid-tune K:/L: changes and full-bar rests after inline [M:] must
    agree between the native and Python parsers (both store durations in
    quarterLengths at event time; score-level signature is the opening one)."""
    cases = [
        "X:1\nT:k change\nM:4/4\nL:1/8\nK:C\nF2F2F2F2|\nK:G\nF2F2F2F2|\n",
        "X:1\nT:l change\nM:4/4\nL:1/8\nK:C\nC2D2E2F2|\nL:1/4\nCDEF|\n",
        "X:1\nT:hdr after key\nM:4/4\nK:C\nL:1/8\nC2D2E2F2|C2D2E2F2|\n",
        "X:1\nT:z bars\nM:4/4\nL:1/8\nK:C\nC2D2E2F2|Z2|C2D2E2F2|\n",
    ]
    for text in cases:
        _check(text)
