"""Structured synthetic-corpus generator (round-3 verdict item #1).

The uniform generator draws notes i.i.d., so every model family saturates
at the same accuracy and the quality harness cannot discriminate. The
structured generator produces phrase forms (AABA etc.) with motif repeats,
rhythm-template pools, stepwise contour and cadences — long-range signal
the latent-traversal model is designed to exploit
(reference: the ISMIR'19 task /root/reference/README.md:1-20 inpaints
real folk tunes with exactly these phrase forms).

These tests pin: ingest validity, determinism, the phrase-repeat
property, pickup handling, and native tokenizer equivalence.
"""
import os
import random

import numpy as np
import pytest

from inpaintnet_tpu.data.abc_parser import parse_abc
from inpaintnet_tpu.data.corpus import MAX_NOTES, FolkCorpus
from inpaintnet_tpu.data.synthetic import (
    generate_corpus,
    generate_structured_tune,
)


def test_all_structured_tunes_pass_validity_filter(tmp_path):
    d = str(tmp_path / "corpus")
    names = generate_corpus(d, num_tunes=60, num_bars=16, seed=3,
                            style="structured")
    corp = FolkCorpus(d)
    assert len(corp.valid_tune_filenames) == len(names)


def test_deterministic_for_seed():
    a = generate_structured_tune(random.Random(42), 0, num_bars=16)
    b = generate_structured_tune(random.Random(42), 0, num_bars=16)
    assert a == b


def test_note_cap_and_pitch_range():
    rng = random.Random(9)
    for i in range(40):
        text = generate_structured_tune(rng, i, num_bars=16)
        score = parse_abc(text).fix_pick_up_measure().fix_last_measure()
        assert len(score.notes) <= MAX_NOTES, i
        lo, hi = score.pitch_range()
        assert lo >= 55 and hi <= 84, (i, lo, hi)


def test_phrase_repeats_are_exact_when_untransformed():
    """With transform_prob=0 and no rests, repeated form letters must
    restate their phrase bars VERBATIM — the long-range learnable
    signal. Verified at the parsed-measure level (pitch+offset+duration
    per measure) on tunes without a pickup bar."""
    rng = random.Random(5)
    checked = 0
    for i in range(30):
        text = generate_structured_tune(
            rng, i, num_bars=16, transform_prob=0.0, rest_prob=0.0,
            pickup_prob=0.0,
        )
        score = parse_abc(text)
        # group notes per measure (16 bars, 4 beats each)
        bars = [[] for _ in range(16)]
        for n in score.notes:
            bars[min(15, int(n.offset // 4))].append(
                (n.pitch, round(n.offset % 4, 6), n.duration)
            )
        phrases = [tuple(map(tuple, bars[p * 4:(p + 1) * 4]))
                   for p in range(4)]
        # at least one pair of phrases must be identical (every 4-phrase
        # form has a repeated letter except ABAC; final-cadence retone can
        # alter the last phrase, so compare the non-final ones)
        rep = any(phrases[a] == phrases[b]
                  for a in range(3) for b in range(a + 1, 3))
        checked += rep
    assert checked >= 15, checked  # most forms repeat within phrases 0-2


def test_pickup_bars_flow_through_ingest(tmp_path):
    rng = random.Random(1)
    found = 0
    for i in range(40):
        text = generate_structured_tune(rng, i, num_bars=16,
                                        pickup_prob=1.0)
        score = parse_abc(text)
        fixed = score.fix_pick_up_measure()
        # pickup fix pads the anacrusis to a full measure: total length
        # becomes a whole number of 4-beat bars
        assert float(fixed.highest_time) % 4 == 0.0, i
        found += 1
    assert found == 40


def test_rhythm_pool_reuse():
    """Bars reuse a small per-tune rhythm-template pool: the number of
    distinct per-bar duration patterns must stay well under the bar
    count (conditionally learnable rhythm)."""
    rng = random.Random(2)
    for i in range(10):
        text = generate_structured_tune(rng, i, num_bars=16,
                                        rhythm_pool=2, rest_prob=0.0,
                                        pickup_prob=0.0)
        score = parse_abc(text)
        bars = [[] for _ in range(16)]
        for n in score.notes:
            bars[min(15, int(n.offset // 4))].append(
                (round(n.offset % 4, 6), n.duration)
            )
        patterns = {tuple(b) for b in bars}
        assert len(patterns) <= 8, (i, len(patterns))


def test_generate_corpus_rejects_unknown_style(tmp_path):
    with pytest.raises(ValueError):
        generate_corpus(str(tmp_path), num_tunes=1, style="nope")


def test_uniform_goldens_unchanged(tmp_path):
    """style='uniform' must stay byte-identical (cached fixtures and the
    differential-fuzz seeds depend on it)."""
    d = str(tmp_path / "u")
    generate_corpus(d, num_tunes=2, num_bars=8, seed=0)
    with open(os.path.join(d, "tune_0.abc")) as f:
        first_line = f.read().splitlines()[5]
    # frozen from the pre-structured generator output at seed 0
    assert first_line == "F G2 B F D E C/G/|G B D A B2 F E|G D F G z G C F|B C B D A D D D/B/|", first_line


def test_native_equivalence_on_structured(tmp_path):
    from inpaintnet_tpu.data.native import NativeTokenizer
    from inpaintnet_tpu.data.tokenizer import (
        Vocabulary,
        all_transposition_semitones,
        score_to_tensor,
        score_tokens,
    )

    if not NativeTokenizer.available():
        pytest.skip("native library not built")
    rng = random.Random(11)
    for i in range(10):
        text = generate_structured_tune(rng, i, num_bars=16)
        score = parse_abc(text).fix_pick_up_measure().fix_last_measure()
        semis = all_transposition_semitones(score)
        py = [t for s in semis for t in score_tokens(score.transpose(s))]
        assert NativeTokenizer.scan_tokens(text, semis) == py, i
        vocab = Vocabulary.build(py)
        nt = NativeTokenizer([vocab.token(j) for j in range(len(vocab))])
        rows = nt.encode_transpositions(text, semis)
        assert rows is not None, NativeTokenizer.last_error()
        for s, row in zip(semis, rows):
            np.testing.assert_array_equal(
                score_to_tensor(score.transpose(s), vocab), row,
                err_msg=f"tune {i} semi {s}",
            )
