"""Tokenizer golden tests: tick-grid encoding, slur semantics, roundtrip,
windows/padding, transposition enumeration, metadata channels."""
import os
from fractions import Fraction

import numpy as np

from inpaintnet_tpu.data.abc_parser import parse_abc
from inpaintnet_tpu.data.metadata import (
    BeatMarkerMetadata,
    TickMetadata,
    metadata_tensor,
)
from inpaintnet_tpu.data.tokenizer import (
    SLUR_SYMBOL,
    START_SYMBOL,
    END_SYMBOL,
    REST,
    SUBDIVISION,
    TICK_DURATIONS,
    Vocabulary,
    all_transposition_semitones,
    extract_with_padding,
    score_to_tensor,
    score_tokens,
    tensor_to_score,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def load_score(name):
    with open(os.path.join(FIX, name)) as f:
        return parse_abc(f.read())


def test_tick_durations():
    assert TICK_DURATIONS == [
        Fraction(1, 4),
        Fraction(1, 12),
        Fraction(1, 6),
        Fraction(1, 6),
        Fraction(1, 12),
        Fraction(1, 4),
    ]
    assert sum(TICK_DURATIONS) == 1


def test_score_to_tensor_slur_pattern():
    score = load_score("tune_simple.abc")
    vocab = Vocabulary.build(score_tokens(score))
    t = score_to_tensor(score, vocab)
    assert t.shape == (int(score.highest_time) * SUBDIVISION,)
    # first note D4 is an eighth = ticks 0,1,2 (0, 1/4, 1/3 -> next note at 1/2)
    slur = vocab.slur_index
    assert vocab.token(t[0]) == "D4"
    assert t[1] == slur and t[2] == slur
    # next eighth F#4 starts at tick 3 (offset 1/2)
    assert vocab.token(t[3]) == "F#4"
    # quarter note occupies 6 ticks? no: quarter = 1.0 -> ticks 0..5 of a beat
    # check bar 3 'D2' (quarter) at beat 14 (offset 13.0? derive): find D4
    # articulations
    d4 = vocab.index("D4")
    artic = np.where(t == d4)[0]
    assert len(artic) >= 2


def test_roundtrip_tensor_score():
    score = load_score("tune_16bars.abc")
    vocab = Vocabulary.build(score_tokens(score))
    t = score_to_tensor(score, vocab)
    back = tensor_to_score(t, vocab)
    # same notes (name, offset, duration)
    orig = [(n.pitch.name if n.pitch else REST, n.offset, n.duration) for n in score.notes]
    rec = [(n.pitch.name if n.pitch else REST, n.offset, n.duration) for n in back.notes]
    assert rec == orig
    # re-encoding is idempotent
    t2 = score_to_tensor(back, vocab)
    np.testing.assert_array_equal(t, t2)


def test_roundtrip_with_sixteenths_and_triplets():
    score = load_score("tune_triplet.abc")
    vocab = Vocabulary.build(score_tokens(score))
    t = score_to_tensor(score, vocab)
    back = tensor_to_score(t, vocab)
    orig = [(n.pitch.name if n.pitch else REST, n.offset, n.duration) for n in score.notes]
    rec = [(n.pitch.name if n.pitch else REST, n.offset, n.duration) for n in back.notes]
    assert rec == orig


def test_extract_with_padding():
    vocab = Vocabulary.build(["C4", REST])
    t = np.arange(10, dtype=np.int32) % 2
    w = extract_with_padding(t, -3, 12, vocab.start_index, vocab.end_index)
    assert w.shape == (15,)
    assert (w[:3] == vocab.start_index).all()
    assert (w[-2:] == vocab.end_index).all()
    np.testing.assert_array_equal(w[3:13], t)


def test_vocabulary_determinism_and_specials():
    v1 = Vocabulary.build(["C4", "D4", REST])
    v2 = Vocabulary.build([REST, "D4", "C4"])
    assert v1.index2note == v2.index2note
    for s in (SLUR_SYMBOL, START_SYMBOL, END_SYMBOL):
        assert s in v1


def test_vocab_save_load(tmp_path):
    v = Vocabulary.build(["C4", "D4", REST])
    p = str(tmp_path / "vocab.json")
    v.save(p)
    v2 = Vocabulary.load(p)
    assert v.index2note == v2.index2note


def test_all_transpositions():
    score = load_score("tune_simple.abc")
    lo, hi = score.pitch_range()
    semis = all_transposition_semitones(score)
    assert 0 in semis
    # every listed transposition keeps the score in range
    for s in semis:
        ts = score.transpose(s)
        mn, mx = ts.pitch_range()
        assert 55 <= mn and mx <= 84
    # boundary shifts are excluded
    assert (min(semis) - 1) + lo < 55
    assert (max(semis) + 1) + hi > 84


def test_metadata_channels():
    score = load_score("tune_simple.abc")
    md = metadata_tensor(score, [BeatMarkerMetadata(6), TickMetadata(6)])
    length = int(score.highest_time) * 6
    assert md.shape == (length, 3)  # beatmarker, tick, voice-id
    # tick channel cycles 0..5
    np.testing.assert_array_equal(md[:12, 1], np.arange(12) % 6)
    # beatmarker: downbeat at tick 0, beats at 6, 12, 18; fixed (not the
    # reference's constant-channel bug)
    bm = BeatMarkerMetadata(6)
    down = bm.beat_symbol2index_dicts["B"]
    beat = bm.beat_symbol2index_dicts["b"]
    slur = bm.beat_symbol2index_dicts[SLUR_SYMBOL]
    assert md[0, 0] == down
    assert md[6, 0] == beat and md[12, 0] == beat and md[18, 0] == beat
    assert md[24, 0] == down
    assert md[1, 0] == slur
    # voice channel all zero
    assert (md[:, 2] == 0).all()


def test_beatmarker_bug_replication_mode():
    score = load_score("tune_simple.abc")
    bm = BeatMarkerMetadata(6, replicate_reference_bug=True)
    ch = bm.evaluate(score, 6)
    assert (ch == ch[0]).all()


def test_enharmonic_fallback():
    """Unseen spellings fall back to enharmonic equivalents instead of
    mutating the vocabulary (reference folk_dataset.py:102-112 grows dicts)."""
    from inpaintnet_tpu.data.score import Note, Pitch, Score
    from fractions import Fraction

    vocab = Vocabulary.build(["F4", "C5", REST, "OOR"])
    # E#4 (same midi as F4) spelled differently
    score = Score(
        notes=[
            Note(Fraction(0), Fraction(1), Pitch("E", 1, 4)),
            Note(Fraction(1), Fraction(3), None),
        ]
    )
    t = score_to_tensor(score, vocab)
    assert vocab.token(t[0]) == "F4"
    # totally unknown pitch -> OOR
    score2 = Score(
        notes=[
            Note(Fraction(0), Fraction(1), Pitch("G", 0, 7)),
            Note(Fraction(1), Fraction(3), None),
        ]
    )
    t2 = score_to_tensor(score2, vocab, pitch_range=(0, 127))
    assert vocab.token(t2[0]) == "OOR"


def test_offset_to_tick_unequal_grid():
    """int(offset*6) mis-indexes the 1/3-family grid positions; the
    helper maps the fractional part onto TICK_VALUES."""
    from fractions import Fraction

    from inpaintnet_tpu.data.tokenizer import TICK_VALUES, offset_to_tick

    for beat in (0, 1, 3):
        for j, tv in enumerate(TICK_VALUES):
            assert offset_to_tick(beat + tv) == beat * 6 + j
    # the motivating case: offset 3/4 is tick 5, int(4.5) would say 4
    assert offset_to_tick(Fraction(3, 4)) == 5
    assert offset_to_tick(Fraction(2, 3)) == 4


def test_isplaying_metadata_rest_ticks():
    """A >=min_num_ticks rest zeroes exactly its grid span — including
    rests starting at the 2/3 / 3/4 positions."""
    from fractions import Fraction

    from inpaintnet_tpu.data.metadata import IsPlayingMetadata
    from inpaintnet_tpu.data.score import Note, Pitch, Score

    c4 = Pitch(step="C", alter=0, octave=4)
    notes = [
        Note(offset=Fraction(0), duration=Fraction(3, 4), pitch=c4),
        Note(offset=Fraction(3, 4), duration=Fraction(5, 4), pitch=None),
        Note(offset=Fraction(2), duration=Fraction(1), pitch=c4),
    ]
    score = Score(notes=notes, time_signature=(4, 4))
    out = IsPlayingMetadata(min_num_ticks=2).evaluate(score, 6)
    # rest spans ticks [5, 12); tick 4 (offset 2/3, note sounding) stays 1
    assert out[4] == 1
    assert (out[5:12] == 0).all()
    assert out[12] == 1
