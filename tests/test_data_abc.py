"""ABC parser + score IR unit tests (golden semantics, hand-derived)."""
import os
from fractions import Fraction

import pytest

from inpaintnet_tpu.data.abc_parser import parse_abc, key_signature_alters
from inpaintnet_tpu.data.score import Pitch

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def load(name):
    with open(os.path.join(FIX, name)) as f:
        return f.read()


def test_key_signatures():
    assert key_signature_alters("D") == {"F": 1, "C": 1}
    assert key_signature_alters("G") == {"F": 1}
    assert key_signature_alters("Em") == {"F": 1}
    assert key_signature_alters("Ador") == {"F": 1}
    assert key_signature_alters("Amix") == {"F": 1, "C": 1}
    assert key_signature_alters("F") == {"B": -1}
    assert key_signature_alters("Bm") == {"F": 1, "C": 1}
    assert key_signature_alters("C") == {}
    assert key_signature_alters("Edor") == {"F": 1, "C": 1}
    assert key_signature_alters("Bmin") == {"F": 1, "C": 1}
    assert key_signature_alters("Gmaj") == {"F": 1}


def test_simple_tune_parses():
    score = parse_abc(load("tune_simple.abc"))
    assert score.time_signature == (4, 4)
    assert score.title == "Simple Test Reel"
    # 4 bars of 4/4
    assert score.highest_time == 16
    # first note D4 eighth
    n0 = score.notes[0]
    assert n0.pitch.name == "D4"
    assert n0.duration == Fraction(1, 2)
    assert n0.offset == 0
    # key of D: F and C are sharp
    names = [n.pitch.name if n.pitch else "rest" for n in score.notes]
    assert names[1] == "F#4"
    # rest present (z2)
    assert "rest" in names
    # d2 -> D5 quarter
    d5 = [n for n in score.notes if n.pitch and n.pitch.name == "D5"][0]
    assert d5.duration == Fraction(1)
    # final A4 half note
    assert score.notes[-1].duration == Fraction(2)
    # all offsets on the tick grid
    from inpaintnet_tpu.data.tokenizer import TICK_VALUES

    assert score.on_ticks(TICK_VALUES)


def test_repeats_expansion():
    score = parse_abc(load("tune_repeats.abc"))
    # |:A|1 B:|2 C|] expands to A B A C -> 4 bars of 4/4
    assert score.highest_time == 16
    # bar 1 and bar 3 identical
    bar = lambda k: [
        (n.pitch.name if n.pitch else "rest", n.duration)
        for n in score.notes
        if k * 4 <= n.offset < (k + 1) * 4
    ]
    assert bar(0) == bar(2)
    assert bar(1) != bar(3)
    # second ending ends on D5
    assert score.notes[-1].pitch.name == "D5"


def test_repeats_unexpanded():
    score = parse_abc(load("tune_repeats.abc"), expand_repeats=False)
    assert score.highest_time == 12  # 3 written bars


def test_triplets_dots_accidentals():
    score = parse_abc(load("tune_triplet.abc"))
    names_durs = [
        (n.pitch.name if n.pitch else "rest", n.duration) for n in score.notes
    ]
    # bar 1: E2 (3FGF E2 ^D2
    assert names_durs[0] == ("E4", Fraction(1))
    assert names_durs[1] == ("F#4", Fraction(1, 3))  # triplet eighth, key Em -> F#
    assert names_durs[2] == ("G4", Fraction(1, 3))
    assert names_durs[3] == ("F#4", Fraction(1, 3))
    assert names_durs[4] == ("E4", Fraction(1))
    assert names_durs[5] == ("D#4", Fraction(1))  # explicit ^D
    # bar 2: E>F dotted pair; =D natural
    assert names_durs[6] == ("E4", Fraction(3, 4))
    assert names_durs[7] == ("F#4", Fraction(1, 4))
    assert names_durs[8] == ("G4", Fraction(1))
    assert names_durs[9] == ("D4", Fraction(1))  # natural sign
    # bar 3 starts with B,2 -> B3
    assert names_durs[11] == ("B3", Fraction(1))
    # total = 4 bars
    assert score.highest_time == 16


def test_measure_accidental_persistence():
    abc = """X:1
T:t
M:4/4
L:1/4
K:C
^F F G F|F4|]
"""
    score = parse_abc(abc)
    names = [n.pitch.name for n in score.notes]
    # ^F persists for the bar, resets at barline
    assert names == ["F#4", "F#4", "G4", "F#4", "F4"]


def test_transposition_spelling():
    assert Pitch.from_name("C4").transpose(1).name == "D-4"
    assert Pitch.from_name("C4").transpose(2).name == "D4"
    assert Pitch.from_name("C4").transpose(-1).name == "B3"
    assert Pitch.from_name("F#4").transpose(1).name == "G4"
    assert Pitch.from_name("B3").transpose(1).name == "C4"
    assert Pitch.from_name("C4").transpose(12).name == "C5"
    assert Pitch.from_name("E4").transpose(6).name == "B-4"
    # midi consistency for every shift
    for s in range(-12, 13):
        p = Pitch.from_name("A4")
        assert p.transpose(s).midi == p.midi + s


def test_pickup_fix():
    abc = """X:1
T:pickup
M:4/4
L:1/8
K:C
AB|c2 d2 e2 f2|g8|]
"""
    score = parse_abc(abc).fix_pick_up_measure().fix_last_measure()
    # leading rest of 3 beats inserted
    assert score.notes[0].is_rest
    assert score.notes[0].duration == Fraction(3)
    assert score.notes[1].pitch.name == "A4"
    assert score.notes[1].offset == Fraction(3)
    assert score.highest_time == 12  # 3 full bars


def test_cut_time_and_default_unit():
    abc = """X:1
T:cut
M:C|
K:C
CDEF|]
"""
    score = parse_abc(abc)
    assert score.time_signature == (2, 2)
    # M:C| = 2/2 < 0.75? no: 1.0 >= 0.75 -> default L:1/8
    assert score.notes[0].duration == Fraction(1, 2)


def test_chord_symbols_rejected():
    abc = 'X:1\nT:c\nM:4/4\nK:C\n"G" GABc|]\n'
    with pytest.raises(Exception):
        parse_abc(abc)


def test_body_info_lines_skipped():
    """Info lines inside the body (W: lyrics, N: notes) are never read as
    note letters — in both the Python parser and the native tokenizer."""
    abc = """X:1
T:t
M:4/4
L:1/4
K:C
CDEF|
W:we all live in a yellow submarine
GABc|]
"""
    score = parse_abc(abc)
    names = [n.pitch.name for n in score.notes]
    assert names == ["C4", "D4", "E4", "F4", "G4", "A4", "B4", "C5"]

    from inpaintnet_tpu.data.native import NativeTokenizer

    if NativeTokenizer.available():
        info = NativeTokenizer.info(abc)
        assert info["num_notes"] == 8
