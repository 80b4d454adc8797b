"""ABC parser robustness: arbitrary/malformed input must either parse or
raise AbcParseError/ValueError — never crash, hang, or corrupt state.
Matters because real Session-corpus ingest hits a long tail of odd ABC
(the reference catches 12 exception types, folk_data_helpers.py:330-344)."""
import random
import string

import pytest

from inpaintnet_tpu.data.abc_parser import AbcParseError, parse_abc
from inpaintnet_tpu.data.synthetic import generate_tune


def _try(text):
    try:
        score = parse_abc(text)
        # basic invariants when it does parse
        for n in score.notes:
            assert n.duration > 0
            assert n.offset >= 0
    except (AbcParseError, ValueError, ZeroDivisionError, KeyError):
        pass


def test_empty_and_header_only():
    _try("")
    _try("X:1\nT:t\n")
    _try("X:1\nT:t\nK:C\n")
    with pytest.raises(Exception):
        parse_abc("no headers at all CDEF")  # missing K:


def test_malformed_bodies():
    cases = [
        "X:1\nT:t\nM:4/4\nK:C\n|||||||\n",
        "X:1\nT:t\nM:4/4\nK:C\n:|:|:|\n",
        "X:1\nT:t\nM:4/4\nK:C\nC/////D\n",
        "X:1\nT:t\nM:4/4\nK:C\n(3(3(3CDE\n",
        "X:1\nT:t\nM:4/4\nK:C\nC>>>>D\n",
        "X:1\nT:t\nM:4/4\nK:C\n^^^^C\n",
        "X:1\nT:t\nM:0/0\nK:C\nCDEF\n",
        "X:1\nT:t\nM:4/4\nL:0/8\nK:C\nCDEF\n",
        "X:1\nT:t\nM:4/4\nK:Zzz\nCDEF\n",
        "X:1\nT:t\nM:4/4\nK:C\n[1 C [2 D\n",
        "X:1\nT:t\nM:4/4\nK:C\n{grace only}\n",
        "X:1\nT:t\nM:4/4\nK:C\n!deco C !other D\n",
        "X:1\nT:t\nM:4/4\nK:C\nC" + "'" * 40 + "\n",  # absurd octave marks
        "X:1\nT:t\nM:4/4\nK:C\nC99999999\n",
    ]
    for c in cases:
        _try(c)


def test_random_garbage_never_crashes():
    rng = random.Random(0)
    alphabet = string.ascii_letters + string.digits + "|:[](){}^_=<>/',.!~ \n\"-"
    for i in range(200):
        body = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 120)))
        _try(f"X:1\nT:fuzz{i}\nM:4/4\nK:C\n{body}\n")


def test_mutated_valid_tunes():
    """Random single-char mutations of valid tunes parse or raise cleanly."""
    rng = random.Random(1)
    base = generate_tune(rng, 0, num_bars=8)
    for i in range(150):
        pos = rng.randrange(len(base))
        ch = rng.choice(string.printable)
        _try(base[:pos] + ch + base[pos + 1 :])


# --------------------------------------------------------------------------- #
# Real-corpus tail constructs (mid-tune fields, inline fields, voice markers,
# ornaments) — semantic behavior, not just crash-freedom
# --------------------------------------------------------------------------- #

def _midis(score):
    return [n.pitch.midi for n in score.notes if n.is_note]


def test_mid_tune_key_change_applies_forward():
    """A mid-body K: line changes the key signature for later notes only."""
    score = parse_abc("X:1\nT:t\nM:4/4\nK:C\nF4F4|\nK:G\nF4F4|\n")
    f_nat, f_sharp = 65, 66
    assert _midis(score) == [f_nat, f_nat, f_sharp, f_sharp]


def test_mid_tune_unit_length_change():
    """A mid-body L: line rescales subsequent durations."""
    score = parse_abc("X:1\nT:t\nM:4/4\nL:1/8\nK:C\nC|\nL:1/4\nC|\n")
    durs = [n.duration for n in score.notes]
    assert durs[1] == 2 * durs[0]


def test_mid_tune_meter_change_keeps_opening_signature():
    """Score-level time signature is the OPENING one (music21 semantics);
    the validity filter separately drops multi-signature tunes like the
    reference (folk_data_helpers.py:287-289)."""
    score = parse_abc("X:1\nT:t\nM:4/4\nK:C\nC4D4E4F4|\nM:6/8\nCDE CDE|\n")
    assert tuple(score.time_signature) == (4, 4)


def test_field_between_key_and_music():
    """M:/L: lines appearing after K: but before any music count as headers."""
    score = parse_abc("X:1\nT:t\nK:C\nM:6/8\nL:1/8\nCDE CDE|\n")
    assert tuple(score.time_signature) == (6, 8)


def test_inline_fields_and_voice_markers():
    _try("X:1\nT:t\nM:4/4\nK:C\nC4 [K:D] F4 | [M:6/8] CDE CDE | [L:1/4] C |\n")
    # inline [V:...] and mid-body V: lines are ignored (multi-voice tunes
    # are dropped by the validity filter, not the parser)
    score = parse_abc("X:1\nT:t\nM:4/4\nK:C\nV:1\nC4D4E4F4|\n")
    assert len(_midis(score)) == 4
    score = parse_abc("X:1\nT:t\nM:4/4\nK:C\n[V:1] C4D4E4F4|\n")
    assert len(_midis(score)) == 4


def test_ornaments_and_decorations_are_transparent():
    plain = parse_abc("X:1\nT:t\nM:4/4\nK:C\nC2D2E2F2|\n")
    decorated = parse_abc(
        "X:1\nT:t\nM:4/4\nK:C\n~C2 .D2 !trill!E2 {ag}F2|\n"
    )
    assert _midis(decorated) == _midis(plain)
    assert [n.duration for n in decorated.notes] == [n.duration for n in plain.notes]


def test_multiline_fuzz_with_fields():
    """Fuzz bodies that interleave music lines with field lines."""
    rng = random.Random(7)
    fields = ["K:D", "M:6/8", "L:1/4", "V:2", "W:la la", "N:note", "R:reel"]
    alphabet = string.ascii_letters + string.digits + "|:[](){}^_=<>/',.! \n"
    for i in range(100):
        lines = []
        for _ in range(rng.randint(1, 6)):
            if rng.random() < 0.4:
                lines.append(rng.choice(fields))
            else:
                lines.append(
                    "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
                )
        _try("X:1\nT:fz\nM:4/4\nK:C\n" + "\n".join(lines) + "\n")


# --------------------------------------------------------------------------- #
# Validity filter: drops exactly what the reference drops
# (folk_data_helpers.py:248-349)
# --------------------------------------------------------------------------- #

GOOD = "X:1\nT:good tune\nM:4/4\nL:1/8\nK:C\n" + "C2D2E2F2|G2A2B2c2|\n" * 2


def _filter_case(tmp_path, text):
    import os

    from inpaintnet_tpu.data.corpus import FolkCorpus

    d = tmp_path
    (d / "tune_0.abc").write_text(text)
    corpus = FolkCorpus(str(d), cache_dir=str(d / "cache"))
    return corpus.is_valid(str(d / "tune_0.abc"))


@pytest.mark.parametrize(
    "name,text,valid",
    [
        ("good", GOOD, True),
        ("no_title", GOOD.replace("T:good tune\n", ""), False),
        ("multivoice", GOOD.replace("K:C\n", "K:C\nV:2\n"), False),
        ("multivoice_spaced", GOOD.replace("K:C\n", "K:C\nV: 2\n"), False),
        ("chords", GOOD + '"Am" G2A2B2c2|\n', False),
        ("bad_time_sig", GOOD.replace("M:4/4", "M:3/4"), False),
        ("mid_tune_meter", GOOD + "M:6/8\nCDE CDE|\n", False),
        ("mid_tune_meter_same", GOOD + "M:4/4\nC2D2E2F2|\n", False),
        ("thirtysecond_notes", GOOD + "C/4D/4E/4F/4C/4D/4E/4F/4C2D2E2|\n", False),
        ("off_tick", GOOD + "C7/8D9/8C7/8D9/8C7/8D9/8C7/8D9/8|\n", False),
        ("no_notes", "X:1\nT:t\nM:4/4\nK:C\nz8|z8|\n", False),
        ("unparseable", "X:1\nT:t\nM:4/4\nK:C\n[ceg]4|\n", False),
        (
            "too_many_notes",
            "X:1\nT:t\nM:4/4\nL:1/8\nK:C\n" + "CDEFGABc|" * 20 + "\n",
            False,
        ),
    ],
)
def test_validity_filter_matches_reference(tmp_path, name, text, valid):
    assert _filter_case(tmp_path, text) is valid


def test_reference_shipped_valid_list_is_reused(tmp_path):
    """The cache naming scheme matches the reference exactly, so its
    SHIPPED 13,684-tune valid-file list is picked up verbatim (no re-scan
    of raw files needed)."""
    import os
    import shutil

    from inpaintnet_tpu.data.corpus import FolkCorpus

    shipped = (
        "/root/reference/DatasetManager/the_session/"
        "FolkItGen([(4,4)])valid_filepaths.txt"
    )
    if not os.path.exists(shipped):
        pytest.skip("reference checkout not available")
    cache = tmp_path / "cache"
    cache.mkdir()
    shutil.copy(shipped, cache / "FolkItGen([(4,4)])valid_filepaths.txt")
    corpus = FolkCorpus(str(tmp_path / "raw"), cache_dir=str(cache))
    assert repr(corpus) == "FolkItGen([(4,4)])"
    names = corpus.valid_tune_filenames
    assert len(names) == 13684
    assert names[0].startswith("tune_") and names[0].endswith(".abc")


def test_stale_sidecarless_valid_list_rebuilt(tmp_path):
    """A self-generated valid list WITHOUT a version sidecar (pre-versioning
    cache) is NOT trusted — only hash-verified reference-shipped lists are."""
    from inpaintnet_tpu.data.corpus import FILTER_VERSION, FolkCorpus

    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "tune_0.abc").write_text(GOOD)
    cache = tmp_path / "cache"
    cache.mkdir()
    # fabricate a stale sidecar-less cache claiming a bogus file is valid
    lst = cache / "FolkItGen([(4,4)])valid_filepaths.txt"
    lst.write_text("tune_999.abc\n")
    corpus = FolkCorpus(str(raw), cache_dir=str(cache))
    names = corpus.valid_tune_filenames
    assert names == ["tune_0.abc"]  # re-scanned, not the stale content
    meta = (cache / "FolkItGen([(4,4)])valid_filepaths.txt.meta").read_text()
    assert meta.strip() == f"filter_version={FILTER_VERSION}"


def test_repeat_reset_after_second_ending_plain_bar():
    """A second ending that finishes on a PLAIN barline must reset the
    pass counter: the next |: section's [1 ending plays and its repeat is
    taken (previously C D C E F A — G lost, second repeat skipped)."""
    from inpaintnet_tpu.data.abc_parser import parse_abc

    tune = ("X:1\nT:t\nM:4/4\nL:1/4\nK:C\n"
            "|: C4 |1 D4 :|[2 E4 | |: F4 |1 G4 :|[2 A4 |]\n")
    steps = [n.pitch.step for n in parse_abc(tune).notes]
    assert steps == ["C", "D", "C", "E", "F", "G", "F", "A"], steps


def test_thick_thin_barline_accepted():
    """'[|' is a valid ABC barline (previously raised as an unsupported
    '[' construct even though _BARLINE_RE matches it)."""
    from inpaintnet_tpu.data.abc_parser import parse_abc

    tune = "X:1\nT:t\nM:4/4\nL:1/4\nK:C\nC D E F [| G A G A |]\n"
    steps = [n.pitch.step for n in parse_abc(tune).notes]
    assert steps == ["C", "D", "E", "F", "G", "A", "G", "A"]


def test_body_line_starting_note_colon_is_music():
    """'E:| ...' at line start is one note completing a bar before a
    repeat-end — not an info field (previously the whole line of music
    was silently dropped)."""
    from inpaintnet_tpu.data.abc_parser import parse_abc

    tune = "X:1\nT:t\nM:4/4\nL:1/4\nK:C\n|: C4\nE:| F4 F4 F4 F4 |]\n"
    steps = [n.pitch.step for n in parse_abc(tune).notes]
    # repeat: C E C E, then the F bar
    assert steps == ["C", "E", "C", "E", "F", "F", "F", "F"], steps
    # real body info lines still dropped
    tune2 = "X:1\nT:t\nM:4/4\nL:1/4\nK:C\nC4 C4 C4 C4 |\nN: comment\nD4 D4 D4 D4 |]\n"
    steps2 = [n.pitch.step for n in parse_abc(tune2).notes]
    assert steps2 == ["C"] * 4 + ["D"] * 4


def test_parse_abc_return_both_matches_separate_parses():
    """The single-pass (unexpanded, expanded) views equal two separate
    parses — the validity filter's semantics are unchanged by the
    single-tokenization optimization."""
    from inpaintnet_tpu.data.abc_parser import parse_abc

    tune = ("X:1\nT:t\nM:4/4\nL:1/8\nK:D\n"
            "|: D2 F2 A2 d2 |1 e2 f2 e2 d2 :|[2 B2 A2 F2 D2 |]\n")
    un, ex = parse_abc(tune, return_both=True)
    un_ref = parse_abc(tune, expand_repeats=False)
    ex_ref = parse_abc(tune, expand_repeats=True)
    assert [ (n.offset, n.duration, n.pitch) for n in un.notes ] == \
           [ (n.offset, n.duration, n.pitch) for n in un_ref.notes ]
    assert [ (n.offset, n.duration, n.pitch) for n in ex.notes ] == \
           [ (n.offset, n.duration, n.pitch) for n in ex_ref.notes ]
    assert un.bar_durations == un_ref.bar_durations
    assert ex.bar_durations == ex_ref.bar_durations
