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
