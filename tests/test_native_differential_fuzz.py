"""Structured differential fuzz: Python parser/tokenizer vs the C++
tokenizer on randomly generated ABC with the constructs that have bitten
before (CLAUDE.md invariant: native/abctok.cpp must stay equivalence-
tested against the Python semantic reference).

The plain synthetic corpus (data/synthetic.py) covers simple barlines
only; the round-2 advisor found two semantic divergences (repeat pass
reset after a plain-barline second ending; 'E:|'-style field-like music
lines) that fixtures alone missed. This fuzzer generates tunes that
randomly combine: repeats, first/second endings (with ':|', '|' and '|]'
terminations), plain-barline second endings followed by a fresh '|:',
field-like music-line splits, mid-line comments, blank lines, and
section-structured bodies — then asserts the full pipeline equivalence
(parse metadata, vocab scan tokens, per-transposition encodings) via the
same _check the fixture tests use.
"""
import random

import pytest

from inpaintnet_tpu.data.native import NativeTokenizer
from inpaintnet_tpu.data.synthetic import _KEY_SCALES, _random_bar

from tests.test_native_tokenizer import _check

pytestmark = pytest.mark.skipif(
    not NativeTokenizer.available(), reason="native library not built"
)


def _fuzz_tune(rng: random.Random, idx: int) -> str:
    key = rng.choice(list(_KEY_SCALES))
    scale = _KEY_SCALES[key]

    def bar():
        return _random_bar(rng, scale)

    def section(kind: str) -> str:
        if kind == "plain":
            return "|".join(bar() for _ in range(rng.randint(2, 4))) + "|"
        if kind == "repeat":
            return ("|:" + "|".join(bar() for _ in range(rng.randint(1, 3)))
                    + ":|")
        # endings: |: A [1 B :| [2 C <term>
        term = rng.choice([":|", "|", "|]"]) if kind == "endings_last" \
            else rng.choice(["|", "|"])  # plain barline — the advisor case
        return ("|:" + bar() + "|" + bar()
                + "|[1 " + bar() + ":|[2 " + bar() + term)

    kinds = []
    n = rng.randint(1, 3)
    for s in range(n):
        k = rng.choice(["plain", "repeat", "endings"])
        if k == "endings" and s == n - 1:
            k = "endings_last"
        kinds.append(k)
    body = "\n".join(section(k) for k in kinds)
    if not body.rstrip().endswith(("|]", ":|")):
        body = body.rstrip("|") + "|]"

    # field-like music-line split: break a line so the continuation
    # starts '<note>:|' (looks like an info field but is body content)
    if rng.random() < 0.4 and ":|" in body:
        at = body.index(":|")
        # single uppercase note so the continuation line reads '<A-G>:|'
        note = rng.choice([c for c in scale if c.isupper()] or ["E"])
        body = body[:at] + "\n" + note + body[at:]

    lines = body.split("\n")
    if rng.random() < 0.5:
        lines.insert(rng.randrange(len(lines)), "% a comment line")
    if rng.random() < 0.3:
        lines.append("")
    body = "\n".join(lines)
    return (f"X:{idx}\nT:Fuzz {idx}\n% header comment\nM:4/4\nL:1/8\n"
            f"K:{key}\n{body}\n")


@pytest.mark.parametrize("seed", range(50))
def test_differential_fuzz(seed):
    rng = random.Random(1000 + seed)
    text = _fuzz_tune(rng, seed)
    try:
        _check(text)
    except AssertionError:
        print("diverging tune:\n" + text)
        raise
