"""Synthetic folk-corpus generator.

The reference downloads The Session dump over the network
(folk_data_helpers.py:204-210); in hermetic environments that's impossible,
and tests/benchmarks need realistic corpora. This generates random but
musically well-formed ABC tunes (diatonic folk-style melodies, 4/4, in the
[55, 84] pitch range, on the tick grid) that flow through the exact same
ingest path as real data.
"""
from __future__ import annotations

import os
import random
from typing import List

_KEYS = ["D", "G", "A", "Em", "Ador", "Bm", "C", "F"]
_KEY_SCALES = {
    # scale degrees as ABC note letters around the octave C4..B4 (uppercase)
    "D": "DEFGABc",
    "G": "GABcde" + "F",
    "A": "ABcde" + "FG",
    "Em": "EFGABcd",
    "Ador": "ABcdeFG",
    "Bm": "Bcde" + "FGA",
    "C": "CDEFGAB",
    "F": "FGABcde",
}


def _random_bar(rng: random.Random, scale: str, eighths: int = 8) -> str:
    """One bar of ``eighths`` eighth-notes with occasional
    quarters/sixteenths."""
    out: List[str] = []
    while eighths > 0:
        r = rng.random()
        if r < 0.15 and eighths >= 2:
            out.append(rng.choice(scale) + "2")  # quarter
            eighths -= 2
        elif r < 0.25 and eighths >= 1:
            a, b = rng.choice(scale), rng.choice(scale)
            out.append(a + "/" + b + "/")  # two sixteenths
            eighths -= 1
        elif r < 0.30 and eighths >= 1:
            out.append("z")
            eighths -= 1
        else:
            out.append(rng.choice(scale))
            eighths -= 1
    return " ".join(out)


def generate_tune(
    rng: random.Random, index: int, num_bars: int = 8, time_sig=(4, 4)
) -> str:
    key = rng.choice(_KEYS)
    scale = _KEY_SCALES[key]
    num, den = time_sig
    eighths = num * 8 // den
    bars = [_random_bar(rng, scale, eighths) for _ in range(num_bars)]
    lines = "\n".join(
        "|".join(bars[i : i + 4]) + ("|]" if i + 4 >= num_bars else "|")
        for i in range(0, num_bars, 4)
    )
    return (
        f"X:{index}\nT:Synthetic Tune {index}\nM:{num}/{den}\nL:1/8\n"
        f"K:{key}\n{lines}\n"
    )


def generate_corpus(
    out_dir: str, num_tunes: int = 50, num_bars: int = 8, seed: int = 0,
    time_sig=(4, 4),
) -> List[str]:
    """Write ``tune_<i>.abc`` files; returns the filenames."""
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(seed)
    names = []
    for i in range(num_tunes):
        fn = f"tune_{i}.abc"
        with open(os.path.join(out_dir, fn), "w") as f:
            f.write(generate_tune(rng, i, num_bars, time_sig))
        names.append(fn)
    return names
