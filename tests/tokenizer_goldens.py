"""Version-stamped tokenizer goldens for the vendored fixture tunes.

The committed JSON (``tests/goldens/tokenizer_v1.json``) freezes the full
observable output of the tokenization pipeline — transposition-interval
selection, per-transposition token-string streams, the built vocabulary,
and the encoded tick-grid id tensors — so future parser/tokenizer refactors
diff against BYTES, not just roundtrip invariants
(tests/test_tokenizer_goldens.py compares; the native C++ path is held to
the same goldens).

Regenerate (after an INTENTIONAL semantic change, bumping ``VERSION``):

    python tests/tokenizer_goldens.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inpaintnet_tpu.data.abc_parser import parse_abc
from inpaintnet_tpu.data.tokenizer import (
    Vocabulary,
    all_transposition_semitones,
    score_to_tensor,
    score_tokens,
)

VERSION = 1
FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "goldens",
    f"tokenizer_v{VERSION}.json",
)


def pipeline(text):
    """The canonical fixture pipeline (same as test_native_tokenizer)."""
    score = parse_abc(text).fix_pick_up_measure().fix_last_measure()
    semis = all_transposition_semitones(score)
    tokens = {}
    for s in semis:
        tokens[s] = score_tokens(score.transpose(s))
    vocab = Vocabulary.build(t for s in semis for t in tokens[s])
    encodings = {
        s: score_to_tensor(score.transpose(s), vocab).tolist() for s in semis
    }
    return score, semis, tokens, vocab, encodings


def compute_goldens() -> dict:
    out = {"version": VERSION, "tunes": {}}
    for fn in sorted(os.listdir(FIX)):
        if not fn.endswith(".abc"):
            continue
        with open(os.path.join(FIX, fn)) as f:
            text = f.read()
        score, semis, tokens, vocab, encodings = pipeline(text)
        out["tunes"][fn] = {
            "time_signature": list(score.time_signature),
            "pitch_range": list(score.pitch_range()),
            "total_ticks": int(score.highest_time * 6),
            "semitones": list(semis),
            "tokens": {str(s): tokens[s] for s in semis},
            "vocab": [vocab.token(i) for i in range(len(vocab))],
            "encodings": {str(s): encodings[s] for s in semis},
        }
    return out


def main():
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(compute_goldens(), f, indent=1, sort_keys=True)
    print(f"wrote {GOLDEN_PATH}")


# --------------------------------------------------------------------- #
# Corpus-scale structured goldens (round-3 verdict item #7): 100
# structured-generator tunes, full token streams + vocab + encoded id
# tensors, one gzip file. The ABC texts are frozen INTO the golden file,
# so later generator evolution cannot silently invalidate them — the
# goldens pin the TOKENIZER, not the generator.
# --------------------------------------------------------------------- #

STRUCTURED_VERSION = 1
STRUCTURED_COUNT = 100
STRUCTURED_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "goldens",
    f"tokenizer_structured_v{STRUCTURED_VERSION}.json.gz",
)


def compute_structured_goldens() -> dict:
    import random

    from inpaintnet_tpu.data.synthetic import generate_structured_tune

    rng = random.Random(100)
    tunes = {}
    for i in range(STRUCTURED_COUNT):
        text = generate_structured_tune(rng, i, num_bars=16)
        score, semis, tokens, vocab, encodings = pipeline(text)
        tunes[str(i)] = {
            "abc": text,
            "time_signature": list(score.time_signature),
            "pitch_range": list(score.pitch_range()),
            "total_ticks": int(score.highest_time * 6),
            "semitones": list(semis),
            "tokens": {str(s): tokens[s] for s in semis},
            "vocab": [vocab.token(i) for i in range(len(vocab))],
            "encodings": {str(s): encodings[s] for s in semis},
        }
    return {"version": STRUCTURED_VERSION, "tunes": tunes}


def load_structured_goldens() -> dict:
    import gzip

    with gzip.open(STRUCTURED_PATH, "rt") as f:
        return json.load(f)


def main_structured():
    import gzip

    os.makedirs(os.path.dirname(STRUCTURED_PATH), exist_ok=True)
    data = json.dumps(compute_structured_goldens(), sort_keys=True)
    # fixed mtime=0 so regeneration with identical content is byte-stable
    with open(STRUCTURED_PATH, "wb") as raw:
        with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as f:
            f.write(data.encode())
    print(f"wrote {STRUCTURED_PATH} ({os.path.getsize(STRUCTURED_PATH)} B)")


if __name__ == "__main__":
    if "--structured" in sys.argv:
        main_structured()
    else:
        main()
