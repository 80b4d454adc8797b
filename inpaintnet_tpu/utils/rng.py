"""Explicit RNG plumbing.

The reference relies on global RNG state (``random.random()`` at
decoder.py:432, ``torch.randint`` at latent_rnn_trainer.py:100-117 of the
reference). In JAX all randomness is explicit; ``RngStream`` is a tiny
host-side splitter used by trainers to derive per-step keys
deterministically from one seed.
"""
from __future__ import annotations

import jax


class RngStream:
    """Host-side stateful wrapper around ``jax.random.split``.

    Only used *outside* jitted code (trainer loops). Inside jitted train
    steps, keys are threaded functionally.
    """

    def __init__(self, seed_or_key, impl: str | None = None):
        """``impl`` picks the key implementation for int seeds (e.g.
        ``"rbg"`` for the TPU hardware RNG — key DERIVATION inside a
        jitted step is then near-free where threefry pays a hash per
        split/fold_in); None keeps the jax default (threefry)."""
        if isinstance(seed_or_key, int):
            if impl is None:
                self._key = jax.random.PRNGKey(seed_or_key)
            else:
                self._key = jax.random.key(seed_or_key, impl=impl)
        else:
            self._key = seed_or_key

    def next(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def next_n(self, n: int):
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs
