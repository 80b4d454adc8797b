"""Debug / sanity-check utilities.

The reference sweeps every weight tensor for NaNs on EVERY forward pass
(encoder.py:111-116, decoder.py:424-429 — a host sync per step) and
validates sampled indices with a GPU->CPU copy (decoder.py:34-45). Under
XLA those checks can't live inside compiled code as Python; the equivalents
here are:

- ``nan_check(params)``: host-side pytree sweep, called by trainers once
  per epoch when ``debug=True`` (raises with the offending parameter path);
- ``checkify_wrap(fn)``: a ``jax.experimental.checkify`` wrapper that turns
  NaN/OOB errors inside a jitted function into returned errors, for
  debugging runs;
- ``assert_finite(tree, name)``: raising host-side check for outputs.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np


def nan_check(params: Any, what: str = "params") -> None:
    """Raise ValueError naming the first parameter containing NaN/Inf."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
            raise ValueError(f"{what} has become non-finite at {key}")


def assert_finite(tree: Any, name: str = "output") -> None:
    for leaf in jax.tree_util.tree_leaves(tree):
        if not np.isfinite(np.asarray(leaf)).all():
            raise ValueError(f"{name} contains non-finite values")


def checkify_wrap(fn):
    """Wrap a jittable fn so NaN / div-by-zero / OOB indexing inside it are
    captured as checkify errors: ``err, out = wrapped(*args)``;
    ``err.throw()`` raises with location info."""
    from jax.experimental import checkify

    checks = checkify.float_checks | checkify.index_checks | checkify.div_checks
    return checkify.checkify(fn, errors=checks)
