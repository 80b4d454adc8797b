"""Loss / metric library (reference utils/trainer.py:272-376).

All functions take raw (ReLU'd) logits and integer targets and support an
optional validity mask — the masked forms are what make the static-shape
padded batches exact: only valid positions count, and the divisor is the
valid count (matching the reference's mean over its ragged tensors).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _nll(weights, targets):
    # Mixed precision: the softmax/CE runs in float32 even when the model
    # computes in bf16 — bf16 CE quantizes both the reported loss (epoch
    # logs show repeated bucket values near convergence) and the CE
    # gradient. The upcast is free next to the GRU compute.
    logp = jax.nn.log_softmax(weights.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]


def mean_crossentropy_loss(weights, targets, mask=None):
    """CE averaged over (valid) elements.

    :param weights: (..., num_notes) logits
    :param targets: (...) int
    :param mask: optional (...) validity (1 = count)
    """
    nll = _nll(weights, targets)
    if mask is None:
        return nll.mean()
    mask = mask.astype(nll.dtype)
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def mean_accuracy(weights, targets, mask=None):
    correct = (jnp.argmax(weights, axis=-1) == targets).astype(jnp.float32)
    if mask is None:
        return correct.mean()
    mask = mask.astype(correct.dtype)
    return (correct * mask).sum() / jnp.maximum(mask.sum(), 1.0)


# 4-D aliases of the reference's *_alt variants (trainer.py:345-376) — the
# masked implementations above are rank-agnostic.
mean_crossentropy_loss_alt = mean_crossentropy_loss
mean_accuracy_alt = mean_accuracy


def mean_l1_loss(weights, targets):
    return jnp.abs(weights.astype(jnp.float32)
                   - targets.astype(jnp.float32)).mean()


def mean_mse_loss(weights, targets):
    diff = weights.astype(jnp.float32) - targets.astype(jnp.float32)
    return (diff ** 2).mean()
