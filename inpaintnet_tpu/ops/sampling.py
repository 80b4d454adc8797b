"""Token sampling used by the autoregressive decoders.

Reference semantics (``decoder.py:500-518``):
- ``argmax``: top-1 of the (ReLU'd) logits — used at eval.
- ``multinomial``: softmax of logits then multinomial draw.
``jax.random.categorical(key, logits)`` is exactly softmax+multinomial.
Sampling never backpropagates (reference detaches), so we stop gradients.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_argmax(logits):
    return jnp.argmax(jax.lax.stop_gradient(logits), axis=-1)


def sample_categorical(key, logits, temperature: float = 1.0):
    logits = jax.lax.stop_gradient(logits)
    if temperature != 1.0:
        logits = logits / temperature
    return jax.random.categorical(key, logits, axis=-1)
