"""Dense / embedding primitives as explicit param pytrees.

Initialization mirrors the reference's Xavier-normal sweep over every
``weight`` tensor (reference ``MeasureVAE/encoder.py:71-78``,
``decoder.py:47-54``): xavier-normal for matrices, zeros for biases,
N(0,1) for embeddings (torch ``nn.Embedding`` default — the reference's
xavier pass also hits embedding weights, but xavier-normal on an embedding
table is just a normal with std sqrt(2/(V+D)); we keep that behaviour).

Weights are stored ``(in_dim, out_dim)`` so application is a single
right-multiplication that XLA tiles onto the MXU.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xavier_normal(key, shape, dtype=jnp.float32):
    """Xavier/Glorot normal: std = sqrt(2 / (fan_in + fan_out)).

    Symmetric in (fan_in, fan_out), so identical for torch's (out, in)
    layout and our (in, out) layout.
    """
    fan_in, fan_out = shape[-2], shape[-1]
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def linear_init(key, in_dim: int, out_dim: int, dtype=jnp.float32):
    return {
        "w": xavier_normal(key, (in_dim, out_dim), dtype),
        "b": jnp.zeros((out_dim,), dtype),
    }


def linear_apply(params, x):
    return x @ params["w"] + params["b"]


def mlp_selu_init(key, in_dim: int, hidden_dim: int, out_dim: int, dtype=jnp.float32):
    """Two-layer ``Linear -> SELU -> Linear`` head.

    Matches the reference's mean/log-std heads (``encoder.py:40-52``) and
    the SRDecoder z-projection (``decoder.py:78-83``).
    """
    k1, k2 = jax.random.split(key)
    return {
        "l1": linear_init(k1, in_dim, hidden_dim, dtype),
        "l2": linear_init(k2, hidden_dim, out_dim, dtype),
    }


def mlp_selu_apply(params, x):
    h = jax.nn.selu(linear_apply(params["l1"], x))
    return linear_apply(params["l2"], h)


def embedding_init(key, num_embeddings: int, dim: int, dtype=jnp.float32):
    std = math.sqrt(2.0 / (num_embeddings + dim))
    return {"table": std * jax.random.normal(key, (num_embeddings, dim), dtype)}


def embedding_apply(params, indices):
    """Token lookup. ``indices``: int array of any shape -> (+,dim)."""
    return jnp.take(params["table"], indices, axis=0)
