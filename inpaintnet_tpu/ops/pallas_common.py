"""Shared pieces for the Pallas TPU kernels.

Centralizes the GRU gate math (the [r, z, n] torch gate order is a
load-bearing checkpoint-porting invariant — one copy, not three) and the
kernel-vs-autodiff bridging used by every serving kernel.
"""
from __future__ import annotations

import os

import jax


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def interpret_default() -> bool:
    """Test hook: INPAINTNET_PALLAS_INTERPRET=1 runs every kernel in the
    Pallas interpreter (lets CPU tests exercise the full kernel routing,
    including the autodiff fallback below)."""
    return os.environ.get("INPAINTNET_PALLAS_INTERPRET", "0") == "1"


def gru_gates_f32(xw, hw, h_prev, hidden: int):
    """Torch-order [r, z, n] GRU gate math in f32 (ops/gru.py:_gru_gates,
    with the matmul products precomputed by the caller)."""
    import jax.numpy as jnp

    r = jax.nn.sigmoid(xw[:, :hidden] + hw[:, :hidden])
    z = jax.nn.sigmoid(xw[:, hidden : 2 * hidden] + hw[:, hidden : 2 * hidden])
    n = jnp.tanh(xw[:, 2 * hidden :] + r * hw[:, 2 * hidden :])
    return (1.0 - z) * n + z * h_prev


def lstm_gates_f32(xw, hw, h_prev, c_prev, hidden: int):
    """Torch-order [i, f, g, o] LSTM gate math in f32
    (ops/lstm.py:_lstm_gates with precomputed matmul products).

    :return: (h_new, c_new)
    """
    import jax.numpy as jnp

    gates = xw + hw
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden :])
    c_new = f * c_prev + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def kernel_with_xla_grad(kernel_fn, xla_fn):
    """Make a forward-only Pallas kernel differentiable by delegating
    reverse-mode AD to an equivalent XLA implementation.

    ``pl.pallas_call`` has no autodiff rule, but every serving kernel here
    has a numerically-matching XLA formulation (the parity-tested scan).
    The returned function runs ``kernel_fn`` for primal values and, under
    ``jax.grad``/``jax.vjp``, linearizes ``xla_fn`` at the same inputs —
    so e.g. LatentRNN training on TPU (which differentiates through the
    frozen-VAE decode) gets kernel-speed forward evals outside the loss
    and exact scan gradients inside it.

    Both functions must take the same positional args and return the same
    output structure. Residuals are the inputs (bwd recomputes — remat
    semantics, which these memory-bound kernels prefer anyway).
    """

    @jax.custom_vjp
    def f(*args):
        return kernel_fn(*args)

    def fwd(*args):
        return kernel_fn(*args), args

    def bwd(args, cotangents):
        _, vjp = jax.vjp(xla_fn, *args)
        return vjp(cotangents)

    f.defvjp(fwd, bwd)
    return f
