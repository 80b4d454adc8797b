"""LSTM recurrences for the AnticipationRNN family.

The reference drives per-layer ``nn.LSTM`` modules manually
(``anticipation_rnn_gauss_reg_model.py:14-39`` ``lstm_with_activations``)
with inter-layer dropout. Here each layer is a ``lax.scan`` with the input
projection batched over time (one MXU matmul), and the stack is a static
Python loop. Gate order follows torch ``[i, f, g, o]`` for checkpoint
porting.

Stack params: [layer] -> {"w_ih": (in, 4H), "w_hh": (H, 4H),
                          "b_ih": (4H,), "b_hh": (4H,)}
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from inpaintnet_tpu.ops.linear import xavier_normal


def lstm_cell_init(key, input_size: int, hidden_size: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "w_ih": xavier_normal(k1, (input_size, 4 * hidden_size), dtype),
        "w_hh": xavier_normal(k2, (hidden_size, 4 * hidden_size), dtype),
        "b_ih": jnp.zeros((4 * hidden_size,), dtype),
        "b_hh": jnp.zeros((4 * hidden_size,), dtype),
    }


def _lstm_gates(params, h, c, xw):
    hidden = h.shape[-1]
    hw = h @ params["w_hh"] + params["b_hh"]
    gates = xw + hw
    i = jax.nn.sigmoid(gates[..., :hidden])
    f = jax.nn.sigmoid(gates[..., hidden : 2 * hidden])
    g = jnp.tanh(gates[..., 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[..., 3 * hidden :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_cell_apply(params, hc, x):
    """One LSTM step. hc: ((B,H),(B,H)), x: (B,in)."""
    h, c = hc
    xw = x @ params["w_ih"] + params["b_ih"]
    return _lstm_gates(params, h, c, xw)


def lstm_layer_apply(params, x, h0, c0, *, reverse: bool = False,
                     mask=None):
    """Single LSTM layer over a sequence.

    :param x: (B, T, in); h0, c0: (B, H)
    :param mask: optional (B, T) validity mask (1 = real tick). Masked
        steps HOLD the (h, c) state, so a sequence padded at either end
        produces exactly the state trajectory of its unpadded run — the
        static-shape serving contract (mixed-length ARNN coalescing:
        suffix padding + the reversed constraint scan skips the pad
        before any real tick is reached).
    :return: (outputs (B, T, H), (h_last, c_last))
    """
    xw = x @ params["w_ih"] + params["b_ih"]
    xw_t = jnp.swapaxes(xw, 0, 1)
    mask_t = None if mask is None else jnp.swapaxes(
        mask.astype(x.dtype), 0, 1
    )

    def step(carry, inp):
        h, c = carry
        if mask_t is None:
            xwt = inp
        else:
            xwt, m = inp
        h_new, c_new = _lstm_gates(params, h, c, xwt)
        if mask_t is not None:
            keep = m[:, None] > 0
            h_new = jnp.where(keep, h_new, h)
            c_new = jnp.where(keep, c_new, c)
        return (h_new, c_new), h_new

    xs = xw_t if mask_t is None else (xw_t, mask_t)
    (h_last, c_last), outs = lax.scan(step, (h0, c0), xs, reverse=reverse)
    return jnp.swapaxes(outs, 0, 1), (h_last, c_last)


def lstm_stack_init(key, sizes, dtype=jnp.float32):
    """:param sizes: list of (input_size, hidden_size) per layer — mirrors
    the reference's explicit per-layer LSTM lists
    (anticipation_rnn_gauss_reg_model.py:100-133)."""
    keys = jax.random.split(key, len(sizes))
    return [lstm_cell_init(k, i, h, dtype) for k, (i, h) in zip(keys, sizes)]


def lstm_stack_apply(
    params,
    x,
    hidden=None,
    *,
    dropout: float = 0.0,
    rng=None,
    train: bool = False,
    mask=None,
):
    """Run a stack of LSTM layers over a sequence.

    Matches reference ``lstm_with_activations``: inter-layer dropout applied
    to each layer's output except the last.

    :param hidden: ((L, B, H), (L, B, H)) or None for zeros
    :param mask: optional (B, T) validity mask threaded to every layer
        (see :func:`lstm_layer_apply`)
    :return: (outputs (B, T, H), (h_n (L,B,H), c_n (L,B,H)),
              all_hs list of per-layer outputs)
    """
    num_layers = len(params)
    batch = x.shape[0]
    hid = params[0]["w_hh"].shape[0]
    if hidden is None:
        h0 = jnp.zeros((num_layers, batch, hid), x.dtype)
        c0 = jnp.zeros((num_layers, batch, hid), x.dtype)
    else:
        h0, c0 = hidden

    out = x
    h_n, c_n, all_hs = [], [], []
    for layer in range(num_layers):
        out, (h_last, c_last) = lstm_layer_apply(
            params[layer], out, h0[layer], c0[layer], mask=mask
        )
        if train and dropout > 0.0 and layer < num_layers - 1:
            if rng is None:
                raise ValueError("dropout requires an rng key in train mode")
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, out.shape)
            out = jnp.where(keep, out / (1.0 - dropout), 0.0)
        h_n.append(h_last)
        c_n.append(c_last)
        all_hs.append(out)
    return out, (jnp.stack(h_n), jnp.stack(c_n)), all_hs
