"""Training-optimized GRU layer: minimal-residual custom VJP.

Why this exists (round-3 verdict #2 follow-through): the default training
route wraps each GRU layer in ``jax.checkpoint`` (ops/gru.py) — without it
XLA's scan-vjp materializes per-step residual tuples that overflow HBM at
the flagship 4096-row VAE step, but WITH it every backward pass re-runs
the full forward scan (4 sequence passes per train step: fwd, recompute,
bwd through both). This module removes the recompute without the blowup by
storing exactly the residuals the GRU backward needs — the post-activation
gates ``(r, z, n)`` and the candidate recurrent term ``hn`` — 4H per step
instead of XLA's unpruned tuple, and by hand-writing the backward so that:

- the SEQUENTIAL part of the backward carries only ``dh`` and does ONE
  (B, 3H) x (3H, H) matmul per step (the ``dhw @ W_hh^T`` recurrence);
- ALL weight/input gradients become two large batched MXU matmuls over
  the flattened (T*B) axis AFTER the scan (``X^T @ dA``, ``Hprev^T @ dHW``)
  — where XLA's scan-vjp instead accumulates T small per-step outer
  products inside its backward loop.

Gate math matches ops/gru.py exactly (torch ``[r, z, n]`` convention,
``n = tanh(Wx_n + r * (Wh_n h + b_hn))`` — reference encoder.py:28-35 uses
cuDNN; this is the TPU-native training formulation). Selected via
``INPAINTNET_GRU_IMPL=trainfast`` or ``gru_apply(..., impl="trainfast")``;
masked layers fall back to the default scan (validity-mask semantics stay
in one place).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# Trace-time switch set by ``ops.gru.gru_impl_scope("trainfast_pallas")``
# (and restored on scope exit): routes BOTH the forward gate-emitting
# stream and the sequential backward through the Pallas kernels
# (ops/gru_bwd_pallas.py) regardless of the INPAINTNET_TRAINFAST_* env
# knobs. The kernels still self-gate to TPU/interpret backends.
FORCE_KERNELS = False


def _kernels_on(which: str) -> bool:
    import os

    return FORCE_KERNELS or os.environ.get(
        f"INPAINTNET_TRAINFAST_{which}", "scan"
    ) == "pallas"


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gru_layer_core(reverse, w_ih, w_hh, b_ih, b_hh, x, h0):
    """ys (B, T, H) of one GRU direction; h_last is a caller-side slice."""
    ys, _ = _fwd_scan(reverse, w_ih, w_hh, b_ih, b_hh, x, h0)
    return jnp.swapaxes(ys, 0, 1)


def _fwd_scan(reverse, w_ih, w_hh, b_ih, b_hh, x, h0):
    hidden = w_hh.shape[0]
    xw = x @ w_ih + b_ih  # one (B*T, in) x (in, 3H) MXU matmul
    if _kernels_on("FWD"):
        from inpaintnet_tpu.ops.gru_bwd_pallas import gru_fwd_seq_pallas
        from inpaintnet_tpu.ops.pallas_common import interpret_default

        if jax.default_backend() == "tpu" or interpret_default():
            ys, r, z, n, hn = gru_fwd_seq_pallas(
                w_hh, b_hh, xw, h0, reverse=reverse
            )
            return ys, (r, z, n, hn)
    xw_t = jnp.swapaxes(xw, 0, 1)  # (T, B, 3H)

    def step(h, xwt):
        hw = h @ w_hh + b_hh
        r = jax.nn.sigmoid(xwt[:, :hidden] + hw[:, :hidden])
        z = jax.nn.sigmoid(
            xwt[:, hidden: 2 * hidden] + hw[:, hidden: 2 * hidden]
        )
        hn = hw[:, 2 * hidden:]
        n = jnp.tanh(xwt[:, 2 * hidden:] + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, (h_new, r, z, n, hn)

    # same short-recurrence unroll heuristic as ops/gru.py (the 4-step
    # beat GRU): XLA fuses unrolled steps where a loop would serialize.
    # INPAINTNET_TRAINFAST_UNROLL raises the long-scan unroll factor —
    # the train-step decomposition shows the GRU scans are per-step-
    # overhead-bound (encoder bwd ~50 ms against ~3 ms of MXU + ~3 ms of
    # VPU work), which unrolling amortizes.
    unroll = xw_t.shape[0] if xw_t.shape[0] <= 4 else _unroll_env()
    _, (ys, r, z, n, hn) = lax.scan(step, h0, xw_t, reverse=reverse,
                                    unroll=unroll)
    return ys, (r, z, n, hn)


def _unroll_env() -> int:
    import os

    return int(os.environ.get("INPAINTNET_TRAINFAST_UNROLL", "1"))


def _core_fwd(reverse, w_ih, w_hh, b_ih, b_hh, x, h0):
    ys_t, gates = _fwd_scan(reverse, w_ih, w_hh, b_ih, b_hh, x, h0)
    return jnp.swapaxes(ys_t, 0, 1), (w_ih, w_hh, x, h0, ys_t, gates)


def _core_bwd(reverse, res, dys):
    w_ih, w_hh, x, h0, ys_t, (r_t, z_t, n_t, hn_t) = res
    seq_len, batch, hidden = ys_t.shape
    dys_t = jnp.swapaxes(dys, 0, 1)
    # h_{t-1} in PROCESSING order: previous output, h0 at the first
    # processed step (t=0 forward, t=T-1 reverse)
    if reverse:
        hprev_t = jnp.concatenate([ys_t[1:], h0[None]], axis=0)
    else:
        hprev_t = jnp.concatenate([h0[None], ys_t[:-1]], axis=0)

    if _kernels_on("BWD"):
        from inpaintnet_tpu.ops.gru_bwd_pallas import gru_bwd_seq_pallas
        from inpaintnet_tpu.ops.pallas_common import interpret_default

        if jax.default_backend() == "tpu" or interpret_default():
            da_t, dhw_t, dh0 = gru_bwd_seq_pallas(
                w_hh, dys_t, r_t, z_t, n_t, hn_t, hprev_t, reverse=reverse,
            )
            return _batched_grads(
                w_ih, w_hh, x, da_t, dhw_t, dh0, hprev_t, seq_len, batch,
                hidden,
            )

    def bstep(dh, inp):
        dy, r, z, n, hn, hprev = inp
        g = dy + dh
        dn = g * (1.0 - z)
        dz = g * (hprev - n)
        dan = dn * (1.0 - n * n)
        dr = dan * hn
        dar = dr * r * (1.0 - r)
        daz = dz * z * (1.0 - z)
        da = jnp.concatenate([dar, daz, dan], axis=-1)  # cot of x@W_ih+b
        dhw = jnp.concatenate([dar, daz, dan * r], axis=-1)  # cot of h@W_hh+b
        dh_prev = g * z + dhw @ w_hh.T
        return dh_prev, (da, dhw)

    dh0, (da_t, dhw_t) = lax.scan(
        bstep, jnp.zeros_like(h0),
        (dys_t, r_t, z_t, n_t, hn_t, hprev_t),
        reverse=not reverse,
        unroll=seq_len if seq_len <= 4 else _unroll_env(),
    )
    return _batched_grads(
        w_ih, w_hh, x, da_t, dhw_t, dh0, hprev_t, seq_len, batch, hidden
    )


def _batched_grads(w_ih, w_hh, x, da_t, dhw_t, dh0, hprev_t, seq_len,
                   batch, hidden):
    """Batched weight/input grads — large MXU matmuls, outside the scan."""
    da_f = da_t.reshape(seq_len * batch, 3 * hidden)
    dhw_f = dhw_t.reshape(seq_len * batch, 3 * hidden)
    x_f = jnp.swapaxes(x, 0, 1).reshape(seq_len * batch, -1)
    hprev_f = hprev_t.reshape(seq_len * batch, hidden)
    dw_ih = x_f.T @ da_f
    dw_hh = hprev_f.T @ dhw_f
    db_ih = da_f.sum(axis=0)
    db_hh = dhw_f.sum(axis=0)
    dx = jnp.swapaxes(da_t, 0, 1) @ w_ih.T
    return dw_ih, dw_hh, db_ih, db_hh, dx, dh0


_gru_layer_core.defvjp(_core_fwd, _core_bwd)


def gru_layer_trainfast(params, x, h0, *, reverse: bool = False):
    """Single-direction GRU layer with the minimal-residual custom VJP.

    Same contract as ``gru_layer_apply`` for the mask-free case:
    ``(ys (B, T, H), h_last (B, H))`` with outputs in original time order.
    """
    ys = _gru_layer_core(
        bool(reverse), params["w_ih"], params["w_hh"], params["b_ih"],
        params["b_hh"], x, h0,
    )
    h_last = ys[:, 0, :] if reverse else ys[:, -1, :]
    return ys, h_last
