"""GRU recurrences, TPU-first.

Design (instead of translating torch/cuDNN ``nn.GRU`` — reference
``MeasureVAE/encoder.py:28-35`` uses cuDNN GRU; the decoders drive cuDNN
GRUs one step at a time from Python, ``decoder.py:473-529``):

- The input projection ``x @ W_ih`` for the WHOLE sequence is one large
  (B*T, in) x (in, 3H) matmul — batched onto the MXU up front.
- The time recurrence is a ``lax.scan`` whose body does only the hidden
  matmul + gate math; XLA keeps h and W_hh on-chip across iterations. A
  Pallas fused variant lives in ``ops.gru_pallas`` and is selected by
  ``gru_apply(..., impl=...)`` when profitable.
- Optional per-timestep masks make padded variable-length sequences exact:
  masked steps freeze the carried hidden state, so the final hidden equals
  the hidden after the last *valid* step. This replaces the reference's
  ragged dynamic shapes (latent_rnn_trainer.py:77-132) with static shapes.

Gate order and math follow the torch convention ``[r, z, n]`` with
``n = tanh(Wx_n + r * (Wh_n h + b_hn))`` so that reference checkpoints can
be ported weight-for-weight (see ``models/torch_port.py``).

Parameter pytree for a stack:
    [layer][direction] -> {"w_ih": (in, 3H), "w_hh": (H, 3H),
                           "b_ih": (3H,),    "b_hh": (3H,)}
Hidden-state layout follows torch: ``(num_layers * num_dirs, B, H)`` with
directions varying fastest, so the encoder's concat of final hiddens
(encoder.py:126-127) is order-identical.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

from inpaintnet_tpu.ops.linear import xavier_normal

# Global GRU sequence-recurrence implementation:
#   "xla"       — lax.scan (default; best for tiny batches / CPU)
#   "pallas"    — fused Pallas kernel (ops/gru_pallas.py; weights stay in
#                 VMEM across timesteps; pick on TPU for large-batch layers)
#   "trainfast" — minimal-residual custom-VJP scan (ops/gru_trainfast.py;
#                 pick for large-batch TRAINING: no remat recompute, batched
#                 weight-grad matmuls; masked layers fall back to "xla")
_GRU_IMPL = os.environ.get("INPAINTNET_GRU_IMPL", "xla")


_IMPLS = ("xla", "pallas", "trainfast", "trainfast_pallas")


def set_gru_impl(impl: str):
    global _GRU_IMPL
    assert impl in _IMPLS
    _GRU_IMPL = impl
    from inpaintnet_tpu.ops import gru_trainfast

    gru_trainfast.FORCE_KERNELS = impl == "trainfast_pallas"


def get_gru_impl() -> str:
    return _GRU_IMPL


import contextlib as _contextlib


@_contextlib.contextmanager
def gru_impl_scope(impl: str | None):
    """Scoped recurrence-impl override (trace-time Python state, like
    ``ops.quantize.serving_quant``): trainers wrap their loss AND
    value_and_grad with ``gru_impl_scope("trainfast")`` so the selection
    applies to the training trace only, leaving serving/eval traces
    untouched. ``"trainfast_pallas"`` additionally forces the Pallas
    forward-stream + sequential-backward kernels
    (ops/gru_trainfast.FORCE_KERNELS) — the scope must surround the
    BACKWARD tracing too (``jax.value_and_grad`` call, not just the loss
    body), because custom-VJP bwd rules trace when the cotangent pass is
    built. ``None`` is a no-op scope."""
    global _GRU_IMPL
    if impl is None:
        yield
        return
    assert impl in _IMPLS
    from inpaintnet_tpu.ops import gru_trainfast

    old = _GRU_IMPL
    old_force = gru_trainfast.FORCE_KERNELS
    _GRU_IMPL = impl
    gru_trainfast.FORCE_KERNELS = impl == "trainfast_pallas"
    try:
        yield
    finally:
        _GRU_IMPL = old
        gru_trainfast.FORCE_KERNELS = old_force


def gru_cell_init(key, input_size: int, hidden_size: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "w_ih": xavier_normal(k1, (input_size, 3 * hidden_size), dtype),
        "w_hh": xavier_normal(k2, (hidden_size, 3 * hidden_size), dtype),
        "b_ih": jnp.zeros((3 * hidden_size,), dtype),
        "b_hh": jnp.zeros((3 * hidden_size,), dtype),
    }


def gru_cell_apply(params, h, x):
    """One GRU step. h: (B, H), x: (B, in) -> new h (B, H)."""
    xw = x @ params["w_ih"] + params["b_ih"]
    return _gru_gates(params, h, xw)


def _gru_gates(params, h, xw):
    """Gate math given a precomputed input projection ``xw = xW_ih + b_ih``."""
    hidden = h.shape[-1]
    hw = h @ params["w_hh"] + params["b_hh"]
    r = jax.nn.sigmoid(xw[..., :hidden] + hw[..., :hidden])
    z = jax.nn.sigmoid(xw[..., hidden : 2 * hidden] + hw[..., hidden : 2 * hidden])
    n = jnp.tanh(xw[..., 2 * hidden :] + r * hw[..., 2 * hidden :])
    return (1.0 - z) * n + z * h


def gru_layer_apply(params, x, h0, *, reverse: bool = False, mask=None,
                    impl: str | None = None, want_ys: bool = True,
                    xw_inloop: bool = False):
    """Single-direction GRU over a full sequence.

    Wrapped in ``jax.checkpoint``: under grad, per-step gate activations
    (3H-wide) are recomputed instead of stored — without this, training a
    batch of 4096 measures through 8 GRU layer-directions materializes
    dozens of (B, T, 3H) residual buffers and overflows HBM. Forward-only
    use pays nothing.

    :param x: (B, T, in)
    :param h0: (B, H)
    :param reverse: process t = T-1 .. 0 (outputs stay in original order)
    :param mask: optional (B, T) float/bool; steps with mask==0 freeze h
    :param impl: override the global recurrence implementation
    :param want_ys: False skips accumulating per-step outputs entirely
        (final-hidden-only consumers, e.g. the encoder's last layer) —
        saves the (B, T, H) HBM stream
    :param xw_inloop: compute the input projection per scan step instead of
        as one up-front (B, T, in) x (in, 3H) matmul. The up-front form is
        better under autodiff (one batched backward matmul); the in-loop
        form never materializes the (B, T, 3H) slab to HBM (write + re-read
        ≈ 4.8 GB at 32k rows) and measures ~12% faster for big forward-only
        batches — serving callers pick it
    :return: (outputs (B, T, H) or None, h_last (B, H))
    """
    impl_r = impl or _GRU_IMPL
    if impl_r in ("trainfast", "trainfast_pallas") and mask is None:
        # minimal-residual custom-VJP route (ops/gru_trainfast.py):
        # deliberately NOT checkpoint-wrapped — storing the 4H/step gate
        # residuals instead of recomputing the forward is its whole point.
        # Masked layers fall back to the default scan below.
        from inpaintnet_tpu.ops.gru_trainfast import gru_layer_trainfast

        ys, h_last = gru_layer_trainfast(params, x, h0, reverse=reverse)
        return (ys if want_ys else None, h_last)
    if impl_r in ("trainfast", "trainfast_pallas"):
        impl_r = "xla"
    fn = _gru_layer_fwd if mask is not None else _gru_layer_fwd_nomask
    if mask is not None:
        return fn(params, x, h0, mask, reverse, impl_r, want_ys,
                  xw_inloop)
    return fn(params, x, h0, reverse, impl_r, want_ys, xw_inloop)


import functools as _functools


@_functools.partial(jax.checkpoint, static_argnums=(3, 4, 5, 6))
def _gru_layer_fwd_nomask(params, x, h0, reverse, impl, want_ys, xw_inloop):
    return _gru_layer_impl(params, x, h0, None, reverse, impl, want_ys,
                           xw_inloop)


@_functools.partial(jax.checkpoint, static_argnums=(4, 5, 6, 7))
def _gru_layer_fwd(params, x, h0, mask, reverse, impl, want_ys, xw_inloop):
    return _gru_layer_impl(params, x, h0, mask, reverse, impl, want_ys,
                           xw_inloop)


def _gru_layer_impl(params, x, h0, mask, reverse, impl, want_ys=True,
                    xw_inloop=False):
    if impl == "pallas":
        from inpaintnet_tpu.ops.gru_pallas import gru_layer_pallas_stream

        # xw_inloop has no effect here: the generic stream kernel takes the
        # precomputed projection (the specialized encoder kernel is the
        # slab-free path)
        xw = x @ params["w_ih"] + params["b_ih"]
        return gru_layer_pallas_stream(
            xw, params["w_hh"], params["b_hh"], h0, mask, reverse=reverse,
            want_ys=want_ys,
        )
    if xw_inloop:
        in_t = jnp.swapaxes(x, 0, 1)  # (T, B, in)
    else:
        xw = x @ params["w_ih"] + params["b_ih"]  # one MXU matmul for all T
        in_t = jnp.swapaxes(xw, 0, 1)  # (T, B, 3H) time-major for scan
    mask_t = None if mask is None else jnp.swapaxes(mask.astype(x.dtype), 0, 1)

    def step(h, inp):
        if mask_t is None:
            xwt = inp
        else:
            xwt, m = inp
        if xw_inloop:
            xwt = xwt @ params["w_ih"] + params["b_ih"]
        h_new = _gru_gates(params, h, xwt)
        if mask_t is not None:
            h_new = jnp.where(m[:, None] > 0, h_new, h)
        return h_new, (h_new if want_ys else None)

    xs = in_t if mask_t is None else (in_t, mask_t)
    # fully unroll very short recurrences (the 4-step beat GRU): XLA fuses
    # the unrolled steps where a while-loop would serialize dispatches.
    # INPAINTNET_GRU_UNROLL raises the long-scan factor (see
    # gru_trainfast._unroll_env for the measured rationale)
    unroll = in_t.shape[0] if in_t.shape[0] <= 4 else int(
        os.environ.get("INPAINTNET_GRU_UNROLL", "1")
    )
    h_last, outs = lax.scan(step, h0, xs, reverse=reverse, unroll=unroll)
    if not want_ys:
        return None, h_last
    return jnp.swapaxes(outs, 0, 1), h_last


def gru_layer_bidir_fused(p_fwd, p_bwd, x, h0_pair, *, mask=None):
    """Both directions of a bidirectional GRU layer in ONE scan.

    The forward carry processes t while the backward carry processes
    T-1-t; per step the two hidden matmuls become one batched
    (2, B, H) x (2, H, 3H) contraction — half the scan iterations and
    double the per-matmul work of running two directional scans.

    :param x: (B, T, in); h0_pair: (2, B, H); mask: optional (B, T)
    :return: (outputs (B, T, 2H) [fwd||bwd like torch], h_last (2, B, H))
    """
    w_ih = jnp.stack([p_fwd["w_ih"], p_bwd["w_ih"]])  # (2, in, 3H)
    b_ih = jnp.stack([p_fwd["b_ih"], p_bwd["b_ih"]])
    w_hh = jnp.stack([p_fwd["w_hh"], p_bwd["w_hh"]])
    b_hh = jnp.stack([p_fwd["b_hh"], p_bwd["b_hh"]])
    hidden = w_hh.shape[1]

    xw = jnp.einsum("bti,dik->dbtk", x, w_ih) + b_ih[:, None, None, :]
    xw_f = jnp.swapaxes(xw[0], 0, 1)  # (T, B, 3H)
    xw_b = jnp.swapaxes(xw[1], 0, 1)[::-1]
    xs_x = jnp.stack([xw_f, xw_b], axis=1)  # (T, 2, B, 3H)
    if mask is not None:
        m = jnp.swapaxes(mask.astype(x.dtype), 0, 1)  # (T, B)
        xs_m = jnp.stack([m, m[::-1]], axis=1)  # (T, 2, B)
    else:
        xs_m = None

    def step(h, inp):
        if xs_m is None:
            xwt = inp
        else:
            xwt, mt = inp
        hw = jnp.einsum("dbh,dhk->dbk", h, w_hh) + b_hh[:, None, :]
        r = jax.nn.sigmoid(xwt[..., :hidden] + hw[..., :hidden])
        z = jax.nn.sigmoid(
            xwt[..., hidden : 2 * hidden] + hw[..., hidden : 2 * hidden]
        )
        n = jnp.tanh(xwt[..., 2 * hidden :] + r * hw[..., 2 * hidden :])
        h_new = (1.0 - z) * n + z * h
        if xs_m is not None:
            h_new = jnp.where(mt[..., None] > 0, h_new, h)
        return h_new, h_new

    xs = xs_x if xs_m is None else (xs_x, xs_m)
    h_last, ys = lax.scan(step, h0_pair, xs)  # ys: (T, 2, B, H)
    out_f = jnp.swapaxes(ys[:, 0], 0, 1)
    out_b = jnp.swapaxes(ys[:, 1][::-1], 0, 1)
    return jnp.concatenate([out_f, out_b], axis=-1), h_last


@jax.checkpoint
def _gru_layer_bidir_ckpt(p_fwd, p_bwd, x, h0_pair, mask):
    return gru_layer_bidir_fused(p_fwd, p_bwd, x, h0_pair, mask=mask)


def gru_stack_cell_apply(params, h, x, *, dropout=0.0, rng=None, train=False):
    """One step through a stack of unidirectional GRU layers.

    Used by the sequential sampling decoders where the next input depends on
    the sampled token. ``params`` is a ``gru_init(..., bidirectional=False)``
    pytree; h: (num_layers, B, H); x: (B, in). Inter-layer dropout matches
    torch semantics (fresh mask per step, as torch draws per forward call).

    :return: (new h (num_layers, B, H), top-layer output (B, H))
    """
    num_layers = len(params)
    new_h = []
    inp = x
    for layer in range(num_layers):
        p = params[layer][0]
        xw = inp @ p["w_ih"] + p["b_ih"]
        h_l = _gru_gates(p, h[layer], xw)
        new_h.append(h_l)
        inp = h_l
        if train and dropout > 0.0 and layer < num_layers - 1:
            if rng is None:
                raise ValueError("dropout requires an rng key in train mode")
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, inp.shape)
            inp = jnp.where(keep, inp / (1.0 - dropout), 0.0)
    return jnp.stack(new_h), inp


def gru_init(
    key,
    input_size: int,
    hidden_size: int,
    num_layers: int,
    bidirectional: bool = False,
    dtype=jnp.float32,
):
    """Init a (possibly bidirectional) multi-layer GRU stack."""
    num_dirs = 2 if bidirectional else 1
    layers = []
    keys = jax.random.split(key, num_layers * num_dirs)
    ki = 0
    for layer in range(num_layers):
        in_dim = input_size if layer == 0 else hidden_size * num_dirs
        dirs = []
        for _ in range(num_dirs):
            dirs.append(gru_cell_init(keys[ki], in_dim, hidden_size, dtype))
            ki += 1
        layers.append(dirs)
    return layers


def gru_apply(
    params,
    x,
    h0=None,
    *,
    mask=None,
    dropout: float = 0.0,
    rng=None,
    train: bool = False,
    last_outputs: bool = True,
    xw_inloop: bool = False,
    dropout_masks=None,
    impl: str | None = None,
):
    """Multi-layer (bi)GRU over a sequence.

    :param params: pytree from ``gru_init``
    :param x: (B, T, in)
    :param h0: (num_layers * num_dirs, B, H) or None for zeros
    :param mask: optional (B, T) validity mask
    :param dropout: inter-layer dropout prob (torch ``nn.GRU(dropout=...)``
        semantics: applied to each layer's output except the last, train only)
    :param dropout_masks: optional sequence of PRECOMPUTED keep masks
        (bool, (B, T, H * num_dirs)), one per non-last layer, used instead
        of drawing from ``rng``. Lets a caller share the exact same masks
        between this scan and a fused Pallas forward (kernel_with_xla_grad
        routes the backward through here, so the two must drop identically)
    :param last_outputs: False skips accumulating the LAST layer's per-step
        outputs (callers that only consume ``h_n``, like the encoder and
        the context RNNs, save the whole (B, T, H*dirs) HBM stream);
        ``outputs`` is then None
    :return: (outputs (B, T, H * num_dirs) or None,
              h_n (num_layers * num_dirs, B, H) — torch layout)
    """
    num_layers = len(params)
    num_dirs = len(params[0])
    batch = x.shape[0]
    hidden = params[0][0]["w_hh"].shape[0]
    if h0 is None:
        h0 = jnp.zeros((num_layers * num_dirs, batch, hidden), x.dtype)

    # Fused bidirectional scan is available but measured SLOWER on TPU at
    # the flagship shapes (batched (2,B,H)x(2,H,3H) matmuls tile worse than
    # two full-width directional matmuls: 180ms vs 88ms per bench step) —
    # opt-in only.
    fuse_bidir = num_dirs == 2 and _GRU_IMPL != "pallas" and os.environ.get(
        "INPAINTNET_BIDIR_FUSED", "0"
    ) == "1"
    out = x
    h_n = []
    for layer in range(num_layers):
        want_ys = last_outputs or layer < num_layers - 1
        if fuse_bidir:
            h0_pair = jnp.stack(
                [h0[layer * 2], h0[layer * 2 + 1]]
            )
            out, h_last_pair = _gru_layer_bidir_ckpt(
                params[layer][0], params[layer][1], out, h0_pair, mask
            )
            h_n.extend([h_last_pair[0], h_last_pair[1]])
        else:
            outs_dir = []
            for d in range(num_dirs):
                h0_ld = h0[layer * num_dirs + d]
                o, h_last = gru_layer_apply(
                    params[layer][d], out, h0_ld, reverse=(d == 1), mask=mask,
                    want_ys=want_ys, xw_inloop=xw_inloop, impl=impl,
                )
                outs_dir.append(o)
                h_n.append(h_last)
            if not want_ys:
                out = None
            else:
                out = outs_dir[0] if num_dirs == 1 else jnp.concatenate(outs_dir, axis=-1)
        if train and dropout > 0.0 and layer < num_layers - 1:
            if dropout_masks is not None:
                keep = dropout_masks[layer]
            else:
                if rng is None:
                    raise ValueError(
                        "dropout requires an rng key in train mode"
                    )
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 1.0 - dropout, out.shape)
            out = jnp.where(keep, out / (1.0 - dropout), 0.0)
    return out, jnp.stack(h_n, axis=0)
