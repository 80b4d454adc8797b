"""Pallas kernel for the GRU backward's SEQUENTIAL part.

The round-4 train-step decomposition (docs/PERFORMANCE.md) measured the
flagship VAE step as structure-bound in the GRU backward: ~50 ms for the
encoder's backward against ~3 ms of MXU and ~3 ms of VPU work — the cost
is 96 sequential XLA loop iterations, not arithmetic. This kernel runs
that sequential part (the ``dh`` recurrence of ``ops/gru_trainfast.py``'s
hand-written VJP) as a single fused TPU kernel, same grid-over-time
streaming layout as ``ops/gru_pallas.py``:

- grid = (batch_tiles, T) with the PROCESSING step fastest; a forward-
  direction layer's backward processes t = T-1..0, a reverse-direction
  layer's t = 0..T-1 — handled by the index maps, so buffers stay in
  original time order;
- per step: the stored gates ``(r, z, n, hn)`` and ``h_{t-1}`` stream in,
  the gate-derivative chain runs on the VPU in f32, ONE
  (tile_b, 3H) x (3H, H) MXU matmul (``dhw @ W_hh^T``, weight resident in
  VMEM) advances the carried ``dh``, and the ``(da, dhw)`` cotangents
  stream out;
- everything batched (``dW = X^T dA`` etc.) stays OUTSIDE in XLA — those
  are already MXU-shaped.

Selected by ``INPAINTNET_TRAINFAST_BWD=pallas`` (TPU or interpret mode)
on top of ``INPAINTNET_TRAIN_GRU_IMPL=trainfast``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from inpaintnet_tpu.ops.pallas_common import interpret_default, round_up


def _bwd_seq_kernel(dy_ref, r_ref, z_ref, n_ref, hn_ref, hprev_ref,
                    w_hh_t_ref, da_ref, dhw_ref, dh0_ref, dh_scratch,
                    *, num_steps: int, hidden: int, out_dtype):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        dh_scratch[:] = jnp.zeros_like(dh_scratch)

    g = dy_ref[0].astype(jnp.float32) + dh_scratch[:]
    r = r_ref[0].astype(jnp.float32)
    z = z_ref[0].astype(jnp.float32)
    n = n_ref[0].astype(jnp.float32)
    hn = hn_ref[0].astype(jnp.float32)
    hprev = hprev_ref[0].astype(jnp.float32)
    dn = g * (1.0 - z)
    dz = g * (hprev - n)
    dan = dn * (1.0 - n * n)
    dr = dan * hn
    dar = dr * r * (1.0 - r)
    daz = dz * z * (1.0 - z)
    da = jnp.concatenate([dar, daz, dan], axis=-1)
    dhw = jnp.concatenate([dar, daz, dan * r], axis=-1)
    dh_new = g * z + jnp.dot(
        dhw, w_hh_t_ref[:].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    da_ref[0] = da.astype(out_dtype)
    dhw_ref[0] = dhw.astype(out_dtype)
    dh_scratch[:] = dh_new

    @pl.when(s == num_steps - 1)
    def _():
        dh0_ref[:] = dh_new.astype(out_dtype)


def _fwd_seq_kernel(xw_ref, w_hh_ref, b_hh_ref, h0_ref, ys_ref, r_ref,
                    z_ref, n_ref, hn_ref, h_scratch, *, num_steps: int,
                    hidden: int, out_dtype):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = h0_ref[:].astype(jnp.float32)

    h = h_scratch[:]
    xwt = xw_ref[0].astype(jnp.float32)
    hw = jnp.dot(
        h.astype(out_dtype), w_hh_ref[:],
        preferred_element_type=jnp.float32,
    ) + b_hh_ref[0].astype(jnp.float32)
    r = jax.nn.sigmoid(xwt[:, :hidden] + hw[:, :hidden])
    z = jax.nn.sigmoid(
        xwt[:, hidden: 2 * hidden] + hw[:, hidden: 2 * hidden]
    )
    hn = hw[:, 2 * hidden:]
    n = jnp.tanh(xwt[:, 2 * hidden:] + r * hn)
    h_new = (1.0 - z) * n + z * h
    ys_ref[0] = h_new.astype(out_dtype)
    r_ref[0] = r.astype(out_dtype)
    z_ref[0] = z.astype(out_dtype)
    n_ref[0] = n.astype(out_dtype)
    hn_ref[0] = hn.astype(out_dtype)
    h_scratch[:] = h_new


def gru_fwd_seq_pallas(w_hh, b_hh, xw, h0, *, reverse: bool = False,
                       tile_b: int = 256, interpret: bool | None = None):
    """Forward stream kernel that ALSO emits the gates the trainfast
    backward consumes: ``(ys_t, r_t, z_t, n_t, hn_t)``, all (T, B, H) in
    original time order. ``xw = x @ W_ih + b_ih`` stays an XLA matmul.
    Gate math in f32 with an f32 hidden carry (same as the serving
    kernels, pallas_common.gru_gates_f32)."""
    if interpret is None:
        interpret = interpret_default()
    return _gru_fwd_seq_pallas(w_hh, b_hh, xw, h0, reverse=bool(reverse),
                               tile_b=tile_b, interpret=interpret)


@functools.partial(
    jax.jit, static_argnames=("reverse", "tile_b", "interpret")
)
def _gru_fwd_seq_pallas(w_hh, b_hh, xw, h0, *, reverse: bool, tile_b: int,
                        interpret: bool):
    batch, seq_len, three_h = xw.shape
    hidden = three_h // 3
    dtype = xw.dtype
    tile_b = min(tile_b, round_up(batch, 8))
    padded_b = round_up(batch, tile_b)
    if padded_b != batch:
        xw = jnp.pad(xw, ((0, padded_b - batch), (0, 0), (0, 0)))
        h0 = jnp.pad(h0, ((0, padded_b - batch), (0, 0)))
    grid = (padded_b // tile_b, seq_len)
    xw_t = jnp.swapaxes(xw, 0, 1)

    def tmap(i, t):
        return (seq_len - 1 - t if reverse else t, i, 0)

    const = lambda i, t: (0, 0)  # noqa: E731
    hblk = pl.BlockSpec((1, tile_b, hidden), tmap, memory_space=pltpu.VMEM)
    hshape = jax.ShapeDtypeStruct((seq_len, padded_b, hidden), dtype)
    kernel = functools.partial(
        _fwd_seq_kernel, num_steps=seq_len, hidden=hidden, out_dtype=dtype,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_b, three_h), tmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, three_h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, three_h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, hidden), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[hblk] * 5,
        out_shape=[hshape] * 5,
        scratch_shapes=[pltpu.VMEM((tile_b, hidden), jnp.float32)],
        interpret=interpret,
    )(xw_t, w_hh, b_hh[None, :], h0)
    return tuple(o[:, :batch] for o in outs)


def gru_bwd_seq_pallas(w_hh, dys_t, r_t, z_t, n_t, hn_t, hprev_t, *,
                       reverse: bool = False, tile_b: int = 256,
                       interpret: bool | None = None):
    """Sequential GRU-backward: ``(da_t, dhw_t, dh0)`` from stored gates.

    :param w_hh: (H, 3H) recurrent weight of the layer direction
    :param dys_t: (T, B, H) output cotangents, original time order
    :param r_t, z_t, n_t, hn_t: (T, B, H) stored forward gates
    :param hprev_t: (T, B, H) ``h_{t-1}`` per step (h0 at the first
        processed step), original time order
    :param reverse: the layer's DIRECTION (backward direction processes
        its backward pass in ascending time)
    :return: (da_t (T, B, 3H), dhw_t (T, B, 3H), dh0 (B, H))
    """
    if interpret is None:
        interpret = interpret_default()
    return _gru_bwd_seq_pallas(
        w_hh, dys_t, r_t, z_t, n_t, hn_t, hprev_t,
        reverse=bool(reverse), tile_b=tile_b, interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("reverse", "tile_b", "interpret")
)
def _gru_bwd_seq_pallas(w_hh, dys_t, r_t, z_t, n_t, hn_t, hprev_t, *,
                        reverse: bool, tile_b: int, interpret: bool):
    seq_len, batch, hidden = dys_t.shape
    dtype = dys_t.dtype
    tile_b = min(tile_b, round_up(batch, 8))
    padded_b = round_up(batch, tile_b)
    bufs = [dys_t, r_t, z_t, n_t, hn_t, hprev_t]
    if padded_b != batch:
        pad = ((0, 0), (0, padded_b - batch), (0, 0))
        bufs = [jnp.pad(b, pad) for b in bufs]
    grid = (padded_b // tile_b, seq_len)

    def tmap(i, s):
        # processing step s -> time index (fwd dir processes T-1..0)
        return (s if reverse else seq_len - 1 - s, i, 0)

    const = lambda i, s: (0, 0)  # noqa: E731
    blk = pl.BlockSpec((1, tile_b, hidden), tmap, memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _bwd_seq_kernel, num_steps=seq_len, hidden=hidden, out_dtype=dtype,
    )
    da_t, dhw_t, dh0 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk] * 6 + [
            pl.BlockSpec((3 * hidden, hidden), const,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_b, 3 * hidden), tmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, 3 * hidden), tmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, hidden), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((seq_len, padded_b, 3 * hidden), dtype),
            jax.ShapeDtypeStruct((seq_len, padded_b, 3 * hidden), dtype),
            jax.ShapeDtypeStruct((padded_b, hidden), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((tile_b, hidden), jnp.float32)],
        interpret=interpret,
    )(*bufs, jnp.swapaxes(w_hh, 0, 1))
    return da_t[:, :batch], dhw_t[:, :batch], dh0[:batch]
