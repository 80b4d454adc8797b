"""Pallas fused GRU sequence kernel.

Fuses the full time recurrence of one GRU layer into a single TPU kernel:
the input projection ``xw = x @ W_ih + b_ih`` is computed outside (one large
MXU matmul over all timesteps — see ``ops.gru``); the kernel then keeps the
hidden state, ``W_hh`` and the gate math resident in VMEM across all T
steps, avoiding the per-iteration HBM refetch of ``W_hh`` (3MB at H=512)
that an XLA ``while``-loop pays.

Layout: TIME-MAJOR inside the kernel — buffers are (T, TILE_B, 3H|H) so the
``fori_loop`` over t indexes the *leading, untiled* axis (Mosaic requires
dynamic indices on tiled dims to be tile-aligned; the leading dim is free).

Grid: one program per batch tile. Each program:
  - holds its ``xw`` tile (T, TILE_B, 3H), ``W_hh`` (H, 3H), ``h`` (TILE_B, H)
    in VMEM,
  - runs ``fori_loop`` over T: ``hw = h @ W_hh`` on the MXU, gate math on the
    VPU, h frozen where the validity mask is 0, h written to the output.

VMEM budget at H=512, T=24, TILE_B=16, fp32 (Pallas double-buffers the
per-program in/out tiles): xw 2.4MBx2 + out 0.8MBx2 + W_hh 3MBx2 + h 32KB
≈ 12.4MB < 16MB.

Numerics match ``ops.gru.gru_layer_apply`` exactly (same gate order/math);
tested in interpreter mode on CPU and selected at runtime via
``ops.gru.set_gru_impl`` / the ``INPAINTNET_GRU_IMPL`` env var.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from inpaintnet_tpu.ops.pallas_common import (
    gru_gates_f32,
    interpret_default,
    round_up,
)


def _gru_stream_kernel(xw_ref, w_hh_ref, b_hh_ref, h0_ref, mask_ref,
                       *refs, seq_len: int, hidden: int, out_dtype,
                       write_ys: bool):
    """Grid-over-time step: one (tile_b, 3H) xw block per program, hidden
    carry in VMEM scratch across the t axis of the grid. Pallas' own block
    pipeline double-buffers the HBM streams — no manual DMA/semaphores
    (the manual-DMA variant below deadlocked at large grids)."""
    if write_ys:
        ys_ref, hn_ref, h_scratch = refs
    else:
        hn_ref, h_scratch = refs
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = h0_ref[:]

    h = h_scratch[:]
    xwt = xw_ref[0].astype(jnp.float32)
    hw = (
        jnp.dot(h, w_hh_ref[:], preferred_element_type=jnp.float32)
        + b_hh_ref[0].astype(jnp.float32)
    )
    h_new = gru_gates_f32(xwt, hw, h.astype(jnp.float32), hidden)
    # minor-dim insertion on sub-32-bit vectors fails to lower (Mosaic
    # "not a no-op only supported for 32-bit types") — broadcast in f32
    m = mask_ref[0, 0].astype(jnp.float32)  # (tile_b,)
    h_new = jnp.where(m[:, None] > 0, h_new.astype(out_dtype), h)
    h_scratch[:] = h_new
    if write_ys:
        ys_ref[0] = h_new

    @pl.when(t == seq_len - 1)
    def _():
        hn_ref[:] = h_new


def gru_layer_pallas_stream(xw, w_hh, b_hh, h0, mask=None, *,
                            reverse: bool = False, tile_b: int = 256,
                            interpret: bool | None = None,
                            want_ys: bool = True):
    """Public entry: resolves the interpret-mode env hook OUTSIDE jit so
    the resolved bool is part of the compilation cache key. Docs below."""
    if interpret is None:
        interpret = interpret_default()
    return _gru_layer_pallas_stream(xw, w_hh, b_hh, h0, mask,
                                    reverse=reverse, tile_b=tile_b,
                                    interpret=interpret, want_ys=want_ys)


@functools.partial(
    jax.jit, static_argnames=("reverse", "tile_b", "interpret", "want_ys")
)
def _gru_layer_pallas_stream(xw, w_hh, b_hh, h0, mask=None, *,
                             reverse: bool = False, tile_b: int = 256,
                             interpret: bool = False,
                             want_ys: bool = True):
    """One GRU direction over a precomputed input projection, streamed.

    grid = (batch_tiles, T) with t fastest; per step the kernel holds one
    (tile_b, 3H) xw block + the VMEM-resident W_hh, so batch tiles fill the
    MXU (256 rows) without the whole-slab variant's VMEM cap or the DMA
    variant's manual semaphores. Semantics identical to
    :func:`gru_layer_pallas`; this is the ``impl="pallas"`` default.

    :param xw: (B, T, 3H) = x @ W_ih + b_ih
    :param w_hh: (H, 3H); b_hh: (3H,); h0: (B, H)
    :param mask: optional (B, T); masked steps freeze h
    :param want_ys: False skips the (B, T, H) output stream entirely
        (final-hidden-only consumers) — ``outputs`` is then None
    :return: (outputs (B, T, H) or None, h_last (B, H))
    """
    batch, seq_len, three_h = xw.shape
    hidden = three_h // 3
    dtype = xw.dtype
    if mask is None:
        mask = jnp.ones((batch, seq_len), dtype)
    else:
        mask = mask.astype(dtype)
    tile_b = min(tile_b, round_up(batch, 8))
    padded_b = round_up(batch, tile_b)
    if padded_b != batch:
        pad = padded_b - batch
        xw = jnp.pad(xw, ((0, pad), (0, 0), (0, 0)))
        h0 = jnp.pad(h0, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)))
    grid = (padded_b // tile_b, seq_len)

    xw_t = jnp.swapaxes(xw, 0, 1)  # (T, B, 3H)
    mask_t = jnp.swapaxes(mask, 0, 1)[:, None, :]  # (T, 1, B)
    b_hh2d = b_hh[None, :]

    def tmap(i, t):
        return ((seq_len - 1 - t) if reverse else t, i, 0)

    def tmap_mask(i, t):
        return ((seq_len - 1 - t) if reverse else t, 0, i)

    hn_spec = pl.BlockSpec((tile_b, hidden), lambda i, t: (i, 0),
                           memory_space=pltpu.VMEM)
    hn_shape = jax.ShapeDtypeStruct((padded_b, hidden), dtype)
    if want_ys:
        out_specs = [
            pl.BlockSpec((1, tile_b, hidden), tmap, memory_space=pltpu.VMEM),
            hn_spec,
        ]
        out_shape = [
            jax.ShapeDtypeStruct((seq_len, padded_b, hidden), dtype),
            hn_shape,
        ]
    else:
        out_specs = [hn_spec]
        out_shape = [hn_shape]

    kernel = functools.partial(
        _gru_stream_kernel, seq_len=seq_len, hidden=hidden, out_dtype=dtype,
        write_ys=want_ys,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_b, three_h), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, three_h), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, three_h), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, hidden), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_b), tmap_mask, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((tile_b, hidden), dtype)],
        interpret=interpret,
    )(xw_t, w_hh, b_hh2d, h0, mask_t)
    if not want_ys:
        return None, outs[0][:batch]
    ys_t, h_n = outs
    return jnp.swapaxes(ys_t, 0, 1)[:batch], h_n[:batch]


# Grids beyond this deadlocked the manual-DMA kernel through the hosted TPU
# runtime (remote-compile tunnel); the single easily-wedged chip makes a
# hang far worse than an error, so refuse loudly above it.
_DMA_MAX_GRID = 8


def _gru_seq_dma_kernel(xw_hbm, w_hh_ref, b_hh_ref, h0_ref, mask_ref,
                        out_hbm, hn_ref,
                        xw_buf, out_buf, in_sems, out_sems,
                        *, seq_len: int, hidden: int, reverse: bool,
                        tile_b: int):
    """Large-tile variant: xw/out live in HBM; per-timestep slices are
    double-buffered through VMEM with async DMA overlapped against the
    recurrent matmul. TILE_B can be 256+ (full MXU rows) because only two
    (TILE_B, 3H) slices are resident at once."""
    i_prog = pl.program_id(0)
    row0 = i_prog * tile_b

    def t_of(i):
        return (seq_len - 1 - i) if reverse else i

    def in_dma(slot, i):
        return pltpu.make_async_copy(
            xw_hbm.at[t_of(i), pl.ds(row0, tile_b), :],
            xw_buf.at[slot],
            in_sems.at[slot],
        )

    def out_dma(slot, i):
        return pltpu.make_async_copy(
            out_buf.at[slot],
            out_hbm.at[t_of(i), pl.ds(row0, tile_b), :],
            out_sems.at[slot],
        )

    w_hh = w_hh_ref[:]
    b_hh = b_hh_ref[0][None, :]
    in_dma(0, 0).start()

    def step(i, h):
        slot = i % 2
        nxt = (i + 1) % 2

        @pl.when(i + 1 < seq_len)
        def _():
            in_dma(nxt, i + 1).start()

        in_dma(slot, i).wait()
        xwt = xw_buf[slot]
        hw = jnp.dot(h, w_hh, preferred_element_type=jnp.float32) + b_hh
        r = jax.nn.sigmoid(xwt[:, :hidden] + hw[:, :hidden])
        z = jax.nn.sigmoid(
            xwt[:, hidden : 2 * hidden] + hw[:, hidden : 2 * hidden]
        )
        n = jnp.tanh(xwt[:, 2 * hidden :] + r * hw[:, 2 * hidden :])
        h_new = (1.0 - z) * n + z * h
        m = mask_ref[t_of(i)]
        h_new = jnp.where(m > 0, h_new, h)

        # drain the out-DMA that used this slot two steps ago, then reuse
        @pl.when(i >= 2)
        def _():
            out_dma(slot, i - 2).wait()

        out_buf[slot] = h_new
        out_dma(slot, i).start()
        return h_new

    h_last = lax.fori_loop(0, seq_len, step, h0_ref[:])
    # drain trailing out-DMAs
    @pl.when(seq_len >= 2)
    def _():
        out_dma((seq_len - 2) % 2, seq_len - 2).wait()

    out_dma((seq_len - 1) % 2, seq_len - 1).wait()
    hn_ref[:] = h_last


def _gru_seq_kernel(xw_ref, w_hh_ref, b_hh_ref, h0_ref, mask_ref, out_ref, hn_ref,
                    *, seq_len: int, hidden: int, reverse: bool):
    w_hh = w_hh_ref[:]
    b_hh = b_hh_ref[:]
    h0 = h0_ref[:]

    def step(i, h):
        t = (seq_len - 1 - i) if reverse else i
        xwt = xw_ref[t]  # (TILE_B, 3H) — dynamic index on the leading axis
        hw = (
            jnp.dot(h, w_hh, preferred_element_type=jnp.float32)
            + b_hh[0][None, :]
        )
        r = jax.nn.sigmoid(xwt[:, :hidden] + hw[:, :hidden])
        z = jax.nn.sigmoid(
            xwt[:, hidden : 2 * hidden] + hw[:, hidden : 2 * hidden]
        )
        n = jnp.tanh(xwt[:, 2 * hidden :] + r * hw[:, 2 * hidden :])
        h_new = (1.0 - z) * n + z * h
        m = mask_ref[t]  # (TILE_B, 1)
        h_new = jnp.where(m > 0, h_new, h)
        out_ref[t] = h_new
        return h_new

    h_last = lax.fori_loop(0, seq_len, step, h0)
    hn_ref[:] = h_last


@functools.partial(
    jax.jit, static_argnames=("reverse", "tile_b", "interpret")
)
def gru_layer_pallas(xw, w_hh, b_hh, h0, mask=None, *, reverse: bool = False,
                     tile_b: int = 16, interpret: bool = False):
    """Run one GRU direction over a precomputed input projection.

    :param xw: (B, T, 3H) = x @ W_ih + b_ih
    :param w_hh: (H, 3H); b_hh: (3H,); h0: (B, H)
    :param mask: optional (B, T); masked steps freeze h
    :return: (outputs (B, T, H), h_last (B, H))
    """
    batch, seq_len, three_h = xw.shape
    hidden = three_h // 3
    if mask is None:
        mask = jnp.ones((batch, seq_len), xw.dtype)
    else:
        mask = mask.astype(xw.dtype)

    tile_b = min(tile_b, batch)
    if batch % tile_b != 0:
        # pad batch to a tile multiple; padded rows are masked out
        pad = tile_b - batch % tile_b
        xw = jnp.pad(xw, ((0, pad), (0, 0), (0, 0)))
        h0 = jnp.pad(h0, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)))
    padded_b = xw.shape[0]
    grid = (padded_b // tile_b,)

    # time-major kernel buffers
    xw_t = jnp.swapaxes(xw, 0, 1)  # (T, B, 3H)
    mask_t = jnp.swapaxes(mask, 0, 1)[:, :, None]  # (T, B, 1)
    b_hh2d = b_hh[None, :]  # (1, 3H)

    kernel = functools.partial(
        _gru_seq_kernel, seq_len=seq_len, hidden=hidden, reverse=reverse
    )
    out_t, h_n = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((seq_len, tile_b, three_h), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, three_h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, three_h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, hidden), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seq_len, tile_b, 1), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((seq_len, tile_b, hidden), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, hidden), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((seq_len, padded_b, hidden), xw.dtype),
            jax.ShapeDtypeStruct((padded_b, hidden), xw.dtype),
        ],
        interpret=interpret,
    )(xw_t, w_hh, b_hh2d, h0, mask_t)
    return jnp.swapaxes(out_t, 0, 1)[:batch], h_n[:batch]


@functools.partial(
    jax.jit, static_argnames=("reverse", "tile_b", "interpret")
)
def gru_layer_pallas_dma(xw, w_hh, b_hh, h0, mask=None, *,
                         reverse: bool = False, tile_b: int = 256,
                         interpret: bool = False):
    """DMA-pipelined variant: xw/outputs stream through HBM so batch tiles
    can fill the MXU (256 rows). Semantics identical to
    :func:`gru_layer_pallas`.

    DEPRECATED in favor of :func:`gru_layer_pallas_stream` (same tile
    sizes, Pallas-managed pipelining): the manual out-DMA semaphores here
    deadlock at large grid counts on the hosted runtime. Kept for kernel
    archaeology; refuses grids > ``_DMA_MAX_GRID`` outside interpret mode
    so it can never wedge the chip."""
    batch, seq_len, three_h = xw.shape
    hidden = three_h // 3
    if mask is None:
        mask = jnp.ones((batch, seq_len), xw.dtype)
    else:
        mask = mask.astype(xw.dtype)
    tile_b = min(tile_b, batch)
    if batch % tile_b != 0:
        pad = tile_b - batch % tile_b
        xw = jnp.pad(xw, ((0, pad), (0, 0), (0, 0)))
        h0 = jnp.pad(h0, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)))
    padded_b = xw.shape[0]
    grid = (padded_b // tile_b,)
    if not interpret and grid[0] > _DMA_MAX_GRID:
        raise ValueError(
            f"gru_layer_pallas_dma: grid {grid[0]} > {_DMA_MAX_GRID} is known "
            "to deadlock on the hosted TPU runtime; use "
            "gru_layer_pallas_stream instead"
        )

    xw_t = jnp.swapaxes(xw, 0, 1)  # (T, B, 3H) in HBM
    mask_t = jnp.swapaxes(mask, 0, 1)[:, :, None]
    b_hh2d = b_hh[None, :]

    kernel = functools.partial(
        _gru_seq_dma_kernel, seq_len=seq_len, hidden=hidden, reverse=reverse,
        tile_b=tile_b,
    )
    out_t, h_n = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # xw stays in HBM
            pl.BlockSpec((hidden, three_h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, three_h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, hidden), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seq_len, tile_b, 1), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # outputs stream to HBM
            pl.BlockSpec((tile_b, hidden), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((seq_len, padded_b, hidden), xw.dtype),
            jax.ShapeDtypeStruct((padded_b, hidden), xw.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, tile_b, three_h), xw.dtype),
            pltpu.VMEM((2, tile_b, hidden), xw.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xw_t, w_hh, b_hh2d, h0, mask_t)
    return jnp.swapaxes(out_t, 0, 1)[:batch], h_n[:batch]
