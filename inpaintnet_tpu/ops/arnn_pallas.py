"""Fused Pallas kernel for the AnticipationRNN autoregressive decode.

The ARNN's inpainting decode (reference
``anticipation_rnn_gauss_reg_model.py:261-346``: per tick embed-prev ->
2-layer LSTM step -> Linear/ReLU/Linear -> argmax, with context ticks
forced to ground truth) follows the same structure as the measure decoder,
so the same grid-over-time design applies:

- grid = (batch_tiles, T), t fastest; (h, c) of both LSTM layers and the
  previous token's input-projection row live in VMEM scratch across ticks;
- all generation-side weights VMEM-resident: the constraint-context part
  of layer-0's input projection (W_ctx), both layers' W_hh, layer-1 W_ih,
  the two head linears, and the fused ``embedding @ W_ih0[:E]`` token
  table — autoregressive feedback is a one-hot matmul against it;
- the force-mask (ground-truth inputs at context ticks) is a per-tick
  ``where`` on streamed (token, mask) blocks;
- the head here is Linear -> ReLU -> Linear with UNBOUNDED logits
  (unlike the measure decoder's ReLU-on-logits quirk), so vocab padding
  columns get a large negative additive mask before the in-kernel argmax.

The constraint LSTM (one batched full-sequence pass) stays in XLA — it is
already a single dense recurrence with no autoregressive feedback.

Semantics match ``ConstraintModelGaussianReg.forward_sampled`` with
``temperature=None, train=False`` exactly (interpret-mode parity tests);
the model routes here only for that case on TPU, with autodiff falling
back to the XLA scan via ``kernel_with_xla_grad``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from inpaintnet_tpu.ops.pallas_common import (
    interpret_default,
    lstm_gates_f32,
    round_up,
)


def _arnn_kernel(ctx_ref, gt_ref, fm_ref, tok_tab_ref, start_xw_ref,
                 wctx_ref, whh0_ref, wih1_ref, whh1_ref, bias_ref,
                 w_l1_ref, b_l1_ref, w_out_ref, b_out_ref,
                 logits_ref, tokens_ref,
                 h0_s, c0_s, h1_s, c1_s, prev_xw_s,
                 *, hidden: int, vocab: int, vocab_pad: int,
                 tok_pad: int, out_dtype):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        prev_xw_s[:] = jnp.broadcast_to(
            start_xw_ref[0], prev_xw_s.shape
        ).astype(prev_xw_s.dtype)
        h0_s[:] = jnp.zeros_like(h0_s)
        c0_s[:] = jnp.zeros_like(c0_s)
        h1_s[:] = jnp.zeros_like(h1_s)
        c1_s[:] = jnp.zeros_like(c1_s)

    # layer 0: input = [prev-token emb, constraint ctx] -> split projection
    ctx = ctx_ref[0]  # (tile_b, C)
    xw0 = (
        prev_xw_s[:].astype(jnp.float32)
        + jnp.dot(ctx, wctx_ref[:], preferred_element_type=jnp.float32)
        + bias_ref[0].astype(jnp.float32)
    )
    hw0 = (
        jnp.dot(h0_s[:], whh0_ref[:], preferred_element_type=jnp.float32)
        + bias_ref[1].astype(jnp.float32)
    )
    h0_new, c0_new = lstm_gates_f32(
        xw0, hw0, h0_s[:].astype(jnp.float32), c0_s[:].astype(jnp.float32),
        hidden,
    )
    h0_store = h0_new.astype(out_dtype)

    # layer 1
    xw1 = (
        jnp.dot(h0_store, wih1_ref[:], preferred_element_type=jnp.float32)
        + bias_ref[2].astype(jnp.float32)
    )
    hw1 = (
        jnp.dot(h1_s[:], whh1_ref[:], preferred_element_type=jnp.float32)
        + bias_ref[3].astype(jnp.float32)
    )
    h1_new, c1_new = lstm_gates_f32(
        xw1, hw1, h1_s[:].astype(jnp.float32), c1_s[:].astype(jnp.float32),
        hidden,
    )
    h1_store = h1_new.astype(out_dtype)

    # head: Linear -> ReLU -> Linear (logits NOT relu'd, reference :334-337)
    hid = jax.nn.relu(
        jnp.dot(h1_store, w_l1_ref[:], preferred_element_type=jnp.float32)
        + b_l1_ref[0].astype(jnp.float32)
    )
    logits = (
        jnp.dot(hid.astype(out_dtype), w_out_ref[:],
                preferred_element_type=jnp.float32)
        + b_out_ref[0].astype(jnp.float32)
    )
    col = lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < vocab, logits, -1e30)  # padding never wins
    row_max = jnp.max(logits, axis=-1, keepdims=True)
    sampled = jnp.min(
        jnp.where(logits == row_max, col, vocab_pad), axis=-1
    ).astype(jnp.int32)

    # force-mask: context ticks feed ground truth forward
    token = jnp.where(fm_ref[0, 0] > 0, gt_ref[0, 0], sampled)
    onehot = (
        token[:, None]
        == lax.broadcasted_iota(jnp.int32, (token.shape[0], tok_pad), 1)
    ).astype(tok_tab_ref.dtype)
    prev_xw_s[:] = jnp.dot(
        onehot, tok_tab_ref[:], preferred_element_type=jnp.float32
    ).astype(prev_xw_s.dtype)

    h0_s[:] = h0_store
    c0_s[:] = c0_new.astype(out_dtype)
    h1_s[:] = h1_store
    c1_s[:] = c1_new.astype(out_dtype)
    logits_ref[0] = logits.astype(out_dtype)
    tokens_ref[0, 0] = token


def arnn_sampled_decode_pallas(params, constraint_out, score, force_mask,
                               start_emb, *, tile_b: int = 256,
                               interpret: bool | None = None):
    """Public entry: resolves the interpret-mode env hook OUTSIDE jit so
    the resolved bool is part of the compilation cache key."""
    if interpret is None:
        interpret = interpret_default()
    return _arnn_sampled_decode_pallas(params, constraint_out, score,
                                       force_mask, start_emb,
                                       tile_b=tile_b, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def _arnn_sampled_decode_pallas(params, constraint_out, score, force_mask,
                                start_emb, *, tile_b: int,
                                interpret: bool):
    """Fused argmax force-mask decode over the full sequence.

    :param params: ConstraintModelGaussianReg params (2 generation layers)
    :param constraint_out: (B, T, C) reversed-constraint-LSTM outputs
    :param score: (B, T) int ground-truth tokens
    :param force_mask: (B, T) 1 where the INPUT at that position is forced
    :param start_emb: (1, E) tick--1 input embedding
    :return: (logits (B, T, V), tokens (B, T))
    """
    p0, p1 = params["lstm_generation"][0], params["lstm_generation"][1]
    batch, seq_len, C = constraint_out.shape
    hidden = p0["w_hh"].shape[0]
    four_h = 4 * hidden
    dtype = p0["w_hh"].dtype
    emb_table = params["note_embedding"]["table"]
    n_tok, E = emb_table.shape
    tok_pad = round_up(n_tok, 8)
    vocab = params["linear_output_notes"]["w"].shape[1]
    vocab_pad = round_up(vocab, 128)
    lin_hid = params["linear_1"]["w"].shape[1]
    lin_pad = round_up(lin_hid, 128)

    tok_tab = jnp.pad(
        emb_table @ p0["w_ih"][:E], ((0, tok_pad - n_tok), (0, 0))
    )
    start_xw = start_emb @ p0["w_ih"][:E]  # (1, 4H)
    w_ctx = p0["w_ih"][E:]  # (C, 4H)
    bias = jnp.stack(
        [p0["b_ih"], p0["b_hh"], p1["b_ih"], p1["b_hh"]]
    )  # (4, 4H)
    w_l1 = jnp.pad(params["linear_1"]["w"], ((0, 0), (0, lin_pad - lin_hid)))
    b_l1 = jnp.pad(params["linear_1"]["b"], (0, lin_pad - lin_hid))[None, :]
    w_out = jnp.pad(
        params["linear_output_notes"]["w"],
        ((0, lin_pad - lin_hid), (0, vocab_pad - vocab)),
    )
    b_out = jnp.pad(
        params["linear_output_notes"]["b"], (0, vocab_pad - vocab)
    )[None, :]

    tile_b = min(tile_b, round_up(batch, 8))
    padded_b = round_up(batch, tile_b)
    if padded_b != batch:
        pad = padded_b - batch
        constraint_out = jnp.pad(constraint_out, ((0, pad), (0, 0), (0, 0)))
        score = jnp.pad(score, ((0, pad), (0, 0)))
        force_mask = jnp.pad(force_mask, ((0, pad), (0, 0)))
    grid = (padded_b // tile_b, seq_len)

    ctx_t = jnp.swapaxes(constraint_out, 0, 1)  # (T, B, C)
    gt_t = jnp.swapaxes(score, 0, 1).astype(jnp.int32)[:, None, :]  # (T,1,B)
    fm_t = jnp.swapaxes(force_mask, 0, 1).astype(jnp.int32)[:, None, :]

    def const(i, t):
        return (0, 0)

    def tmap3(i, t):
        return (t, i, 0)

    def tmap_vec(i, t):
        return (t, 0, i)

    kernel = functools.partial(
        _arnn_kernel, hidden=hidden, vocab=vocab, vocab_pad=vocab_pad,
        tok_pad=tok_pad, out_dtype=dtype,
    )
    logits_t, tokens_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_b, C), tmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_b), tmap_vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_b), tmap_vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((tok_pad, four_h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, four_h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, four_h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, four_h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, four_h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, four_h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, four_h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, lin_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lin_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((lin_pad, vocab_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vocab_pad), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_b, vocab_pad), tmap3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_b), tmap_vec, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((seq_len, padded_b, vocab_pad), dtype),
            jax.ShapeDtypeStruct((seq_len, 1, padded_b), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_b, hidden), dtype),
            pltpu.VMEM((tile_b, hidden), dtype),
            pltpu.VMEM((tile_b, hidden), dtype),
            pltpu.VMEM((tile_b, hidden), dtype),
            pltpu.VMEM((tile_b, four_h), dtype),
        ],
        interpret=interpret,
    )(ctx_t, gt_t, fm_t, tok_tab, start_xw, w_ctx, p0["w_hh"], p1["w_ih"],
      p1["w_hh"], bias, w_l1, b_l1, w_out, b_out)

    logits = jnp.swapaxes(logits_t, 0, 1)[:batch, :, :vocab]
    tokens = jnp.swapaxes(tokens_t[:, 0, :], 0, 1)[:batch]
    return logits, tokens
