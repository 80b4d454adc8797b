"""Fused Pallas kernel for the hierarchical decoder's 24-tick sampling loop.

The autoregressive measure decode (reference ``MeasureVAE/decoder.py:
473-529``: per tick embed-prev -> 2-layer GRU step -> Linear+ReLU ->
argmax) is the #2 serving cost. As an XLA ``lax.scan`` each tick re-streams
every weight matrix and round-trips the hidden state through HBM; here the
whole loop is ONE kernel:

- grid = (batch_tiles, 24), t fastest; hidden states and the previous
  token's input-projection row live in VMEM scratch across ticks.
- all weights stay VMEM-resident (constant index maps): W_hh of both
  layers, layer-1 W_ih, the ReLU head, and the fused embedding@W_ih0
  token table (V, 3H) — the autoregressive feedback is a one-hot matmul
  against that table, so no per-tick gather/HBM touch at all.
- the per-beat context and tick-GRU init hiddens (4 distinct values per
  measure) are read via ``t // 6`` index maps — (B, 24, .) slabs never
  materialize.
- the beat-hidden reset at tick boundaries (decoder.py:494) is a
  ``jnp.where`` on ``t % 6 == 0``.
- argmax over the (ReLU'd) logits happens in-kernel; vocab is padded to
  the lane width with a -1 additive mask so padding can never win
  (real logits are >= 0 after the reference's ReLU quirk).

Semantics match ``HierarchicalDecoder.decode_sampling`` with
``train=False`` (argmax sampling, no dropout) exactly; parity is tested in
interpret mode (tests/test_decode_pallas.py) and the model routes here
only on TPU for that case.
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

TICKS_PER_BEAT = 6
NUM_TICKS = 24


def _decode_kernel(ctx_xw_ref, hi0_ref, hi1_ref, tok_tab_ref, x0_xw_ref,
                   whh0_ref, wih1_ref, whh1_ref, bias_ref, head_w_ref,
                   head_b_ref,
                   logits_ref, samples_ref,
                   h0_s, h1_s, prev_xw_s,
                   *, hidden: int, vocab: int, vocab_pad: int, out_dtype,
                   halves: int = 1):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        prev_xw_s[:] = jnp.broadcast_to(x0_xw_ref[0], prev_xw_s.shape).astype(
            prev_xw_s.dtype
        )
        # h carries are dead at t==0 (reset selects h_init) but must be
        # initialized for the where()
        h0_s[:] = jnp.zeros_like(h0_s)
        h1_s[:] = jnp.zeros_like(h1_s)

    reset = (t % TICKS_PER_BEAT) == 0
    rows = h0_s.shape[0]
    hb = rows // halves

    # ``halves`` > 1 carves the block into independent row chains whose
    # per-tick serial dependency chains (hw0 -> gates -> xw1 -> gates ->
    # head -> argmax -> feedback) the scheduler can interleave — one
    # half's MXU matmuls overlap the other's VPU gate math, filling the
    # pipeline bubble the single serial chain leaves at each grid step.
    for k in range(halves):
        sl = slice(k * hb, (k + 1) * hb)
        h0 = jnp.where(reset, hi0_ref[0, sl], h0_s[sl])
        h1 = jnp.where(reset, hi1_ref[0, sl], h1_s[sl])

        # layer 0: input projection = prev-token row + beat-context part
        xw0 = prev_xw_s[sl].astype(jnp.float32) + ctx_xw_ref[0, sl].astype(
            jnp.float32
        )
        hw0 = jnp.dot(h0, whh0_ref[:], preferred_element_type=jnp.float32)
        hw0 = hw0 + bias_ref[0].astype(jnp.float32)
        h0_new = gru_gates_f32(xw0, hw0, h0.astype(jnp.float32), hidden)

        # layer 1
        h0_store = h0_new.astype(out_dtype)
        xw1 = jnp.dot(h0_store, wih1_ref[:], preferred_element_type=jnp.float32)
        xw1 = xw1 + bias_ref[1].astype(jnp.float32)
        hw1 = jnp.dot(h1, whh1_ref[:], preferred_element_type=jnp.float32)
        hw1 = hw1 + bias_ref[2].astype(jnp.float32)
        h1_new = gru_gates_f32(xw1, hw1, h1.astype(jnp.float32), hidden)
        h1_store = h1_new.astype(out_dtype)

        # ReLU head (reference quirk: non-negative logits, decoder.py:369-372)
        logits = jnp.dot(
            h1_store, head_w_ref[:], preferred_element_type=jnp.float32
        )
        logits = jax.nn.relu(logits + head_b_ref[0].astype(jnp.float32))
        # padding columns must lose every argmax tie: real logits are >= 0
        col = lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < vocab, logits, -1.0)
        # argmax with first-index tie-break, spelled as max + min-index
        # (Mosaic cannot lower f32 argmax directly)
        row_max = jnp.max(logits, axis=-1, keepdims=True)
        sampled = jnp.min(
            jnp.where(logits == row_max, col, vocab_pad), axis=-1
        ).astype(jnp.int32)

        # autoregressive feedback: one-hot matmul against the token table
        onehot = (
            sampled[:, None]
            == lax.broadcasted_iota(jnp.int32, (sampled.shape[0], vocab_pad), 1)
        ).astype(tok_tab_ref.dtype)
        prev_xw_s[sl] = jnp.dot(
            onehot, tok_tab_ref[:], preferred_element_type=jnp.float32
        ).astype(prev_xw_s.dtype)

        h0_s[sl] = h0_store
        h1_s[sl] = h1_store
        logits_ref[0, sl] = logits.astype(out_dtype)
        samples_ref[0, 0, sl] = sampled


def decode_sampling_pallas(params, tick_ctx, h_inits, *, tile_b: int = 256,
                           halves: int = 1, interpret: bool | None = None):
    """Public entry: resolves the interpret-mode env hook OUTSIDE jit so
    the resolved bool is part of the compilation cache key."""
    if interpret is None:
        interpret = interpret_default()
    return _decode_sampling_pallas(params, tick_ctx, h_inits,
                                   tile_b=tile_b, halves=halves,
                                   interpret=interpret)


@functools.partial(jax.jit, static_argnames=("tile_b", "halves", "interpret"))
def _decode_sampling_pallas(params, tick_ctx, h_inits, *, tile_b: int,
                            halves: int, interpret: bool):
    """Fused argmax sampling decode of one measure per row.

    :param params: HierarchicalDecoder params (2 tick-GRU layers)
    :param tick_ctx: (B, 4, H) per-beat context (selu'd beat_to_tick_input)
    :param h_inits: (2, B, 4, H) per-beat tick-GRU init hiddens
    :return: (logits (B, 24, V) — ReLU'd like the reference, samples (B, 24))
    """
    p0, p1 = params["tick_gru"][0][0], params["tick_gru"][1][0]
    batch, num_beats, hidden = tick_ctx.shape
    three_h = 3 * hidden
    dtype = p0["w_hh"].dtype
    emb_table = params["embedding"]["table"]
    vocab, E = emb_table.shape
    vocab_pad = round_up(vocab, 128)
    head_w = jnp.pad(params["head"]["w"], ((0, 0), (0, vocab_pad - vocab)))
    head_b = jnp.pad(params["head"]["b"], (0, vocab_pad - vocab))[None, :]

    tok_tab = jnp.pad(emb_table @ p0["w_ih"][:E], ((0, vocab_pad - vocab), (0, 0)))
    x0_xw = (params["x_0"] @ p0["w_ih"][:E])[None, :]  # (1, 3H)
    # beat-context part of the layer-0 input projection, b_ih0 folded in;
    # beat-major layout so blocks index (t // 6)
    ctx_xw = jnp.swapaxes(tick_ctx @ p0["w_ih"][E:] + p0["b_ih"], 0, 1)  # (4,B,3H)
    hi0 = jnp.swapaxes(h_inits[0], 0, 1)  # (4, B, H)
    hi1 = jnp.swapaxes(h_inits[1], 0, 1)
    bias = jnp.stack([p0["b_hh"], p1["b_ih"], p1["b_hh"]])  # (3, 3H)

    tile_b = min(tile_b, round_up(batch, 8))
    if tile_b % halves or (tile_b // halves) % 8:
        raise ValueError(f"tile_b {tile_b} must split into {halves} sublane-"
                         "aligned halves")
    padded_b = round_up(batch, tile_b)
    if padded_b != batch:
        pad = padded_b - batch
        ctx_xw = jnp.pad(ctx_xw, ((0, 0), (0, pad), (0, 0)))
        hi0 = jnp.pad(hi0, ((0, 0), (0, pad), (0, 0)))
        hi1 = jnp.pad(hi1, ((0, 0), (0, pad), (0, 0)))
    n_tiles = padded_b // tile_b
    grid = (n_tiles, NUM_TICKS)

    def const(i, t):
        return (0, 0)

    def beat_map(i, t):
        return (t // TICKS_PER_BEAT, i, 0)

    kernel = functools.partial(
        _decode_kernel, hidden=hidden, vocab=vocab, vocab_pad=vocab_pad,
        out_dtype=dtype, halves=halves,
    )
    logits_t, samples_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_b, three_h), beat_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, hidden), beat_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, hidden), beat_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((vocab_pad, three_h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, three_h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, three_h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, three_h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, three_h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, three_h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, vocab_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vocab_pad), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_b, vocab_pad), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_b), lambda i, t: (t, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NUM_TICKS, padded_b, vocab_pad), dtype),
            jax.ShapeDtypeStruct((NUM_TICKS, 1, padded_b), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_b, hidden), dtype),
            pltpu.VMEM((tile_b, hidden), dtype),
            pltpu.VMEM((tile_b, three_h), dtype),
        ],
        interpret=interpret,
    )(ctx_xw, hi0, hi1, tok_tab, x0_xw, p0["w_hh"], p1["w_ih"], p1["w_hh"],
      bias, head_w, head_b)

    logits = jnp.swapaxes(logits_t, 0, 1)[:batch, :, :vocab]
    samples = jnp.swapaxes(samples_t[:, 0, :], 0, 1)[:batch]
    return logits, samples
