"""MeasureVAE: bidirectional-GRU encoder + hierarchical beat/tick decoder.

TPU-first redesign of the reference model family
(``MeasureVAE/{encoder,decoder,measure_vae}.py``):

- Encoder (encoder.py:9-134): embedding -> 2-layer bi-GRU -> concat of all
  final hidden states -> two Linear/SELU/Linear heads -> DiagNormal.
- HierarchicalDecoder (decoder.py:313-529): z -> beat-GRU (4 steps over a
  learned constant input) -> per-beat tick-GRU (6 steps). The reference
  unrolls 24 sequential Python steps with a host sync per step
  (decoder.py:40-45, 473-529); here:
    * the TEACHER-FORCED path runs the 4 beats **in parallel** (vmap) with
      6 scanned ticks each — all inputs are known in advance;
    * the SAMPLING path is a single 24-step ``lax.scan`` carrying
      (hidden, prev-token-embedding, rng), with the per-beat hidden re-init
      expressed as a masked select — no host syncs, full-batch decode.
  The per-batch teacher-forcing coin flip (decoder.py:431-434) happens
  inside jit via ``jax.random.bernoulli`` + ``lax.cond``.
- Quirk kept deliberately for parity: **ReLU on the output logits**
  (decoder.py:369-372) — logits are non-negative.
- SRDecoder / SRDecoderNoInput (decoder.py:57-310): flat single-GRU
  decoders kept as model-library alternates.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from inpaintnet_tpu.models.base import Model
from inpaintnet_tpu.ops import (
    DiagNormal,
    embedding_apply,
    embedding_init,
    gru_apply,
    gru_init,
    linear_apply,
    linear_init,
    mlp_selu_apply,
    mlp_selu_init,
    sample_argmax,
    sample_categorical,
)
from inpaintnet_tpu.ops.gru import _gru_gates, gru_stack_cell_apply

NUM_BEATS_PER_MEASURE = 4  # measure_vae.py:40-42
NUM_TICKS_PER_MEASURE = 24
TICKS_PER_BEAT = NUM_TICKS_PER_MEASURE // NUM_BEATS_PER_MEASURE


class Encoder:
    """q(z | measure) — reference MeasureVAE/encoder.py:9-134."""

    def __init__(
        self,
        note_embedding_dim: int,
        rnn_hidden_size: int,
        num_layers: int,
        num_notes: int,
        dropout: float,
        bidirectional: bool,
        z_dim: int,
    ):
        self.note_embedding_dim = note_embedding_dim
        self.rnn_hidden_size = rnn_hidden_size
        self.num_layers = num_layers
        self.num_notes = num_notes
        self.dropout = dropout
        self.bidirectional = bidirectional
        self.num_directions = 2 if bidirectional else 1
        self.z_dim = z_dim

    def __repr__(self):
        return (
            f"Encoder({self.note_embedding_dim},GRU,{self.num_layers},"
            f"{self.rnn_hidden_size},{self.dropout},{self.bidirectional},"
            f"{self.z_dim},)"
        )

    def init_params(self, key):
        k_emb, k_gru, k_mean, k_std = jax.random.split(key, 4)
        hid_cat = self.rnn_hidden_size * self.num_directions * self.num_layers
        hid_mid = self.rnn_hidden_size * self.num_directions
        return {
            "embedding": embedding_init(k_emb, self.num_notes, self.note_embedding_dim),
            "gru": gru_init(
                k_gru,
                self.note_embedding_dim,
                self.rnn_hidden_size,
                self.num_layers,
                self.bidirectional,
            ),
            "mean_head": mlp_selu_init(k_mean, hid_cat, hid_mid, self.z_dim),
            "log_std_head": mlp_selu_init(k_std, hid_cat, hid_mid, self.z_dim),
        }

    def _use_pallas(self, params) -> bool:
        """Fused inference kernel eligibility (ops/encoder_pallas.py).

        TPU-only, 2-layer bidirectional, and the layer-1 weights must fit
        VMEM alongside the pipeline blocks (~10 MB budget; f32 at H=512
        does not fit — serving runs bf16)."""
        import os

        if os.environ.get("INPAINTNET_ENCODER_IMPL", "pallas") != "pallas":
            return False
        if not (self.bidirectional and self.num_layers == 2):
            return False
        if jax.default_backend() != "tpu":
            return False
        H = self.rnn_hidden_size
        w = params["gru"][1][0]["w_hh"]
        weight_bytes = (2 * (2 * H * 3 * H) + 2 * (H * 3 * H)) * w.dtype.itemsize
        return weight_bytes < 10e6

    def apply(self, params, score_tensor, *, train: bool = False, rng=None) -> DiagNormal:
        """:param score_tensor: (B, T) int tokens -> DiagNormal over z."""
        batch = score_tensor.shape[0]
        if not train and self._use_pallas(params):
            from inpaintnet_tpu.ops.encoder_pallas import (
                encoder_hn_pallas,
                encoder_hn_pallas_int8,
            )
            from inpaintnet_tpu.ops.pallas_common import kernel_with_xla_grad
            from inpaintnet_tpu.ops.quantize import serve_quant_mode

            # serve_quant int8 (INPAINTNET_SERVE_QUANT env or the
            # ops.quantize.serving_quant scope): per-channel int8 weights
            # + int8 recurrent states on the MXU's int8 path (~1.37x the
            # bf16 kernel at serving shapes; quality-neutral on trained
            # weights — see ops/quantize.py and docs/PERFORMANCE.md).
            # Resolved at trace time like INPAINTNET_ENCODER_IMPL.
            if serve_quant_mode() == "int8":
                kernel = lambda gp, tab, tok: encoder_hn_pallas_int8(  # noqa: E731
                    gp, tab, tok
                )
            else:
                kernel = lambda gp, tab, tok: encoder_hn_pallas(gp, tab, tok)  # noqa: E731

            # kernel forward; equivalent XLA scan under differentiation
            # (pallas_call has no autodiff rule)
            fn = kernel_with_xla_grad(
                kernel,
                lambda gp, tab, tok: gru_apply(
                    gp, embedding_apply({"table": tab}, tok),
                    last_outputs=False,
                )[1],
            )
            h_n = fn(params["gru"], params["embedding"]["table"], score_tensor)
            return self._heads(params, h_n, batch)
        if train and self._use_pallas(params) and os.environ.get(
            "INPAINTNET_TRAIN_ENCODER_IMPL", "xla"
        ) == "pallas":
            return self._apply_train_pallas(params, score_tensor, rng)
        emb = embedding_apply(params["embedding"], score_tensor)
        _, h_n = gru_apply(
            params["gru"], emb, dropout=self.dropout, rng=rng, train=train,
            last_outputs=False,  # only h_n is consumed
            # serving: skip the (B, T, 3H) HBM xw slabs; training keeps the
            # batched projection (one matmul in the backward pass)
            xw_inloop=not train,
        )
        return self._heads(params, h_n, batch)

    def _apply_train_pallas(self, params, score_tensor, rng) -> DiagNormal:
        """TRAINING forward through the fused kernel (round-3 verdict #2).

        Opt-in via ``INPAINTNET_TRAIN_ENCODER_IMPL=pallas``. The
        inter-layer dropout keep mask is drawn HERE with the exact split
        sequence ``gru_apply`` would use (one ``split`` for the single
        non-last layer), then shared between the kernel forward (applied
        on the materialized layer-0 slabs between its two pallas_calls)
        and the XLA scan that ``kernel_with_xla_grad`` differentiates —
        so primal and gradient see the identical dropout pattern, and the
        route equals the default scan route up to kernel numerics."""
        from inpaintnet_tpu.ops.encoder_pallas import encoder_hn_pallas
        from inpaintnet_tpu.ops.pallas_common import kernel_with_xla_grad

        batch = score_tensor.shape[0]
        rate = self.dropout
        if rate > 0.0:
            if rng is None:
                raise ValueError("dropout requires an rng key in train mode")
            _, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(
                sub, 1.0 - rate,
                (batch, score_tensor.shape[1], 2 * self.rnn_hidden_size),
            )
        else:
            keep = None

        def kernel(gp, tab, tok, kp):
            return encoder_hn_pallas(gp, tab, tok, keep=kp, rate=rate)

        def xla(gp, tab, tok, kp):
            return gru_apply(
                gp, embedding_apply({"table": tab}, tok),
                dropout=rate, train=True,
                dropout_masks=None if kp is None else [kp],
                last_outputs=False,
            )[1]

        fn = kernel_with_xla_grad(kernel, xla)
        h_n = fn(
            params["gru"], params["embedding"]["table"], score_tensor, keep
        )
        return self._heads(params, h_n, batch)

    def _heads(self, params, h_n, batch) -> DiagNormal:
        """Shared z-head tail for both recurrence routes: torch layout
        concat (encoder.py:126-127) (L*D, B, H) -> (B, L*D*H) -> mean and
        log-std heads."""
        hidden = jnp.transpose(h_n, (1, 0, 2)).reshape(batch, -1)
        z_mean = mlp_selu_apply(params["mean_head"], hidden)
        z_log_std = mlp_selu_apply(params["log_std_head"], hidden)
        return DiagNormal(z_mean, jnp.exp(z_log_std))


class HierarchicalDecoder:
    """p(measure | z) — reference MeasureVAE/decoder.py:313-529."""

    name = "HierarchicalDecoder"

    def __init__(
        self,
        note_embedding_dim: int,
        num_notes: int,
        z_dim: int,
        num_layers: int,
        rnn_hidden_size: int,
        dropout: float,
    ):
        self.note_embedding_dim = note_embedding_dim
        self.num_notes = num_notes
        self.z_dim = z_dim
        self.num_layers = num_layers
        self.rnn_hidden_size = rnn_hidden_size
        self.dropout = dropout
        self.use_teacher_forcing = True
        self.teacher_forcing_prob = 0.5  # decoder.py:374-376
        self.sampling = "argmax"

    def __repr__(self):
        return (
            f"{self.name}{self.note_embedding_dim},GRU,{self.num_layers},"
            f"{self.rnn_hidden_size},{self.dropout},)"
        )

    def init_params(self, key):
        keys = jax.random.split(key, 7)
        H, L, E = self.rnn_hidden_size, self.num_layers, self.note_embedding_dim
        return {
            "embedding": embedding_init(keys[0], self.num_notes, E),
            "z_to_beat_hidden": linear_init(keys[1], self.z_dim, H * L),
            "b_0": jnp.zeros((1,)),
            "beat_gru": gru_init(keys[2], 1, H, L),
            "beat_to_tick_hidden": linear_init(keys[3], H, H * L),
            "beat_to_tick_input": linear_init(keys[4], H, H),
            "x_0": jnp.zeros((E,)),
            "tick_gru": gru_init(keys[5], E + H, H, L),
            "head": linear_init(keys[6], H, self.num_notes),
        }

    # --- shared pieces ----------------------------------------------------- #
    def _beat_outputs(self, params, z, *, train, rng):
        """z -> beat-RNN outputs (B, 4, H) (decoder.py:455-471)."""
        batch = z.shape[0]
        h0 = jax.nn.selu(linear_apply(params["z_to_beat_hidden"], z))
        h0 = jnp.transpose(h0.reshape(batch, self.num_layers, -1), (1, 0, 2))
        beat_in = jnp.broadcast_to(
            params["b_0"][None, None, :], (batch, NUM_BEATS_PER_MEASURE, 1)
        )
        beat_out, _ = gru_apply(
            params["beat_gru"], beat_in, h0, dropout=self.dropout, rng=rng, train=train
        )
        return beat_out

    def _tick_h0(self, params, beat_vec):
        """Per-beat tick-RNN init hidden (B, H) -> (L, B, H)
        (decoder.py:392-410)."""
        batch = beat_vec.shape[0]
        h0 = jax.nn.selu(linear_apply(params["beat_to_tick_hidden"], beat_vec))
        return jnp.transpose(h0.reshape(batch, self.num_layers, -1), (1, 0, 2))

    def _logits(self, params, tick_out):
        # ReLU on logits — load-bearing reference quirk (decoder.py:369-372)
        return jax.nn.relu(linear_apply(params["head"], tick_out))

    def _use_pallas_decode(self, params) -> bool:
        """Fused 24-tick decode kernel eligibility (ops/decode_pallas.py):
        TPU, 2 tick-GRU layers, argmax sampling, weights fit VMEM."""
        import os

        if os.environ.get("INPAINTNET_DECODE_IMPL", "pallas") != "pallas":
            return False
        if self.num_layers != 2 or self.sampling != "argmax":
            return False
        if jax.default_backend() != "tpu":
            return False
        H = self.rnn_hidden_size
        w = params["tick_gru"][0][0]["w_hh"]
        vocab_pad = (self.num_notes + 127) // 128 * 128
        weight_bytes = (
            3 * H * 3 * H + H * vocab_pad + vocab_pad * 3 * H
        ) * w.dtype.itemsize
        return weight_bytes < 10e6

    # --- teacher-forced parallel path --------------------------------------- #
    def decode_teacher_forced(self, params, z, score_tensor, *, train, rng):
        """All 4 beats decoded in parallel; inputs are ground truth.

        :return: (logits (B, 24, V), samples (B, 24))
        """
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r_beat, r_tick, r_samp = jax.random.split(rng, 3)
        batch = z.shape[0]
        beat_out = self._beat_outputs(params, z, train=train, rng=r_beat)

        emb = embedding_apply(params["embedding"], score_tensor)  # (B, 24, E)
        x0 = jnp.broadcast_to(params["x_0"][None, None, :], (batch, 1, emb.shape[-1]))
        emb_in = jnp.concatenate([x0, emb[:, :-1, :]], axis=1)  # shifted inputs

        tick_ctx = jax.nn.selu(
            linear_apply(params["beat_to_tick_input"], beat_out)
        )  # (B, 4, H)
        # (B, 4, 6, E + H): per-tick input = [prev-token emb, beat context]
        emb_beats = emb_in.reshape(batch, NUM_BEATS_PER_MEASURE, TICKS_PER_BEAT, -1)
        ctx_beats = jnp.broadcast_to(
            tick_ctx[:, :, None, :],
            (batch, NUM_BEATS_PER_MEASURE, TICKS_PER_BEAT, tick_ctx.shape[-1]),
        )
        xs = jnp.concatenate([emb_beats, ctx_beats], axis=-1)
        h0s = self._tick_h0(
            params, beat_out.reshape(batch * NUM_BEATS_PER_MEASURE, -1)
        ).reshape(self.num_layers, batch, NUM_BEATS_PER_MEASURE, -1)

        def run_beat(x_b, h0_b, key_b):
            # x_b: (B, 6, E+H); h0_b: (L, B, H)
            out, _ = gru_apply(
                params["tick_gru"], x_b, h0_b,
                dropout=self.dropout, rng=key_b, train=train,
            )
            return out

        beat_keys = jax.random.split(r_tick, NUM_BEATS_PER_MEASURE)
        tick_out = jax.vmap(run_beat, in_axes=(1, 2, 0), out_axes=1)(
            xs, h0s, beat_keys
        )  # (B, 4, 6, H)
        logits = self._logits(params, tick_out).reshape(
            batch, NUM_TICKS_PER_MEASURE, self.num_notes
        )
        samples = self._sample(logits, train, r_samp)
        return logits, samples

    # --- sequential sampling path ------------------------------------------- #
    def decode_sampling(self, params, z, *, train, rng, score_tensor=None):
        """24-step autoregressive decode as one ``lax.scan``; the per-beat
        hidden re-init (decoder.py:494) is a masked select at t % 6 == 0.

        MXU-conscious formulation: layer-0's input projection is hoisted out
        of the sequential loop entirely —

        * embedding∘linear fuse: ``emb(tok) @ W_ih0[:E]`` is one row of a
          precomputed ``(V, 3H)`` table (a linear of a one-hot lookup is a
          lookup into the product table), so the loop does a (B,)-row gather
          instead of a (B, E+H) x (E+H, 3H) matmul;
        * the beat-context part ``ctx @ W_ih0[E:]`` is one batched matmul
          over all 24 ticks before the scan.

        The loop body is left with only the recurrent matmuls (hidden +
        inter-layer), gate math, head and sample — algebraically identical
        to the reference's per-tick ``cat(emb, ctx) @ W_ih`` (decoder.py:
        473-529).

        :return: (logits (B, 24, V), samples (B, 24))
        """
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r_beat, r_scan = jax.random.split(rng)
        batch = z.shape[0]
        beat_out = self._beat_outputs(params, z, train=train, rng=r_beat)
        tick_ctx = jax.nn.selu(
            linear_apply(params["beat_to_tick_input"], beat_out)
        )  # (B, 4, H)
        h_inits = self._tick_h0(
            params, beat_out.reshape(batch * NUM_BEATS_PER_MEASURE, -1)
        ).reshape(self.num_layers, batch, NUM_BEATS_PER_MEASURE, -1)

        if score_tensor is None and not train and self._use_pallas_decode(params):
            from inpaintnet_tpu.ops.decode_pallas import (
                decode_sampling_pallas,
                decode_sampling_pallas_int8,
            )
            from inpaintnet_tpu.ops.pallas_common import kernel_with_xla_grad
            from inpaintnet_tpu.ops.quantize import serve_quant_mode

            # serve_quant int8: quantized decode (see the encoder route
            # above and ops/quantize.py)
            if serve_quant_mode() == "int8":
                kernel = lambda p, c, h: decode_sampling_pallas_int8(p, c, h)  # noqa: E731
            else:
                kernel = lambda p, c, h: decode_sampling_pallas(p, c, h)  # noqa: E731

            # pallas_call has no autodiff rule; under jax.grad (LatentRNN
            # training differentiates through this frozen-VAE decode) the
            # wrapper linearizes the equivalent XLA scan instead
            fn = kernel_with_xla_grad(
                kernel,
                lambda p, c, h: self._decode_scan(
                    p, c, h, train=False, rng=jax.random.PRNGKey(0),
                    score_tensor=None,
                ),
            )
            return fn(params, tick_ctx, h_inits)

        return self._decode_scan(
            params, tick_ctx, h_inits, train=train, rng=r_scan,
            score_tensor=score_tensor,
        )

    def _decode_scan(self, params, tick_ctx, h_inits, *, train, rng,
                     score_tensor):
        """The XLA formulation of the 24-tick decode, from the per-beat
        context/init-hiddens (shared by the Pallas routing above as the
        autodiff fallback)."""
        batch = tick_ctx.shape[0]
        r_scan = rng
        ts = jnp.arange(NUM_TICKS_PER_MEASURE)
        beat_idx = ts // TICKS_PER_BEAT
        reset = (ts % TICKS_PER_BEAT) == 0
        ctx_t = jnp.take(tick_ctx, beat_idx, axis=1)  # (B, 24, H)
        h_init_t = jnp.take(h_inits, beat_idx, axis=2)  # (L, B, 24, H)
        step_keys = jax.random.split(r_scan, NUM_TICKS_PER_MEASURE)

        E = self.note_embedding_dim
        p0 = params["tick_gru"][0][0]
        token_xw = params["embedding"]["table"] @ p0["w_ih"][:E]  # (V, 3H)
        ctx_xw = ctx_t @ p0["w_ih"][E:] + p0["b_ih"]  # (B, 24, 3H)
        x0_xw = jnp.broadcast_to(
            (params["x_0"] @ p0["w_ih"][:E])[None, :],
            (batch, token_xw.shape[-1]),
        )
        h_carry0 = jnp.zeros(
            (self.num_layers, batch, self.rnn_hidden_size), params["x_0"].dtype
        )

        multinomial = train and self.sampling == "multinomial"

        def step(carry, xs_t):
            h, prev_xw = carry
            ctxw, h_init, do_reset, key, tick = xs_t
            h = jnp.where(do_reset, h_init, h)
            k_drop, k_samp = jax.random.split(key)
            xw = prev_xw + ctxw
            new_h = []
            inp = None
            for layer in range(self.num_layers):
                p = params["tick_gru"][layer][0]
                if layer > 0:
                    xw = inp @ p["w_ih"] + p["b_ih"]
                h_l = _gru_gates(p, h[layer], xw)
                new_h.append(h_l)
                inp = h_l
                if train and self.dropout > 0.0 and layer < self.num_layers - 1:
                    k_drop, sub = jax.random.split(k_drop)
                    keep = jax.random.bernoulli(sub, 1.0 - self.dropout, inp.shape)
                    inp = jnp.where(keep, inp / (1.0 - self.dropout), 0.0)
            h = jnp.stack(new_h)
            logits = self._logits(params, inp)
            if multinomial:
                sampled = sample_categorical(k_samp, logits)
            else:
                sampled = sample_argmax(logits)
            if score_tensor is not None:
                # teacher forcing inside the sequential path (used by tests)
                sampled_in = score_tensor[:, tick]
            else:
                sampled_in = sampled
            next_xw = jnp.take(token_xw, sampled_in, axis=0)
            return (h, next_xw), (logits, sampled)

        xs = (
            jnp.swapaxes(ctx_xw, 0, 1),  # (24, B, 3H)
            jnp.transpose(h_init_t, (2, 0, 1, 3)),  # (24, L, B, H)
            reset,
            step_keys,
            ts,
        )
        (_, _), (logits, samples) = lax.scan(step, (h_carry0, x0_xw), xs)
        return jnp.swapaxes(logits, 0, 1), jnp.swapaxes(samples, 0, 1)

    def _sample(self, logits, train, rng):
        if train and self.sampling == "multinomial":
            return sample_categorical(rng, logits)
        return sample_argmax(logits)

    # --- reference-facing entry point --------------------------------------- #
    def apply(self, params, z, score_tensor, *, train: bool, rng=None):
        """Forward pass with the reference's per-batch TF coin flip
        (decoder.py:431-434). ``train=False`` -> pure sampling decode with
        argmax (decoder.py:435-438)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r_flip, r_dec = jax.random.split(rng)
        if not (train and self.use_teacher_forcing):
            return self.decode_sampling(params, z, train=train, rng=r_dec)
        coin = jax.random.bernoulli(r_flip, self.teacher_forcing_prob)
        return lax.cond(
            coin,
            lambda: self.decode_teacher_forced(
                params, z, score_tensor, train=train, rng=r_dec
            ),
            lambda: self.decode_sampling(params, z, train=train, rng=r_dec),
        )


class SRDecoder:
    """Flat single-GRU decoder alternate (decoder.py:57-214)."""

    name = "SRDecoder"

    def __init__(self, note_embedding_dim, num_notes, z_dim, num_layers,
                 rnn_hidden_size, dropout):
        self.note_embedding_dim = note_embedding_dim
        self.num_notes = num_notes
        self.z_dim = z_dim
        self.num_layers = num_layers
        self.rnn_hidden_size = rnn_hidden_size
        self.dropout = dropout
        self.use_teacher_forcing = True
        self.teacher_forcing_prob = 0.5
        self.sampling = "argmax"

    def __repr__(self):
        return (
            f"{self.name}{self.note_embedding_dim},GRU,{self.num_layers},"
            f"{self.rnn_hidden_size},{self.dropout},)"
        )

    def init_params(self, key):
        keys = jax.random.split(key, 4)
        E, H = self.note_embedding_dim, self.rnn_hidden_size
        return {
            "embedding": embedding_init(keys[0], self.num_notes, E),
            "z_to_rnn_input": mlp_selu_init(keys[1], self.z_dim, H, E),
            "x_0": jnp.zeros((E,)),
            "gru": gru_init(keys[2], 2 * E, H, self.num_layers),
            "head": linear_init(keys[3], H, self.num_notes),
        }

    def apply(self, params, z, score_tensor, *, train: bool, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r_flip, r_dec = jax.random.split(rng)
        batch = z.shape[0]
        seq_len = score_tensor.shape[1]
        z_emb = mlp_selu_apply(params["z_to_rnn_input"], z)  # (B, E)

        def teacher_forced():
            emb = embedding_apply(params["embedding"], score_tensor)
            x0 = jnp.broadcast_to(params["x_0"][None, None, :], (batch, 1, emb.shape[-1]))
            emb_in = jnp.concatenate([x0, emb[:, :-1, :]], axis=1)
            xs = jnp.concatenate(
                [emb_in, jnp.broadcast_to(z_emb[:, None, :], emb_in.shape)], axis=-1
            )
            out, _ = gru_apply(
                params["gru"], xs, dropout=self.dropout, rng=r_dec, train=train
            )
            logits = jax.nn.relu(linear_apply(params["head"], out))
            return logits, sample_argmax(logits)

        def sequential():
            step_keys = jax.random.split(r_dec, seq_len)
            x0 = jnp.broadcast_to(params["x_0"][None, :], (batch, self.note_embedding_dim))
            h0 = jnp.zeros(
                (self.num_layers, batch, self.rnn_hidden_size), params["x_0"].dtype
            )

            def step(carry, key):
                h, prev_emb = carry
                x = jnp.concatenate([prev_emb, z_emb], axis=-1)
                k_drop, k_samp = jax.random.split(key)
                h, out = gru_stack_cell_apply(
                    params["gru"], h, x, dropout=self.dropout, rng=k_drop, train=train
                )
                logits = jax.nn.relu(linear_apply(params["head"], out))
                if train and self.sampling == "multinomial":
                    sampled = sample_categorical(k_samp, logits)
                else:
                    sampled = sample_argmax(logits)
                return (h, embedding_apply(params["embedding"], sampled)), (logits, sampled)

            _, (logits, samples) = lax.scan(step, (h0, x0), step_keys)
            return jnp.swapaxes(logits, 0, 1), jnp.swapaxes(samples, 0, 1)

        if not (train and self.use_teacher_forcing):
            return sequential()
        coin = jax.random.bernoulli(r_flip, self.teacher_forcing_prob)
        return lax.cond(coin, teacher_forced, sequential)


class SRDecoderNoInput(SRDecoder):
    """Non-autoregressive flat decoder: z broadcast to every step, one GRU
    pass (decoder.py:217-310)."""

    name = "SRDecoderNoInput"

    def init_params(self, key):
        keys = jax.random.split(key, 4)
        E, H = self.note_embedding_dim, self.rnn_hidden_size
        return {
            "embedding": embedding_init(keys[0], self.num_notes, E),
            "z_to_rnn_input": linear_init(keys[1], self.z_dim, H),
            "x_0": jnp.zeros((E,)),
            "gru": gru_init(keys[2], H, H, self.num_layers),
            "head": linear_init(keys[3], H, self.num_notes),
        }

    def apply(self, params, z, score_tensor, *, train: bool, rng=None):
        del score_tensor
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        seq_len = NUM_TICKS_PER_MEASURE
        z_in = linear_apply(params["z_to_rnn_input"], z)
        xs = jnp.broadcast_to(z_in[:, None, :], (z.shape[0], seq_len, z_in.shape[-1]))
        out, _ = gru_apply(params["gru"], xs, dropout=self.dropout, rng=rng, train=train)
        logits = jax.nn.relu(linear_apply(params["head"], out))
        return logits, sample_argmax(logits)


class MeasureVAE(Model):
    """Composition + reparameterized forward (measure_vae.py:10-169)."""

    def __init__(
        self,
        dataset,
        note_embedding_dim: int = 10,
        metadata_embedding_dim: int = 2,
        num_encoder_layers: int = 2,
        encoder_hidden_size: int = 512,
        encoder_dropout_prob: float = 0.5,
        latent_space_dim: int = 256,
        num_decoder_layers: int = 2,
        decoder_hidden_size: int = 512,
        decoder_dropout_prob: float = 0.5,
        has_metadata: bool = False,
        checkpoint_dir: Optional[str] = None,
    ):
        super().__init__(checkpoint_dir=checkpoint_dir)
        self.dataset_repr = repr(dataset)
        self.num_beats_per_measure = NUM_BEATS_PER_MEASURE
        self.num_ticks_per_measure = NUM_TICKS_PER_MEASURE
        self.latent_space_dim = latent_space_dim
        self.has_metadata = has_metadata
        self.num_notes = len(dataset.note2index_dicts[0])
        self.encoder = Encoder(
            note_embedding_dim=note_embedding_dim,
            rnn_hidden_size=encoder_hidden_size,
            num_layers=num_encoder_layers,
            num_notes=self.num_notes,
            dropout=encoder_dropout_prob,
            bidirectional=True,
            z_dim=latent_space_dim,
        )
        self.decoder = HierarchicalDecoder(
            note_embedding_dim=note_embedding_dim,
            num_notes=self.num_notes,
            z_dim=latent_space_dim,
            num_layers=num_decoder_layers,
            rnn_hidden_size=decoder_hidden_size,
            dropout=decoder_dropout_prob,
        )

    def __repr__(self):
        return (
            f"MeasureVAE({self.dataset_repr},{repr(self.encoder)},"
            f"{repr(self.decoder)},)"
        )

    def init_params(self, key):
        k_enc, k_dec = jax.random.split(key)
        return {
            "encoder": self.encoder.init_params(k_enc),
            "decoder": self.decoder.init_params(k_dec),
        }

    # --- pure functional API ------------------------------------------------ #
    def apply(self, params, measure_score_tensor, *, train: bool = True, rng=None):
        """VAE forward (measure_vae.py:97-134).

        :param measure_score_tensor: (B, 24) int tokens
        :return: (weights (B,24,V), samples (B,24), z_dist, prior_dist,
                  z_tilde, z_prior)
        """
        assert measure_score_tensor.shape[1] == self.num_ticks_per_measure
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r_enc, r_z, r_prior, r_dec = jax.random.split(rng, 4)
        z_dist = self.encoder.apply(
            params["encoder"], measure_score_tensor, train=train, rng=r_enc
        )
        z_tilde = z_dist.rsample(r_z)
        prior_dist = DiagNormal(jnp.zeros_like(z_dist.loc), jnp.ones_like(z_dist.scale))
        z_prior = prior_dist.sample(r_prior)
        weights, samples = self.decoder.apply(
            params["decoder"], z_tilde, measure_score_tensor, train=train, rng=r_dec
        )
        return weights, samples, z_dist, prior_dist, z_tilde, z_prior

    def apply_test(self, params, measures_tensor, *, rng=None):
        """Multi-measure reconstruction (measure_vae.py:136-169), batched
        over measures instead of the reference's per-measure Python loop.

        :param measures_tensor: (B, M, 24)
        :return: (weights (B, M, 24, V), samples (B, M, 24))
        """
        batch, num_measures, seq_len = measures_tensor.shape
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r_enc, r_z, r_dec = jax.random.split(rng, 3)
        flat = measures_tensor.reshape(batch * num_measures, seq_len)
        z_dist = self.encoder.apply(params["encoder"], flat, train=False, rng=r_enc)
        z = z_dist.rsample(r_z)
        weights, samples = self.decoder.decode_sampling(
            params["decoder"], z, train=False, rng=r_dec
        )
        return (
            weights.reshape(batch, num_measures, seq_len, -1),
            samples.reshape(batch, num_measures, seq_len),
        )

    # convenience stateful entry (tester/scripts layer)
    def __call__(self, measure_score_tensor, train: bool = True, rng=None):
        return self.apply(self.params, measure_score_tensor, train=train, rng=rng)
