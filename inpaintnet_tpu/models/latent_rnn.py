"""LatentRNN (InpaintNet): latent-space traversal over a frozen MeasureVAE.

TPU-first redesign of ``LatentRNN/latent_rnn.py:11-307`` and
``latent_rnn_ablations.py``:

- The reference takes ragged (num_past, num_target, num_future) tensors and
  recompiles nothing because it is eager torch. Under XLA every shape is a
  compilation, so here past/future contexts live in FIXED buffers of
  ``max_measures`` with per-example validity masks, and the target in a
  ``max_target`` buffer. Mask-aware GRU scans (ops/gru.py) make the padded
  runs exactly equal the unpadded ones; losses mask invalid positions.
- ``get_z_seq`` (latent_rnn.py:161-174) becomes one batched encoder call
  over B*M measures; the quirk of re-sampling (rsample, not mean) at
  inference is kept.
- Generation modes (latent_rnn.py:211-263):
    * non-autoregressive (shipped config): one bidirectional GRU pass over
      a learned constant input, then the frozen VAE decoder on every
      predicted z — all ``max_target`` measures decoded as ONE batch.
    * autoregressive teacher-forced: one GRU pass over [z_past_last,
      z_target[:-1]].
    * autoregressive sampled: ``lax.scan`` over measures, each step decoding
      a measure (inner 24-step scan) and re-encoding its sampled tokens.
- VAE params enter through ``stop_gradient`` — the functional equivalent of
  the reference's ``requires_grad=False`` freeze (latent_rnn.py:42-44).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from inpaintnet_tpu.models.base import Model
from inpaintnet_tpu.models.measure_vae import (
    MeasureVAE,
    NUM_TICKS_PER_MEASURE,
)
from inpaintnet_tpu.ops import gru_apply, gru_init, linear_apply, linear_init


class LatentRNN(Model):
    def __init__(
        self,
        dataset,
        vae_model: MeasureVAE,
        num_rnn_layers: int,
        rnn_hidden_size: int,
        dropout: float,
        auto_reg: bool = False,
        teacher_forcing: bool = True,
        max_target: int = 6,
        checkpoint_dir: Optional[str] = None,
    ):
        super().__init__(checkpoint_dir=checkpoint_dir)
        self.dataset_repr = repr(dataset)
        self.vae_model = vae_model
        self.auto_reg = auto_reg
        self.use_teacher_forcing = teacher_forcing if auto_reg else False
        self.teacher_forcing_prob = 0.5
        self.num_rnn_layers = num_rnn_layers
        self.rnn_hidden_size = rnn_hidden_size
        self.dropout = dropout
        self.z_dim = vae_model.latent_space_dim
        self.bidirectional = True
        self.num_directions = 2
        self.max_target = max_target
        self.measure_seq_len = NUM_TICKS_PER_MEASURE

    def __repr__(self):
        s = (
            f"LatentRNN({self.dataset_repr}GRU,{self.num_rnn_layers},"
            f"{self.rnn_hidden_size},{self.dropout},)"
        )
        if self.auto_reg:
            s += "auto_reg"
        s += ",tf" if self.use_teacher_forcing else ",no_tf"
        return s

    # --- params ------------------------------------------------------------ #
    @property
    def gen_hidden_size(self) -> int:
        # generation RNN hidden = H * num_layers (latent_rnn.py:75-82)
        return self.rnn_hidden_size * self.num_rnn_layers

    def _check_geometry(self):
        # The generation RNN's initial hidden is the concatenated context
        # (2H wide), so its hidden size H*L must equal 2H — i.e. the
        # architecture closes only for num_rnn_layers == 2, the reference's
        # shipped config (latent_rnn.py:75-83,140).
        if self.gen_hidden_size != 2 * self.rnn_hidden_size:
            raise ValueError(
                "LatentRNN requires num_rnn_layers == 2 (generation hidden "
                "H*L must match the concatenated 2H context)"
            )

    def init_params(self, key):
        self._check_geometry()
        keys = jax.random.split(key, 5)
        gen_in = self.z_dim if self.auto_reg else 1
        params = {
            "context_rnn_past": gru_init(
                keys[0], self.z_dim, self.rnn_hidden_size, self.num_rnn_layers, True
            ),
            "context_rnn_future": gru_init(
                keys[1], self.z_dim, self.rnn_hidden_size, self.num_rnn_layers, True
            ),
            "generation_rnn": gru_init(
                keys[2], gen_in, self.gen_hidden_size, self.num_rnn_layers, True
            ),
            "generation_linear": linear_init(
                keys[3], 2 * self.rnn_hidden_size * self.num_directions, self.z_dim
            ),
        }
        if not self.auto_reg:
            params["x_0"] = jax.random.normal(keys[4], (1, 1, 1))
        return params

    # --- submodules ---------------------------------------------------------- #
    def get_z_seq(self, vae_params, measures_tensor, *, train, rng,
                  row_keys=None):
        """(B, M, 24) tokens -> (B, M, z): one batched frozen-encoder call
        (latent_rnn.py:161-174; rsample kept deliberately).

        :param row_keys: optional (B, 2) uint32 PRNG keys — one per batch
            row. When given, row ``b``'s rsample noise is drawn from
            ``row_keys[b]`` alone, making each row's output independent of
            its batch position and of the other rows (the serving batch-
            coalescing contract, serve.InpaintingEngine.inpaint_hetero).
            ``rng`` is then unused for the draw."""
        batch, num_measures, msl = measures_tensor.shape
        r_enc, r_z = jax.random.split(rng)
        flat = measures_tensor.reshape(batch * num_measures, msl)
        z_dist = self.vae_model.encoder.apply(
            vae_params["encoder"], flat, train=train, rng=r_enc
        )
        if row_keys is None:
            z = z_dist.rsample(r_z)
            return z.reshape(batch, num_measures, self.z_dim)
        loc = z_dist.loc.reshape(batch, num_measures, self.z_dim)
        scale = z_dist.scale.reshape(batch, num_measures, self.z_dim)
        eps = jax.vmap(
            lambda k: jax.random.normal(
                k, (num_measures, self.z_dim), loc.dtype
            )
        )(row_keys)
        return loc + scale * eps

    def encode_context_dists(self, vae_params, past_context, future_context,
                             *, train: bool = False, rng=None):
        """One frozen-encoder pass over past+future, returning the
        per-measure posterior (loc, scale) WITHOUT sampling.

        Serving API beyond the reference: generation stochasticity in the
        shipped non-autoreg config comes only from the per-measure
        ``rsample`` (latent_rnn.py:161-174 — argmax decode is
        deterministic), so callers can cache these distributions and draw
        many variations without re-running the encoder — the dominant
        serving cost (the reference's same-context diversity script
        re-encodes per variation, script_gen_same_context.py:15-214).

        :return: ((loc, scale) for past, (loc, scale) for future),
                 each (B, M, z)
        """
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        batch, mp, msl = past_context.shape
        mf = future_context.shape[1]
        flat = jnp.concatenate([past_context, future_context], axis=1).reshape(
            batch * (mp + mf), msl
        )
        dist = self.vae_model.encoder.apply(
            vae_params["encoder"], flat, train=train, rng=rng
        )
        loc = dist.loc.reshape(batch, mp + mf, self.z_dim)
        scale = dist.scale.reshape(batch, mp + mf, self.z_dim)
        return (loc[:, :mp], scale[:, :mp]), (loc[:, mp:], scale[:, mp:])

    def generate_from_context_dists(
        self, params, vae_params, past_dist, future_dist, *,
        past_mask, future_mask, target_mask, rng,
    ):
        """Non-autoregressive generation from cached context posteriors
        (see :meth:`encode_context_dists`); distributionally identical to
        :meth:`apply` at ``train=False`` with ``auto_reg=False``.

        :param past_dist/future_dist: (loc, scale) pairs, (B, M, z) each
        :return: (weights, samples, gen_z) like :meth:`apply`
        """
        if self.auto_reg:
            raise ValueError(
                "generate_from_context_dists serves the non-autoregressive "
                "config only (the autoregressive path re-encodes samples)"
            )
        from inpaintnet_tpu.ops import DiagNormal

        vae_params = jax.tree_util.tree_map(lax.stop_gradient, vae_params)
        keys = jax.random.split(rng, 3)
        zp = DiagNormal(*past_dist).rsample(keys[0])
        zf = DiagNormal(*future_dist).rsample(keys[1])
        ctx_p = self.forward_context(params, zp, past_mask, "past",
                                     train=False, rng=None)
        ctx_f = self.forward_context(params, zf, future_mask, "future",
                                     train=False, rng=None)
        comb = self._combine_contexts(ctx_p, ctx_f)
        return self._generate_parallel(
            params, vae_params, comb, target_mask,
            seed=None, train=False, rng=keys[2],
        )

    def forward_context(self, params, z, mask, which: str, *, train, rng):
        """Final bi-GRU hidden over a masked latent sequence
        (latent_rnn.py:176-209). Returns (L*2, B, H)."""
        p = params["context_rnn_past" if which == "past" else "context_rnn_future"]
        _, h_n = gru_apply(
            p, z, mask=mask, dropout=self.dropout, rng=rng, train=train,
            last_outputs=False,  # only the final hidden is consumed
        )
        return h_n

    # --- main forward ---------------------------------------------------------- #
    def apply(
        self,
        params,
        vae_params,
        past_context,
        future_context,
        target,
        *,
        past_mask=None,
        future_mask=None,
        target_mask=None,
        train: bool = True,
        rng=None,
        row_keys=None,
    ):
        """Forward pass (latent_rnn.py:110-159).

        :param past_context: (B, Mp, 24) int tokens, padded; mask (B, Mp)
        :param future_context: (B, Mf, 24), padded; mask (B, Mf)
        :param target: (B, Mt, 24) ground-truth target (Mt == max_target
            padded) or None at pure inference with ``target_mask`` given
        :param row_keys: optional (B, 2) per-row PRNG keys — inference
            only. Non-autoregressive: the context rsample (the ONLY
            stochastic op) draws from them (see :meth:`get_z_seq`).
            Autoregressive: each row's key is split into a context stream
            and a per-step re-encode stream (argmax decode is
            deterministic), so EVERY stochastic draw is per-row. Either
            way a row's output depends on its own key alone regardless of
            batch composition (the serving coalescing contract).
        :return: (weights (B, Mt, 24, V), samples (B, Mt, 24),
                  gen_z (B, Mt, z))
        """
        if row_keys is not None and train:
            raise ValueError(
                "row_keys serves inference only: training draws dropout/"
                "teacher-forcing randomness from the batch-level rng"
            )
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        vae_params = jax.tree_util.tree_map(lax.stop_gradient, vae_params)
        batch, max_past, msl = past_context.shape
        if past_mask is None:
            past_mask = jnp.ones((batch, max_past))
        if future_mask is None:
            future_mask = jnp.ones((batch, future_context.shape[1]))
        if target_mask is None:
            target_mask = jnp.ones((batch, target.shape[1]))

        keys = jax.random.split(rng, 8)
        # auto_reg + per-row keys: split each row's key into an
        # independent context-rsample stream and a scan re-encode stream
        scan_row_keys = None
        ctx_row_keys = row_keys
        if row_keys is not None and self.auto_reg:
            both = jax.vmap(jax.random.split)(row_keys)  # (B, 2, 2)
            ctx_row_keys = both[:, 0]
            scan_row_keys = both[:, 1]
        # ONE frozen-encoder pass over all needed segments (concatenated on
        # the measure axis): separate 24-step encoder scans collapse into
        # one with more rows per recurrent matmul; identical distribution
        # (rsample noise is i.i.d. per element either way). The target is
        # only encoded when the autoregressive path can consume z_target —
        # the reference encodes it unconditionally (latent_rnn.py:133) but
        # in the non-autoreg config that work is dead (deliberate fix).
        max_future = future_context.shape[1]
        # z_target is consumed ONLY by the teacher-forcing branch, which is
        # reachable only when train and use_teacher_forcing (the coin is a
        # constant False otherwise) — and a dead branch's z_target cannot be
        # DCE'd out of the FUSED encoder call, so gate it here (at serving
        # this is 4 dead target measures of encoding per request)
        need_target = (
            self.auto_reg and target is not None
            and train and self.use_teacher_forcing
        )
        segments = [past_context, future_context]
        if need_target:
            segments.append(target)
        z_all = self.get_z_seq(
            vae_params, jnp.concatenate(segments, axis=1), train=train,
            rng=keys[0], row_keys=ctx_row_keys,
        )
        zp = z_all[:, :max_past]
        zf = z_all[:, max_past : max_past + max_future]
        if need_target:
            zt = z_all[:, max_past + max_future :]
        else:
            zt = jnp.zeros((batch, target_mask.shape[1], self.z_dim), zp.dtype)

        ctx_p = self.forward_context(params, zp, past_mask, "past", train=train, rng=keys[3])
        ctx_f = self.forward_context(params, zf, future_mask, "future", train=train, rng=keys[4])
        comb_context = self._combine_contexts(ctx_p, ctx_f)

        # last VALID past measure's z (latent_rnn.py:149-151)
        last_idx = jnp.maximum(past_mask.sum(axis=1).astype(jnp.int32) - 1, 0)
        zp_last = jnp.take_along_axis(zp, last_idx[:, None, None], axis=1)  # (B,1,z)

        if self.use_teacher_forcing and train:
            coin = jax.random.bernoulli(keys[5], self.teacher_forcing_prob)
        else:
            coin = jnp.asarray(False)

        if not self.auto_reg:
            return self._generate_parallel(
                params, vae_params, comb_context, target_mask,
                seed=None, train=train, rng=keys[6],
            )
        # auto-regressive: TF single-pass vs sampled scan
        seed_tf = jnp.concatenate([zp_last, zt[:, :-1, :]], axis=1)
        return lax.cond(
            coin,
            lambda: self._generate_parallel(
                params, vae_params, comb_context, target_mask,
                seed=seed_tf, train=train, rng=keys[6],
            ),
            lambda: self._generate_autoregressive(
                params, vae_params, comb_context, target_mask,
                seed=zp_last, train=train, rng=keys[7],
                row_keys=scan_row_keys,
            ),
        )

    def _combine_contexts(self, ctx_p, ctx_f):
        # concat on the hidden-feature axis (latent_rnn.py:140)
        return jnp.concatenate([ctx_p, ctx_f], axis=2)

    # --- generation paths --------------------------------------------------------- #
    def _decode_measures(self, vae_params, z_flat, *, rng):
        """Frozen-VAE decode of (N, z) latents -> (logits (N,24,V),
        samples (N,24)); train=False/argmax like the reference
        (latent_rnn.py:236-240)."""
        return self.vae_model.decoder.decode_sampling(
            vae_params["decoder"], z_flat, train=False, rng=rng
        )

    def _generate_parallel(
        self, params, vae_params, context, target_mask, *, seed, train, rng
    ):
        """Single bidirectional GRU pass over the target steps
        (latent_rnn.py:230-240): non-autoregressive (constant input) or
        teacher-forced (seed inputs)."""
        batch = context.shape[1]
        max_t = target_mask.shape[1]
        r_gru, r_dec = jax.random.split(rng)
        if seed is None:
            gen_in = jnp.broadcast_to(params["x_0"], (batch, max_t, 1))
        else:
            gen_in = seed
        gen_out, _ = gru_apply(
            params["generation_rnn"], gen_in, context,
            mask=target_mask, dropout=self.dropout, rng=r_gru, train=train,
        )  # (B, Mt, genH * 2)
        z_out = linear_apply(params["generation_linear"], gen_out)  # (B, Mt, z)
        z_flat = z_out.reshape(batch * max_t, self.z_dim)
        logits, samples = self._decode_measures(vae_params, z_flat, rng=r_dec)
        V = logits.shape[-1]
        return (
            logits.reshape(batch, max_t, self.measure_seq_len, V),
            samples.reshape(batch, max_t, self.measure_seq_len),
            z_out,
        )

    def _generate_autoregressive(
        self, params, vae_params, context, target_mask, *, seed, train, rng,
        row_keys=None,
    ):
        """Sampled decode->re-encode loop (latent_rnn.py:241-260) as a
        ``lax.scan`` over target measures, with the FINAL iteration peeled:
        the last measure's re-encode feeds nothing (there is no next step),
        so the peeled tail skips it — one full frozen-encoder pass saved
        per call, exactness unchanged (the reference's loop computes it
        too, latent_rnn.py:260, but its result is equally dead).

        :param row_keys: optional (B, 2) per-row keys (inference only) —
            each step's re-encode rsample draws from a per-(row, step) key
            instead of the batch-level stream, making row outputs
            independent of batch composition (the serving coalescing
            contract; dropout is off and decode is argmax at inference, so
            the re-encode is the scan's only stochastic op)."""
        batch = context.shape[1]
        max_t = target_mask.shape[1]
        step_keys = jax.random.split(rng, max_t)

        def gen_measure(hidden, gen_in, key):
            k_gru, k_dec, k_enc = jax.random.split(key, 3)
            gen_out, hidden = gru_apply(
                params["generation_rnn"], gen_in, hidden,
                dropout=self.dropout, rng=k_gru, train=train,
            )
            z = linear_apply(params["generation_linear"], gen_out[:, 0, :])
            logits, samples = self._decode_measures(vae_params, z, rng=k_dec)
            return hidden, k_enc, (logits, samples, z)

        def step(carry, xs):
            key, step_rk = xs
            hidden, gen_in = carry
            hidden, k_enc, outs = gen_measure(hidden, gen_in, key)
            next_in = self.get_z_seq(
                vae_params, outs[1][:, None, :], train=train, rng=k_enc,
                row_keys=step_rk,
            )
            return (hidden, next_in), outs

        if row_keys is None:
            # dummy xs so both variants share one step fn; get_z_seq's
            # row_keys=None path uses the batch-level k_enc stream
            enc_keys = None
            xs = (step_keys[:-1], None)
        else:
            per_step = jax.vmap(
                lambda k: jax.random.split(k, max_t)
            )(row_keys)  # (B, T, 2)
            enc_keys = jnp.transpose(per_step, (1, 0, 2))  # (T, B, 2)
            xs = (step_keys[:-1], enc_keys[:-1])
        carry0 = (context, seed)
        (hidden, gen_in), (logits, samples, z_out) = lax.scan(
            step, carry0, xs
        )
        _, _, (logits_l, samples_l, z_l) = gen_measure(
            hidden, gen_in, step_keys[-1]
        )
        logits = jnp.concatenate([logits, logits_l[None]], axis=0)
        samples = jnp.concatenate([samples, samples_l[None]], axis=0)
        z_out = jnp.concatenate([z_out, z_l[None]], axis=0)
        # (Mt, B, ...) -> (B, Mt, ...)
        return (
            jnp.transpose(logits, (1, 0, 2, 3)),
            jnp.transpose(samples, (1, 0, 2)),
            jnp.transpose(z_out, (1, 0, 2)),
        )

    # stateful convenience (testers / generation scripts)
    def __call__(self, past_context, future_context, target=None, target_mask=None,
                 train=False, rng=None, past_mask=None, future_mask=None):
        return self.apply(
            self.params,
            self.vae_model.params,
            past_context,
            future_context,
            target,
            past_mask=past_mask,
            future_mask=future_mask,
            target_mask=target_mask,
            train=train,
            rng=rng,
        )


class LatentRNNAblations(LatentRNN):
    """Past-only / future-only conditioning ablation
    (latent_rnn_ablations.py:11-313): one context feeds the generation RNN,
    whose hidden is ``rnn_hidden_size`` (not scaled by layers)."""

    def __init__(self, *args, type: str = "past", **kwargs):
        self.type = type  # read by __repr__ during super().__init__
        super().__init__(*args, **kwargs)
        assert type in ("past", "future")

    def __repr__(self):
        s = (
            f"LatentRNN({self.type}{self.dataset_repr}GRU,{self.num_rnn_layers},"
            f"{self.rnn_hidden_size},{self.dropout},)"
        )
        if self.auto_reg:
            s += "auto_reg"
        s += ",tf" if self.use_teacher_forcing else ",no_tf"
        return s

    @property
    def gen_hidden_size(self) -> int:
        return self.rnn_hidden_size  # latent_rnn_ablations.py:77-85

    def _check_geometry(self):
        pass  # single-context hidden (L*2, B, H) always matches

    def init_params(self, key):
        params = super().init_params(key)
        # generation_linear input = H * num_directions (ablations.py:85)
        k = jax.random.split(key, 6)[5]
        params["generation_linear"] = linear_init(
            k, self.rnn_hidden_size * self.num_directions, self.z_dim
        )
        return params

    def _combine_contexts(self, ctx_p, ctx_f):
        return ctx_p if self.type == "past" else ctx_f
