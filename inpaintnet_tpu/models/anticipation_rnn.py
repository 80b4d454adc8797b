"""AnticipationRNN: constraint-conditioned LSTM baseline.

TPU-first redesign of
``AnticipationRNN/anticipation_rnn_gauss_reg_model.py:42-726``
(Hadjeres-style anticipation/constraint model):

- a *constraint* LSTM stack runs BACKWARDS over embedded metadata plus
  unary-constraint note embeddings (reference ``output_lstm_constraints``,
  :455-475) — here a reversed full-sequence scan;
- a *generation* LSTM stack consumes [prev-note embedding, constraint
  output] per tick. Teacher-forced training is ONE full-sequence pass
  (reference ``_forward_tf``, :348-404); sampled decoding is one
  ``lax.scan`` over all ticks (reference loops in Python with a host sync
  per tick, :190-259/:261-346).

Fixes kept deliberately and documented:
- full-batch decode: the reference writes **batch element 0's argmax** into
  every batch row (:253-256, :339-343) — effectively batch-size-1; here
  every example decodes independently;
- the initial input embedding is the START token embedding (the reference
  embeds literal index 0 at tick -1, :221-226 — an arbitrary token).

The "gaussian regularization" variant differs from the baseline only in the
constraint-mask scheme used by its trainer — the reference defines
``gaussian_regularization`` but never adds it to the loss
(anticipation_rnn_trainer.py:138-152); we mirror that (flag available in
the trainer, default off, matching shipped behaviour).
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
from jax import lax

from inpaintnet_tpu.models.base import Model
from inpaintnet_tpu.ops import (
    embedding_apply,
    embedding_init,
    linear_apply,
    linear_init,
    lstm_stack_apply,
    lstm_stack_init,
)
from inpaintnet_tpu.ops.lstm import lstm_cell_apply
from inpaintnet_tpu.ops.sampling import sample_argmax, sample_categorical


class ConstraintModelGaussianReg(Model):
    def __init__(
        self,
        dataset,
        note_embedding_dim: int = 20,
        metadata_embedding_dim: int = 30,
        num_lstm_constraints_units: int = 256,
        num_lstm_generation_units: int = 256,
        linear_hidden_size: int = 128,
        num_layers: int = 1,
        dropout_input_prob: float = 0.2,
        dropout_prob: float = 0.5,
        unary_constraint: bool = False,
        teacher_forcing: bool = True,
        checkpoint_dir: Optional[str] = None,
    ):
        super().__init__(checkpoint_dir=checkpoint_dir)
        self.dataset = dataset
        self.dataset_repr = repr(dataset)
        self.use_teacher_forcing = teacher_forcing
        self.teacher_forcing_prob = 0.5
        self.num_layers = num_layers
        self.num_units_linear = linear_hidden_size
        self.unary_constraint = unary_constraint
        self.note_embedding_dim = note_embedding_dim
        self.metadata_embedding_dim = metadata_embedding_dim
        self.num_lstm_constraints_units = num_lstm_constraints_units
        self.num_lstm_generation_units = num_lstm_generation_units
        self.dropout_input_prob = dropout_input_prob
        self.dropout_prob = dropout_prob

        self.num_notes = len(dataset.note2index_dicts[0])
        # metadata channels: dataset metadatas + trailing voice-id channel
        self.num_elements_per_metadata: List[int] = [
            md.num_values for md in dataset.metadatas
        ] + [getattr(dataset, "num_voices", 1)]
        self.no_constraint_index = self.num_notes  # extra token (ref :525-532)

    def __repr__(self):
        name = type(self).__name__.replace("ConstraintModelGaussianReg", "AnticipationRNNReg")
        s = (
            f"{name}({self.dataset_repr},{self.note_embedding_dim},"
            f"{self.metadata_embedding_dim},{self.num_lstm_constraints_units},"
            f"{self.num_lstm_generation_units},{self.num_units_linear},"
            f"{self.num_layers},{self.dropout_input_prob},{self.dropout_prob},"
            f"{self.unary_constraint},)"
        )
        s += ",tf" if self.use_teacher_forcing else ",no_tf"
        return s

    # --- params --------------------------------------------------------------- #
    def init_params(self, key):
        keys = jax.random.split(key, 6 + len(self.num_elements_per_metadata))
        uc = 1 if self.unary_constraint else 0
        constraint_in = (
            self.metadata_embedding_dim * len(self.num_elements_per_metadata)
            + self.note_embedding_dim * uc
        )
        c_sizes = [(constraint_in, self.num_lstm_constraints_units)] + [
            (self.num_lstm_constraints_units, self.num_lstm_constraints_units)
        ] * (self.num_layers - 1)
        g_sizes = [
            (
                self.note_embedding_dim + self.num_lstm_constraints_units,
                self.num_lstm_generation_units,
            )
        ] + [
            (self.num_lstm_generation_units, self.num_lstm_generation_units)
        ] * (self.num_layers - 1)
        params = {
            "note_embedding": embedding_init(
                keys[0], self.num_notes + uc, self.note_embedding_dim
            ),
            "lstm_constraint": lstm_stack_init(keys[1], c_sizes),
            "lstm_generation": lstm_stack_init(keys[2], g_sizes),
            "linear_1": linear_init(
                keys[3], self.num_lstm_generation_units, self.num_units_linear
            ),
            "linear_output_notes": linear_init(
                keys[4], self.num_units_linear, self.num_notes
            ),
            "metadata_embeddings": [
                embedding_init(keys[5 + i], n, self.metadata_embedding_dim)
                for i, n in enumerate(self.num_elements_per_metadata)
            ],
        }
        return params

    # --- shared pieces ----------------------------------------------------------- #
    def mask_tensor_score(self, score, constraints_loc):
        """Replace unconstrained ticks with the no-constraint token
        (reference :510-532)."""
        return score * constraints_loc + self.no_constraint_index * (1 - constraints_loc)

    def embed_metadata(self, params, metadata, score=None, constraints_loc=None):
        """(B, T, num_md) -> (B, T, md_dim * num_md [+ note_dim])
        (reference :477-508)."""
        parts = [
            embedding_apply(emb, metadata[:, :, i])
            for i, emb in enumerate(params["metadata_embeddings"])
        ]
        m = jnp.concatenate(parts, axis=-1)
        if score is not None and self.unary_constraint:
            masked = self.mask_tensor_score(score, constraints_loc)
            m = jnp.concatenate(
                [m, embedding_apply(params["note_embedding"], masked)], axis=-1
            )
        return m

    def output_lstm_constraints(self, params, embedded_metadata, *, train,
                                rng, tick_mask=None):
        """Reversed-sequence constraint LSTM (reference :455-475).

        :param tick_mask: optional (B, T) validity mask (1 = real tick;
            padding is a SUFFIX). The reversed scan visits the padded
            suffix FIRST with zero state and HOLDS it there, so each
            row's constraint hiddens at its valid ticks equal the
            unpadded run's exactly — one compilation serves every
            sequence length up to T (mixed-length serving coalescing,
            serve_arnn.ARNNServingEngine)."""
        rev = embedded_metadata[:, ::-1, :]
        rev_mask = None if tick_mask is None else tick_mask[:, ::-1]
        out, _, all_hs = lstm_stack_apply(
            params["lstm_constraint"], rev,
            dropout=self.dropout_prob, rng=rng, train=train, mask=rev_mask,
        )
        return out[:, ::-1, :], all_hs

    def _head(self, params, gen_out):
        h = jax.nn.relu(linear_apply(params["linear_1"], gen_out))
        return linear_apply(params["linear_output_notes"], h)

    def _drop_input(self, x, *, train, rng):
        """Timestep dropout: the reference's Dropout2d on (B, T, E, 1) drops
        whole time slices with p=dropout_input_prob (:437-442)."""
        if not train or self.dropout_input_prob <= 0.0:
            return x
        keep = jax.random.bernoulli(
            rng, 1.0 - self.dropout_input_prob, x.shape[:2] + (1,)
        )
        return jnp.where(keep, x / (1.0 - self.dropout_input_prob), 0.0)

    def _start_embedding(self, params, batch):
        start = self.dataset.note2index_dicts[0].get("START", 0)
        tok = jnp.full((batch,), start, dtype=jnp.int32)
        return embedding_apply(params["note_embedding"], tok)

    # --- forward paths ------------------------------------------------------------- #
    def forward_tf(self, params, score, metadata, constraints_loc, *, train, rng,
                   return_activations: bool = False):
        """Teacher-forced full-sequence pass (reference :348-404).

        :param score: (B, T) int tokens; metadata (B, T, num_md)
        :return: logits (B, T, V) [, (gen_activations, constraint_activations)]
        """
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r_c, r_g, r_in = jax.random.split(rng, 3)
        m = self.embed_metadata(params, metadata, score, constraints_loc)
        constraint_out, c_acts = self.output_lstm_constraints(
            params, m, train=train, rng=r_c
        )
        x = embedding_apply(params["note_embedding"], score)
        offset = jnp.concatenate([jnp.zeros_like(x[:, :1, :]), x[:, :-1, :]], axis=1)
        offset = self._drop_input(offset, train=train, rng=r_in)
        inp = jnp.concatenate([offset, constraint_out], axis=-1)
        gen_out, _, g_acts = lstm_stack_apply(
            params["lstm_generation"], inp,
            dropout=self.dropout_prob, rng=r_g, train=train,
        )
        logits = self._head(params, gen_out)
        if return_activations:
            return logits, (g_acts, c_acts)
        return logits

    def forward_sampled(
        self,
        params,
        score,
        metadata,
        constraints_loc,
        *,
        force_mask=None,
        temperature: Optional[float] = None,
        train: bool = False,
        rng=None,
        row_keys=None,
        tick_mask=None,
    ):
        """Autoregressive decode as ONE scan over ticks (replaces reference
        per-tick Python loops :190-259, :261-346, :570-679).

        :param force_mask: (B, T) 1 where the *input token* at that position
            is forced to ground truth (inpainting contexts). None = never.
        :param tick_mask: optional (B, T) per-row validity mask for
            suffix-padded rows (see :meth:`output_lstm_constraints`).
            Only the REVERSED constraint scan needs it — the generation
            scan runs forward, so a row's valid prefix never depends on
            its padded tail; tail outputs are garbage the serving layer
            trims.
        :param temperature: if set, sample categorically from
            logits * temperature (reference ``generate`` :661-668 multiplies);
            else argmax. A scalar, or a (B,) per-row vector (serving
            coalescing — each row samples at its own temperature).
        :param row_keys: optional (B, 2) uint32 PRNG keys, one per row.
            When given, row ``b``'s sampling stream is derived from
            ``row_keys[b]`` alone — independent of batch position and of
            the other rows (the serving batch-coalescing contract,
            serve_arnn.ARNNServingEngine.inpaint_hetero); ``rng`` is then
            unused for sampling. Inference-only (``train=False``).
        :return: (logits (B, T, V), generated tokens (B, T))
        """
        if row_keys is not None and train:
            raise ValueError("row_keys serves inference only")
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r_c, r_scan = jax.random.split(rng)
        batch, T = score.shape
        m = self.embed_metadata(params, metadata, score, constraints_loc)
        constraint_out, _ = self.output_lstm_constraints(
            params, m, train=train, rng=r_c, tick_mask=tick_mask
        )

        if force_mask is None:
            force_mask = jnp.zeros((batch, T), dtype=jnp.int32)

        if temperature is None and not train and self._use_pallas_decode(params):
            from inpaintnet_tpu.ops.arnn_pallas import arnn_sampled_decode_pallas
            from inpaintnet_tpu.ops.pallas_common import kernel_with_xla_grad

            start_emb = self._start_embedding(params, 1)
            fn = kernel_with_xla_grad(
                lambda p, ctx, sc, fm, se: arnn_sampled_decode_pallas(
                    p, ctx, sc, fm, se
                ),
                lambda p, ctx, sc, fm, se: self._sampled_scan(
                    p, ctx, sc, fm,
                    start_emb=jnp.broadcast_to(se, (sc.shape[0], se.shape[-1])),
                    temperature=None, train=False, rng=jax.random.PRNGKey(0),
                ),
            )
            return fn(params, constraint_out, score, force_mask, start_emb)

        return self._sampled_scan(
            params, constraint_out, score, force_mask,
            start_emb=self._start_embedding(params, batch),
            temperature=temperature, train=train, rng=r_scan,
            row_keys=row_keys,
        )

    def _use_pallas_decode(self, params) -> bool:
        """Fused decode kernel eligibility (ops/arnn_pallas.py): TPU, 2
        generation layers, weights fit VMEM."""
        import os

        if os.environ.get("INPAINTNET_ARNN_IMPL", "pallas") != "pallas":
            return False
        if self.num_layers != 2:
            return False
        if jax.default_backend() != "tpu":
            return False
        H = self.num_lstm_generation_units
        C = self.num_lstm_constraints_units
        w = params["lstm_generation"][0]["w_hh"]

        def pad(x, m):
            return (x + m - 1) // m * m

        tok_pad = pad(params["note_embedding"]["table"].shape[0], 8)
        lin_pad = pad(self.num_units_linear, 128)
        vocab_pad = pad(self.num_notes, 128)
        # everything the kernel pins in VMEM: recurrent + ctx projections,
        # the fused token table, and both head matrices
        weight_bytes = (
            (3 * H + C) * 4 * H + tok_pad * 4 * H + H * lin_pad
            + lin_pad * vocab_pad
        ) * w.dtype.itemsize
        return weight_bytes < 10e6

    def _sampled_scan(self, params, constraint_out, score, force_mask, *,
                      start_emb, temperature, train, rng, row_keys=None):
        """The XLA scan formulation of the autoregressive decode (also the
        autodiff fallback for the Pallas routing above)."""
        batch, T = score.shape
        r_scan = rng
        L = self.num_layers
        H = self.num_lstm_generation_units
        cdt = constraint_out.dtype
        h0 = (jnp.zeros((L, batch, H), cdt), jnp.zeros((L, batch, H), cdt))
        prev0 = start_emb
        if row_keys is None:
            # batch-level stream: one key per tick, shared by all rows
            step_keys = jax.random.split(r_scan, T)
        else:
            # per-row streams: row b's tick keys derive from row_keys[b]
            # alone (raw uint32 threefry key data, same scheme as
            # latent_rnn.get_z_seq) -> (T, B, 2)
            step_keys = jnp.swapaxes(
                jax.vmap(lambda k: jax.random.split(k, T))(row_keys), 0, 1
            )
        if temperature is not None:
            # scalar, or (B,) per-row vector -> column for (B, V) logits
            temp = jnp.asarray(temperature)
            temp = temp[:, None] if temp.ndim else temp

        gen_params = params["lstm_generation"]

        def step(carry, xs_t):
            (h, c), prev_emb = carry
            ctx_t, gt_t, fm_t, key = xs_t
            x = jnp.concatenate([prev_emb, ctx_t], axis=-1)
            new_h, new_c = [], []
            inp = x
            for layer in range(L):
                h_l, c_l = lstm_cell_apply(gen_params[layer], (h[layer], c[layer]), inp)
                new_h.append(h_l)
                new_c.append(c_l)
                inp = h_l
            out = inp
            logits = self._head(params, out)
            if temperature is not None and row_keys is not None:
                sampled = jax.vmap(sample_categorical)(key, logits * temp)
            elif temperature is not None:
                sampled = sample_categorical(key, logits * temp)
            else:
                sampled = sample_argmax(logits)
            token = jnp.where(fm_t > 0, gt_t, sampled)
            next_emb = embedding_apply(params["note_embedding"], token)
            return ((jnp.stack(new_h), jnp.stack(new_c)), next_emb), (logits, token)

        xs = (
            jnp.swapaxes(constraint_out, 0, 1),
            jnp.swapaxes(score, 0, 1),
            jnp.swapaxes(force_mask, 0, 1),
            step_keys,
        )
        _, (logits, tokens) = lax.scan(step, (h0, prev0), xs)
        return jnp.swapaxes(logits, 0, 1), jnp.swapaxes(tokens, 0, 1)

    def apply(self, params, score, metadata, constraints_loc, *, train=True, rng=None):
        """Training forward with the per-batch TF coin flip (reference
        :406-435). Returns full-length logits; trainers mask to
        unconstrained ticks."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r_flip, r_fwd = jax.random.split(rng)
        if not (self.use_teacher_forcing and train):
            return self.forward_sampled(
                params, score, metadata, constraints_loc, train=train, rng=r_fwd
            )[0]
        coin = jax.random.bernoulli(r_flip, self.teacher_forcing_prob)
        return lax.cond(
            coin,
            lambda: self.forward_tf(
                params, score, metadata, constraints_loc, train=train, rng=r_fwd
            ),
            lambda: self.forward_sampled(
                params, score, metadata, constraints_loc, train=train, rng=r_fwd
            )[0],
        )

    def apply_inpaint(
        self, params, score, metadata, constraints_loc, *, train=False,
        rng=None, tick_mask=None,
    ):
        """Inpainting decode (reference ``forward_inpaint`` :261-346): ticks
        where ``constraints_loc == 1`` feed ground truth; the masked span is
        generated autoregressively. Burn-in over the past is subsumed by the
        same scan.

        :param tick_mask: optional (B, T) per-row validity mask for
            suffix-padded rows (see :meth:`forward_sampled`)
        :return: (logits (B, T, V), gen tokens (B, T))
        """
        return self.forward_sampled(
            params, score, metadata, constraints_loc,
            force_mask=constraints_loc, train=train, rng=rng,
            tick_mask=tick_mask,
        )

    def generate(
        self, params, score, metadata, constraints_loc, *, temperature=1.0,
        rng=None, row_keys=None, tick_mask=None,
    ):
        """Temperature sampling over the full sequence (reference
        ``generate`` :570-679; constraints flow through the unary-constraint
        channel, context ticks are forced like ``forward_inpaint``).

        ``temperature`` may be a (B,) per-row vector, ``row_keys`` a
        (B, 2) per-row key array, and ``tick_mask`` a (B, T) per-row
        validity mask (see :meth:`forward_sampled`) — the serving
        layer's coalescing contract."""
        logits, tokens = self.forward_sampled(
            params, score, metadata, constraints_loc,
            force_mask=constraints_loc, temperature=temperature,
            train=False, rng=rng, row_keys=row_keys, tick_mask=tick_mask,
        )
        return logits, tokens

    def __call__(self, score, metadata, constraints_loc, train=False, rng=None):
        return self.apply(
            self.params, score, metadata, constraints_loc, train=train, rng=rng
        )


class AnticipationRNNBaseline(ConstraintModelGaussianReg):
    """Identical model; differs only in identity string and the trainer's
    constraint-mask scheme (reference :682-726)."""

    def __repr__(self):
        s = (
            f"AnticipationRNNBaseline({self.dataset_repr},{self.note_embedding_dim},"
            f"{self.metadata_embedding_dim},{self.num_lstm_constraints_units},"
            f"{self.num_lstm_generation_units},{self.num_units_linear},"
            f"{self.num_layers},{self.dropout_input_prob},{self.dropout_prob},"
            f"{self.unary_constraint},)"
        )
        s += ",tf" if self.use_teacher_forcing else ",no_tf"
        return s
