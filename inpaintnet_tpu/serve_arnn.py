"""Batched serving engine for the AnticipationRNN model family.

The reference's second inpainting family (`AnticipationRNNBaseline` /
`ConstraintModelGaussianReg`) inpaints by constraint masking: ticks where
``constraints_loc == 1`` are forced to the ground truth, the masked span
decodes autoregressively (reference anticipation_rnn_gauss_reg_model.py
``forward_inpaint`` :261-346 — which decodes batch element 0 only with a
host sync per tick; our ``apply_inpaint`` scan decodes the whole batch
on-device, through the fused LSTM kernel on TPU).

Serving properties that differ from the LatentRNN engine (serve.py):

- the inpaint decode is **argmax — fully deterministic**, so requests are
  row-independent with no PRNG machinery at all, and per-row constraint
  masks give heterogeneous spans in one batch for free;
- the model consumes metadata channels (beat marker / tick position /
  voice id). They are position-deterministic, so the engine synthesizes
  them from the model's own dataset ``metadatas`` via
  ``Metadata.generate(length)`` — clients send tokens only;
- sequences pad to MEASURE BUCKETS with a per-row tick validity mask
  (round 4): the constraint LSTM runs backwards over all ticks, so naive
  padding would change the result — instead the mask HOLDS the scan's
  zero state across each row's padded suffix (the reversed scan meets
  the padding FIRST), making a padded row's constraint hiddens at its
  valid ticks exactly the unpadded run's (ops/lstm.py mask semantics;
  the generation scan runs forward, so its valid prefix never sees the
  tail). Programs compile per (row bucket, measure bucket, decode kind)
  — mixed-length requests coalesce within a measure bucket.

    engine = ARNNServingEngine(arnn_model, dtype="bfloat16")
    out = engine.inpaint(tokens_b_m_24, start_measure=8, num_measures=2)

Reference parity: `tests/test_reference_parity.py` pins apply_inpaint's
burn-in equivalence against the actual reference module; this engine is
the batched front end over that path.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from inpaintnet_tpu.models.base import cast_pytree
from inpaintnet_tpu.serve import derive_row_keys, pick_bucket, token_wire_dtype

__all__ = ["ARNNServingEngine"]


class ARNNServingEngine:
    def __init__(
        self,
        model,
        batch_buckets: Sequence[int] = (1, 8, 64, 512),
        dtype: Optional[str] = "bfloat16",
        measure_seq_len: int = 24,
        max_measures: int = 16,
        seed: int = 0,
        measure_buckets: Optional[Sequence[int]] = None,
    ):
        """:param model: a trained ``AnticipationRNNBaseline`` /
        ``ConstraintModelGaussianReg`` (its ``dataset`` provides the
        metadata channel definitions)
        :param dtype: serving numeric — "float32" or "bfloat16"; the
        fused Pallas decode kernel routes by its own gates (ops/arnn_pallas)
        :param max_measures: cap on request sequence length — bounds how
        large a scan a request can force the engine to compile (and how
        many programs accumulate)
        :param measure_buckets: sequence-length buckets requests pad to
        (per-row tick masks keep padding exact — module docstring);
        default {4, 8, 12} intersected below ``max_measures``, plus
        ``max_measures``. Padding trades a little tail compute for
        cross-length request coalescing and a bounded program count.
        """
        self.model = model
        self.msl = measure_seq_len
        self.max_measures = max_measures
        if measure_buckets is None:
            measure_buckets = sorted(
                {m for m in (4, 8, 12) if m < max_measures} | {max_measures}
            )
        assert max(measure_buckets) == max_measures, (
            "largest measure bucket must equal max_measures"
        )
        self.measure_buckets = sorted(measure_buckets)
        self.batch_buckets = sorted(batch_buckets)
        self.seed = seed
        params = model.params
        if dtype and dtype != "float32":
            params = cast_pytree(params, jnp.dtype(dtype))
        self._params = params
        self._compiled: Dict[object, object] = {}
        self._md_cache: Dict[int, np.ndarray] = {}

    # ------------------------------------------------------------------ #
    def _metadata(self, total_ticks: int):
        """(T, C) metadata channels synthesized by position (the same
        ``metadatas`` + voice-id layout the dataset tensors use —
        data/metadata.py metadata_tensor), device-resident: metadata is
        row-invariant, so it is uploaded ONCE per sequence length and
        broadcast on device (shipping a (B, T, C) copy per request costs
        more than the decode through the tunnel)."""
        if total_ticks not in self._md_cache:
            mds = self.model.dataset.metadatas
            channels = [md.generate(total_ticks) for md in mds]
            channels.append(np.zeros((total_ticks,), dtype=np.int64))
            self._md_cache[total_ticks] = jax.device_put(
                np.stack(channels, axis=1).astype(np.int32)
            )
        return self._md_cache[total_ticks]

    def _fn(self, sampled: bool):
        """The compiled core takes compact wire inputs: int16 tokens and
        per-row (start, num) measure spans; the (B, T) constraint mask
        and the (B, T, C) metadata broadcast are built on device. Only
        the argmax-vs-sampled switch is structural — temperatures arrive
        as a traced (B,) VECTOR and sampling keys as (B, 2) per-row key
        data, so one sampled program serves every temperature/seed mix
        (per-value compiles would let clients force unbounded recompiles)
        and every row's stream depends on its own key alone — the
        coalescing contract (:meth:`inpaint_hetero`)."""
        model = self.model
        msl = self.msl

        def core(params, score, metadata, starts, nums, lengths, row_keys,
                 temps):
            wire_dtype = score.dtype
            score = score.astype(jnp.int32)
            b, total = score.shape
            md = jnp.broadcast_to(metadata[None], (b,) + metadata.shape)
            tick = jnp.arange(total)
            loc = ((tick[None, :] < (starts * msl)[:, None])
                   | (tick[None, :] >= ((starts + nums) * msl)[:, None])
                   ).astype(jnp.int32)
            # per-row true length in measures -> tick validity mask (rows
            # shorter than the measure bucket are suffix-padded; the
            # masked constraint scan makes padded == unpadded exactly)
            tick_mask = (
                tick[None, :] < (lengths * msl)[:, None]
            ).astype(jnp.int32)
            if not sampled:
                # argmax — deterministic; keys/temps unused
                logits, tokens = model.apply_inpaint(
                    params, score, md, loc, train=False,
                    rng=jax.random.PRNGKey(0), tick_mask=tick_mask,
                )
            else:
                logits, tokens = model.generate(
                    params, score, md, loc, temperature=temps,
                    row_keys=row_keys, tick_mask=tick_mask,
                )
            # compact wire dtype on the way back too (halves the
            # device->host transfer; vocab < 2**15 whenever int16 in)
            return tokens.astype(wire_dtype)

        return core

    def length_bucket(self, measures: int) -> int:
        """Smallest measure bucket that fits ``measures`` (requests pad
        to it; the server's batcher groups by this)."""
        assert measures <= self.max_measures, (measures, self.max_measures)
        return pick_bucket(self.measure_buckets, measures)

    def _compiled_for(self, rows: int, measures: int, sampled: bool,
                      bucket: Optional[int] = None):
        if bucket is None:
            bucket = pick_bucket(self.batch_buckets, rows)
        key = (bucket, measures, sampled)
        if key not in self._compiled:
            self._compiled[key] = jax.jit(self._fn(sampled))
        return bucket, self._compiled[key]

    def warmup(self, measures: int,
               buckets: Optional[Sequence[int]] = None,
               sampled: bool = True) -> None:
        """Pre-compile the serving programs per row bucket for one
        measure bucket (the one ``measures`` bars pad to — programs are
        per (row bucket, measure bucket, kind), see module docstring);
        covers the argmax inpaint and (unless ``sampled=False``) the
        temperature-sampling program."""
        for bucket in (buckets if buckets is not None else self.batch_buckets):
            tokens = np.zeros((bucket, measures, self.msl), np.int32)
            self.inpaint(tokens, start_measure=1, num_measures=1)
            if sampled:
                self.inpaint(tokens, start_measure=1, num_measures=1,
                             seed=0, temperature=1.0)

    # ------------------------------------------------------------------ #
    def inpaint_hetero(self, requests: Sequence[dict],
                       bucket: Optional[int] = None) -> list:
        """Several independent inpaint requests in ONE device call (the
        dynamic-batching primitive — server.py). The constraint mask,
        sampling temperature, PRNG keys, and tick validity masks are all
        per-row, so packing requests is bit-exact vs their solo runs AT A
        GIVEN (row bucket, measure bucket) (pin the row bucket via
        ``bucket`` for bit-identity across load levels — different
        buckets are different XLA executables). Requests with DIFFERENT
        measure counts coalesce within a measure bucket (shorter rows
        suffix-pad with exact tick masks — module docstring); the one
        grouping constraint left, which the server's batcher groups by
        alongside the measure bucket, is a shared decode kind — argmax
        and sampled are different programs.

        :param requests: dicts with ``tokens`` (b, M, msl),
            ``start_measure``, ``num_measures`` — M may differ across
            requests within one measure bucket — plus optional
            ``temperature`` (ALL requests argmax, or ALL sampled) and
            ``seed`` (sampled; row keys derive from (request seed,
            row-within-request), so a request's output never depends on
            its co-travellers)
        :return: list of per-request outputs
        """
        if not requests:
            return []
        ms = [np.asarray(r["tokens"]).shape[1] for r in requests]
        mbs = {self.length_bucket(m) for m in ms}
        if len(mbs) != 1:
            raise ValueError(
                f"coalesced ARNN requests must share a measure bucket "
                f"({self.measure_buckets}); got lengths {sorted(set(ms))} "
                f"spanning buckets {sorted(mbs)}"
            )
        mb = mbs.pop()
        kinds = {r.get("temperature") is None for r in requests}
        if len(kinds) != 1:
            raise ValueError(
                "coalesced ARNN requests must share a decode kind "
                "(all argmax or all sampled — different programs)"
            )
        toks = [np.asarray(r["tokens"]) for r in requests]
        # suffix-pad every request to the shared measure bucket; per-row
        # lengths keep the padded decode exact
        toks = [
            t if t.shape[1] == mb else np.concatenate([
                t, np.zeros((t.shape[0], mb - t.shape[1], t.shape[2]),
                            t.dtype)
            ], axis=1)
            for t in toks
        ]
        sizes = [t.shape[0] for t in toks]
        lengths = np.concatenate([
            np.full((n,), m, np.int64) for n, m in zip(sizes, ms)
        ])
        starts = np.concatenate([
            np.full((n,), r["start_measure"], np.int64)
            for n, r in zip(sizes, requests)
        ])
        nums = np.concatenate([
            np.full((n,), r["num_measures"], np.int64)
            for n, r in zip(sizes, requests)
        ])
        sampled = not kinds.pop()
        temperature = None
        row_keys = None
        if sampled:
            temperature = np.concatenate([
                np.full((n,), r["temperature"], np.float32)
                for n, r in zip(sizes, requests)
            ])
            row_keys = np.concatenate([
                derive_row_keys(
                    self.seed if r.get("seed") is None else r["seed"], n
                )
                for n, r in zip(sizes, requests)
            ])
        out = self.inpaint(np.concatenate(toks), starts, nums,
                           temperature=temperature, bucket=bucket,
                           row_keys=row_keys, lengths=lengths)
        outs = []
        lo = 0
        for n, m in zip(sizes, ms):
            outs.append(out[lo:lo + n, :m])
            lo += n
        return outs

    def inpaint(
        self,
        tokens: np.ndarray,
        start_measure,
        num_measures,
        seed: Optional[int] = None,
        temperature=None,
        bucket: Optional[int] = None,
        row_keys: Optional[np.ndarray] = None,
        lengths: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Regenerate ``num_measures`` measures from ``start_measure``.

        ``bucket`` pins the dispatch bucket (see
        serve.InpaintingEngine.inpaint_hetero — different buckets are
        different XLA executables, so bit-identity across load levels
        needs a pinned one; the server's ``pin_bucket`` passes through).

        :param tokens: (B, M, msl) int tokens. M pads up to the next
            measure bucket with per-row tick masks (exact — module
            docstring), so one compilation serves every length in the
            bucket; the response keeps the input's M.
        :param start_measure/num_measures: ints, or per-row sequences for
            heterogeneous spans in one batch (the constraint mask is
            per-row)
        :param lengths: advanced — per-row TRUE measure counts (B,) for
            rows the hetero path already suffix-padded to a shared M
            (zeros beyond a row's length; spans must fit inside it)
        :param temperature: None = the reference ``forward_inpaint``
            argmax decode (deterministic — ``seed`` unused); a float or
            per-row (B,) vector = the reference ``generate`` multinomial
            sampling at that temperature (the tester uses 1.5). Row
            ``b``'s stream derives HOST-side from ``(seed, b)``
            (serve.derive_row_keys) — independent of batch position and
            of the other rows, so sampled requests coalesce bit-exactly
            (:meth:`inpaint_hetero`)
        :param row_keys: advanced — precomputed (B, 2) uint32 per-row
            keys (the hetero path passes per-request-derived ones);
            overrides ``seed``
        :return: (B, M, msl) tokens with each row's span replaced
        """
        tokens = np.asarray(tokens)
        b, m, msl = tokens.shape
        assert msl == self.msl, (msl, self.msl)
        assert m <= self.max_measures, (
            f"{m} measures exceed max_measures={self.max_measures} "
            "(the cap bounds how large a scan a request can compile)"
        )
        vocab = self.model.num_notes
        assert tokens.size == 0 or (
            tokens.min() >= 0 and tokens.max() < vocab
        ), f"token values must lie in [0, {vocab})"
        lens = np.broadcast_to(
            np.asarray(m if lengths is None else lengths, np.int64), (b,)
        )
        assert (lens <= m).all() and (lens >= 1).all(), (lens, m)
        starts = np.broadcast_to(np.asarray(start_measure, np.int64), (b,))
        nums = np.broadcast_to(np.asarray(num_measures, np.int64), (b,))
        assert ((1 <= nums) & (starts >= 1)
                & (starts + nums <= lens)).all(), \
            "need >= 1 past measure, >= 0 future, span inside the row length"
        # pad to the measure bucket: per-row tick masks make padded rows
        # decode exactly as their unpadded selves (module docstring)
        mb = self.length_bucket(m)
        if mb > m:
            tokens = np.concatenate([
                tokens, np.zeros((b, mb - m, msl), tokens.dtype)
            ], axis=1)
        sampled = temperature is not None
        if row_keys is None and sampled:
            # per-row streams from (seed, row) — the solo path derives
            # the SAME keys the hetero path would for a lone request, so
            # solo == coalesced bit-exactly at a given bucket
            row_keys = derive_row_keys(
                self.seed if seed is None else seed, b
            )
        temps = (np.broadcast_to(
            np.asarray(1.0 if temperature is None else temperature,
                       np.float32), (b,)
        ) if not sampled or np.ndim(temperature) == 0
            else np.asarray(temperature, np.float32))
        assert temps.shape == (b,), (temps.shape, b)
        if b > self.batch_buckets[-1]:
            cb = self.batch_buckets[-1]
            out = [
                self.inpaint(tokens[lo:lo + cb],
                             starts[lo:lo + cb],
                             nums[lo:lo + cb],
                             temperature=(temps[lo:lo + cb] if sampled
                                          else None),
                             bucket=bucket,
                             row_keys=(row_keys[lo:lo + cb] if sampled
                                       else None),
                             lengths=lens[lo:lo + cb])
                for lo in range(0, b, cb)
            ]
            return np.concatenate(out)[:, :m]
        bucket, fn = self._compiled_for(b, mb, sampled, bucket)
        total = mb * msl
        score = np.zeros((bucket, total), token_wire_dtype(vocab))
        score[:b] = tokens.reshape(b, total)
        starts_w = np.ones((bucket,), np.int32)
        nums_w = np.ones((bucket,), np.int32)
        lens_w = np.full((bucket,), 2, np.int32)
        starts_w[:b] = starts
        nums_w[:b] = nums
        lens_w[:b] = lens
        keys_w = np.zeros((bucket, 2), np.uint32)
        temps_w = np.ones((bucket,), np.float32)
        if sampled:
            keys_w[:b] = row_keys
        temps_w[:b] = temps
        gen = np.asarray(fn(self._params, score, self._metadata(total),
                            starts_w, nums_w, lens_w, keys_w, temps_w))
        # host-side copy of the span mask for the scatter (fetching the
        # device-built loc would be a (bucket, T) download per call)
        tick = np.arange(total)
        span = ((tick[None, :] >= (starts * msl)[:, None])
                & (tick[None, :] < ((starts + nums) * msl)[:, None]))
        out = tokens.reshape(b, total).copy()
        out[span] = gen[:b][span]
        return out.reshape(b, mb, msl)[:, :m]
