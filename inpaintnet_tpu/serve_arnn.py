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
- there is no padding mask: the constraint LSTM runs backwards over ALL
  ticks, so sequences cannot be padded to a fixed bar count without
  changing the result. Programs therefore compile per (bucket,
  measure-count) pair; serve fixed-length windows for one compilation.

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
from inpaintnet_tpu.serve import pick_bucket, token_wire_dtype

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
    ):
        """:param model: a trained ``AnticipationRNNBaseline`` /
        ``ConstraintModelGaussianReg`` (its ``dataset`` provides the
        metadata channel definitions)
        :param dtype: serving numeric — "float32" or "bfloat16"; the
        fused Pallas decode kernel routes by its own gates (ops/arnn_pallas)
        :param max_measures: cap on request sequence length. Programs
        compile per measure-count (no padding mask — module docstring), so
        the cap bounds how large a scan a request can force the engine to
        compile (and how many programs accumulate).
        """
        self.model = model
        self.msl = measure_seq_len
        self.max_measures = max_measures
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
        the argmax-vs-sampled switch is structural — the temperature
        VALUE is a traced scalar, so one sampled program serves every
        temperature (a per-value compile would let clients force
        unbounded recompiles)."""
        model = self.model
        msl = self.msl

        def core(params, score, metadata, starts, nums, key, temp):
            wire_dtype = score.dtype
            score = score.astype(jnp.int32)
            b, total = score.shape
            md = jnp.broadcast_to(metadata[None], (b,) + metadata.shape)
            tick = jnp.arange(total)
            loc = ((tick[None, :] < (starts * msl)[:, None])
                   | (tick[None, :] >= ((starts + nums) * msl)[:, None])
                   ).astype(jnp.int32)
            if not sampled:
                logits, tokens = model.apply_inpaint(
                    params, score, md, loc, train=False, rng=key
                )
            else:
                logits, tokens = model.generate(
                    params, score, md, loc, temperature=temp, rng=key,
                )
            # compact wire dtype on the way back too (halves the
            # device->host transfer; vocab < 2**15 whenever int16 in)
            return tokens.astype(wire_dtype)

        return core

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
        """Pre-compile the serving programs per bucket for one sequence
        length (``measures`` bars — programs are per-length, see module
        docstring); covers the argmax inpaint and (unless
        ``sampled=False``) the temperature-sampling program."""
        for bucket in (buckets if buckets is not None else self.batch_buckets):
            tokens = np.zeros((bucket, measures, self.msl), np.int32)
            self.inpaint(tokens, start_measure=1, num_measures=1)
            if sampled:
                self.inpaint(tokens, start_measure=1, num_measures=1,
                             seed=0, temperature=1.0)

    # ------------------------------------------------------------------ #
    def inpaint_hetero(self, requests: Sequence[dict],
                       bucket: Optional[int] = None) -> list:
        """Several independent ARGMAX inpaint requests in ONE device call
        (the dynamic-batching primitive — server.py). The argmax decode
        has no randomness and the constraint mask is per-row, so packing
        requests is bit-exact vs their solo runs AT A GIVEN BUCKET (pin
        one via ``bucket`` for bit-identity across load levels —
        different buckets are different XLA executables); the one
        constraint is a shared measure count (no padding mask — module
        docstring), which the server's batcher groups by.

        :param requests: dicts with ``tokens`` (b, M, msl),
            ``start_measure``, ``num_measures`` — all sharing M;
            ``temperature`` requests are not coalescable (batch-level
            sampling keys) and must go through :meth:`inpaint`
        :return: list of per-request outputs
        """
        if not requests:
            return []
        ms = {np.asarray(r["tokens"]).shape[1] for r in requests}
        if len(ms) != 1:
            raise ValueError(
                f"coalesced ARNN requests must share a measure count; "
                f"got {sorted(ms)}"
            )
        toks = [np.asarray(r["tokens"]) for r in requests]
        sizes = [t.shape[0] for t in toks]
        starts = np.concatenate([
            np.full((n,), r["start_measure"], np.int64)
            for n, r in zip(sizes, requests)
        ])
        nums = np.concatenate([
            np.full((n,), r["num_measures"], np.int64)
            for n, r in zip(sizes, requests)
        ])
        out = self.inpaint(np.concatenate(toks), starts, nums,
                           bucket=bucket)
        outs = []
        lo = 0
        for n in sizes:
            outs.append(out[lo:lo + n])
            lo += n
        return outs

    def inpaint(
        self,
        tokens: np.ndarray,
        start_measure,
        num_measures,
        seed: Optional[int] = None,
        temperature: Optional[float] = None,
        bucket: Optional[int] = None,
    ) -> np.ndarray:
        """Regenerate ``num_measures`` measures from ``start_measure``.

        ``bucket`` pins the dispatch bucket (see
        serve.InpaintingEngine.inpaint_hetero — different buckets are
        different XLA executables, so bit-identity across load levels
        needs a pinned one; the server's ``pin_bucket`` passes through).

        :param tokens: (B, M, msl) int tokens (all B rows share M; there
            is no padding mask — see module docstring)
        :param start_measure/num_measures: ints, or per-row sequences for
            heterogeneous spans in one batch (the constraint mask is
            per-row)
        :param temperature: None = the reference ``forward_inpaint``
            argmax decode (deterministic — ``seed`` unused); a float =
            the reference ``generate`` multinomial sampling at that
            temperature (the tester uses 1.5), seeded by ``seed``
        :return: (B, M, msl) tokens with each row's span replaced
        """
        tokens = np.asarray(tokens)
        b, m, msl = tokens.shape
        assert msl == self.msl, (msl, self.msl)
        assert m <= self.max_measures, (
            f"{m} measures exceed max_measures={self.max_measures} "
            "(programs compile per sequence length)"
        )
        vocab = self.model.num_notes
        assert tokens.size == 0 or (
            tokens.min() >= 0 and tokens.max() < vocab
        ), f"token values must lie in [0, {vocab})"
        starts = np.broadcast_to(np.asarray(start_measure, np.int64), (b,))
        nums = np.broadcast_to(np.asarray(num_measures, np.int64), (b,))
        assert ((1 <= nums) & (starts >= 1)
                & (starts + nums <= m)).all(), \
            "need >= 1 past measure, >= 0 future, 1 <= span <= m - start"
        if b > self.batch_buckets[-1]:
            out = [
                self.inpaint(tokens[lo:lo + self.batch_buckets[-1]],
                             starts[lo:lo + self.batch_buckets[-1]],
                             nums[lo:lo + self.batch_buckets[-1]],
                             seed=seed, temperature=temperature,
                             bucket=bucket)
                for lo in range(0, b, self.batch_buckets[-1])
            ]
            return np.concatenate(out)
        bucket, fn = self._compiled_for(b, m, temperature is not None,
                                        bucket)
        total = m * msl
        score = np.zeros((bucket, total), token_wire_dtype(vocab))
        score[:b] = tokens.reshape(b, total)
        starts_w = np.ones((bucket,), np.int32)
        nums_w = np.ones((bucket,), np.int32)
        starts_w[:b] = starts
        nums_w[:b] = nums
        key = jax.random.PRNGKey(self.seed if seed is None else seed)
        temp = np.float32(1.0 if temperature is None else temperature)
        gen = np.asarray(fn(self._params, score, self._metadata(total),
                            starts_w, nums_w, key, temp))
        # host-side copy of the span mask for the scatter (fetching the
        # device-built loc would be a (bucket, T) download per call)
        tick = np.arange(total)
        span = ((tick[None, :] >= (starts * msl)[:, None])
                & (tick[None, :] < ((starts + nums) * msl)[:, None]))
        out = tokens.reshape(b, total).copy()
        out[span] = gen[:b][span]
        return out.reshape(b, m, msl)
