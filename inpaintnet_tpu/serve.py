"""Batched inpainting serving engine.

The reference's "serve path" is an eager per-melody script loop
(script_gen_diff_models.py:249-257) with a fresh torch forward per tune.
This module is the production-facing equivalent: ONE compiled fixed-shape
program per batch bucket, request padding into the static
(n_bars, max_target) layout, optional bf16 serving params, and micro-batch
bucketing so p50 latency stays flat from 1 to thousands of concurrent
requests.

    engine = InpaintingEngine(latent_rnn_model)
    out = engine.inpaint(tokens_b_m_24, start_measure=8, num_measures=2)
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from inpaintnet_tpu.models.base import cast_pytree

def pick_bucket(buckets: Sequence[int], rows: int) -> int:
    """Smallest bucket that fits ``rows`` (largest one otherwise) — the
    single copy of the bucketing rule both serving engines use."""
    return next((b for b in buckets if b >= rows), buckets[-1])


def token_wire_dtype(vocab: int):
    """Compact host<->device wire dtype for token arrays (int16 halves
    tunnel transfer whenever the vocabulary allows; single copy of the
    rule — callers must have validated values in [0, vocab))."""
    return np.int16 if vocab < 2**15 else np.int32


_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (full-avalanche 64-bit hash)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _M64
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M64
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M64
    return x ^ (x >> np.uint64(31))


def derive_row_keys(seed: int, n: int) -> np.ndarray:
    """Per-row PRNG keys for :meth:`InpaintingEngine.inpaint_hetero`,
    derived HOST-side: a ``jax.random.fold_in`` per request would be a
    separate tiny device dispatch whose tunnel round-trip costs more than
    the whole coalesced device step (docs/PERFORMANCE.md landmine #2).
    Double splitmix64 hash of (request seed, row index) -> (n, 2) uint32,
    consumed by ``jax.random.normal`` as raw threefry key data. Depends
    only on (seed, row-within-request) — the coalescing-independence
    contract."""
    with np.errstate(over="ignore"):
        s = np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
        base = _splitmix64(np.full(n, s, np.uint64))
        j = np.arange(n, dtype=np.uint64)
        h = _splitmix64(
            base ^ ((j * np.uint64(0xD2B74407B1CE6E93) + np.uint64(1)) & _M64)
        )
    return np.stack(
        [(h >> np.uint64(32)).astype(np.uint32),
         (h & np.uint64(0xFFFFFFFF)).astype(np.uint32)],
        axis=1,
    )


class InpaintingEngine:
    def __init__(
        self,
        model,
        batch_buckets: Sequence[int] = (1, 8, 64, 512),
        dtype: Optional[str] = "bfloat16",
        n_bars: int = 16,
        seed: int = 0,
        mesh=None,
    ):
        """:param dtype: serving numeric — "float32", "bfloat16" (default),
        or "int8" (bf16 master params + the quantized kernel route;
        measured quality-neutral on trained weights, docs/PERFORMANCE.md
        "int8 serving").
        :param mesh: optional ``jax.sharding.Mesh`` — requests are sharded
        over its "data" axis (params replicated) via ``jax.shard_map``,
        scaling serving throughput across chips. shard_map (not GSPMD
        auto-partitioning) is load-bearing: the fused Pallas kernels lower
        to custom calls XLA cannot partition, so each device must run the
        whole program on its local shard — which shard_map does.
        Generation is row-independent, so a sharded batch produces EXACTLY
        the single-device tokens (tested). Buckets must divide the data
        axis."""
        self.model = model
        self.n_bars = n_bars
        self.max_target = model.max_target
        self.msl = model.measure_seq_len
        self.batch_buckets = sorted(batch_buckets)
        self.seed = seed
        self.mesh = mesh
        # int8 quantizes inside the kernels from bf16 masters. PIN the
        # mode for every dtype (not just int8): deferring to the ambient
        # INPAINTNET_SERVE_QUANT env would let a leftover export silently
        # flip an explicitly-bf16 engine to the quantized route
        self._quant = "int8" if dtype == "int8" else "none"
        if dtype == "int8":
            dtype = "bfloat16"
        params = model.params
        vae_params = model.vae_model.params
        if dtype and dtype != "float32":
            params = cast_pytree(params, jnp.dtype(dtype))
            vae_params = cast_pytree(vae_params, jnp.dtype(dtype))
        if mesh is not None:
            from inpaintnet_tpu.parallel.mesh import replicate

            dp = mesh.shape["data"]
            bad = [bk for bk in self.batch_buckets if bk % dp]
            if bad:
                raise ValueError(
                    f"batch buckets {bad} do not divide the mesh 'data' "
                    f"axis ({dp}); shard_map requires every bucket to "
                    f"split evenly across data-parallel devices"
                )
            params = replicate(mesh, params)
            vae_params = replicate(mesh, vae_params)
        self._params = params
        self._vae_params = vae_params
        self._compiled: Dict[int, object] = {}

    def _seed_key(self, seed) -> jax.Array:
        """Resolve a request ``seed`` (int, None => engine default, or an
        already-derived PRNGKey from the chunking path) to a PRNGKey."""
        base = self.seed if seed is None else seed
        if isinstance(base, (int, np.integer)):
            return jax.random.PRNGKey(base)
        return base

    def _run_chunked(self, call, b: int, seed):
        """Split an oversized batch at the largest bucket; single source
        of truth for inpaint/inpaint_variations. Chunk keys are derived
        via fold_in (NOT integer arithmetic on the seed, which could
        collide with another request's plain seed)."""
        mb = self.batch_buckets[-1]
        base_key = self._seed_key(seed)
        return [
            call(lo, min(lo + mb, b),
                 jax.random.fold_in(base_key, lo // mb))
            for lo in range(0, b, mb)
        ]

    def _place_batch(self, arrays):
        """Shard request arrays over the mesh's data axis (no-op meshless)."""
        if self.mesh is None:
            return arrays
        from inpaintnet_tpu.parallel.mesh import shard_batch

        return shard_batch(self.mesh, arrays)

    # ------------------------------------------------------------------ #
    def _shard_mapped(self, core, n_batch_args: int):
        """Wrap ``core(params, vae_params, *batch_args, key)`` in
        ``jax.shard_map`` over the mesh's "data" axis. Each device runs
        the WHOLE program (including the Pallas kernels, which lower to
        custom calls GSPMD cannot partition) on its local rows; the rng
        key is decorrelated per shard via fold_in(axis_index)."""
        import jax as _jax
        from jax.sharding import PartitionSpec as P

        mesh = self.mesh

        def per_shard(params, vae_params, *rest):
            *batch_args, key = rest
            key = _jax.random.fold_in(key, _jax.lax.axis_index("data"))
            return core(params, vae_params, *batch_args, key)

        return _jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P()) + (P("data"),) * n_batch_args + (P(),),
            out_specs=P("data"),
            check_vma=False,
        )

    def _fn(self):
        from inpaintnet_tpu.ops.quantize import serving_quant

        model = self.model
        quant = self._quant

        def core(params, vae_params, past, pm, future, fm, tm, key):
            # compact wire dtypes in/out (same scheme as _fn_hetero:
            # int16 tokens, uint8 masks — measured ~20% off the full-
            # bucket call through the tunnel); widen on device.
            # the serving_quant scope is active while jit TRACES this
            # body, which is when the model's kernel gates read the mode
            wire_dtype = past.dtype
            past = past.astype(jnp.int32)
            future = future.astype(jnp.int32)
            pm, fm, tm = (m.astype(jnp.float32) for m in (pm, fm, tm))
            with serving_quant(quant):
                _, samples, _ = model.apply(
                    params, vae_params, past, future, None,
                    past_mask=pm, future_mask=fm, target_mask=tm,
                    train=False, rng=key,
                )
            return samples.astype(wire_dtype)

        if self.mesh is None:
            return core
        return self._shard_mapped(core, n_batch_args=5)

    def _fn_hetero(self):
        """Like :meth:`_fn` but with PER-ROW rsample keys instead of one
        batch key: each row's output depends on its own key/tokens/masks
        alone, independent of batch position and of the other rows — the
        coalescing contract of :meth:`inpaint_hetero`. Under a mesh the
        keys shard with their rows (no per-shard fold_in needed), so the
        sharded program is row-for-row IDENTICAL to the single-device one."""
        from inpaintnet_tpu.ops.quantize import serving_quant

        model = self.model
        quant = self._quant

        def core(params, vae_params, past, pm, future, fm, tm, row_keys):
            # requests arrive in compact wire dtypes (int16 tokens, uint8
            # masks) — host<->device bandwidth is the per-call cost at
            # small batches (landmine #3); widen on device, narrow back
            wire_dtype = past.dtype
            past = past.astype(jnp.int32)
            future = future.astype(jnp.int32)
            pm, fm, tm = (m.astype(jnp.float32) for m in (pm, fm, tm))
            with serving_quant(quant):
                _, samples, _ = model.apply(
                    params, vae_params, past, future, None,
                    past_mask=pm, future_mask=fm, target_mask=tm,
                    train=False, rng=jax.random.PRNGKey(0),
                    row_keys=row_keys,
                )
            return samples.astype(wire_dtype)

        if self.mesh is None:
            return core

        from jax.sharding import PartitionSpec as P

        return jax.shard_map(
            core,
            mesh=self.mesh,
            in_specs=(P(), P()) + (P("data"),) * 6,
            out_specs=P("data"),
            check_vma=False,
        )

    def _compiled_for(self, batch: int):
        bucket = pick_bucket(self.batch_buckets, batch)
        if bucket not in self._compiled:
            self._compiled[bucket] = jax.jit(self._fn())
        return bucket, self._compiled[bucket]

    def _compiled_for_hetero(self, rows: int, bucket: Optional[int] = None):
        if bucket is None:
            bucket = pick_bucket(self.batch_buckets, rows)
        key = ("hetero", bucket)
        if key not in self._compiled:
            self._compiled[key] = jax.jit(self._fn_hetero())
        return bucket, self._compiled[key]

    def warmup(self, buckets: Optional[Sequence[int]] = None,
               variations: bool = True, hetero: bool = False) -> None:
        """Pre-compile (and run once) the serving programs for the given
        buckets (default: all) so the first real request doesn't pay the
        compile. Covers ``inpaint``, (unless ``variations=False``) the
        ``inpaint_variations`` encode/generate programs, and (with
        ``hetero=True``) the per-row-key ``inpaint_hetero`` programs the
        dynamic-batching server dispatches to — jit caches are per batch
        shape, so each bucket is warmed individually. Runs a dummy
        1-measure request per bucket and blocks until the result is on
        the host."""
        for bucket in (buckets if buckets is not None else self.batch_buckets):
            tokens = np.zeros((bucket, self.n_bars, self.msl), np.int32)
            self.inpaint(tokens, start_measure=1, num_measures=1, seed=0)
            if variations and not self.model.auto_reg:
                self.inpaint_variations(
                    tokens, start_measure=1, num_measures=1,
                    num_variations=1, seed=0,
                )
            if hetero:
                self.inpaint_hetero([{
                    "tokens": tokens, "start_measure": 1,
                    "num_measures": 1, "seed": 0,
                }])

    def _validate_request(self, tokens: np.ndarray, start_measure: int,
                          num_measures: int):
        """Shared request validation -> (b, m, n_past, n_future)."""
        b, m, msl = tokens.shape
        assert msl == self.msl, (msl, self.msl)
        assert 1 <= num_measures <= self.max_target
        assert 0 < start_measure and start_measure + num_measures < m + 1
        assert m <= self.n_bars, (m, self.n_bars)
        vocab = self.model.vae_model.num_notes
        assert tokens.size == 0 or (
            tokens.min() >= 0 and tokens.max() < vocab
        ), f"token values must lie in [0, {vocab})"
        return b, m, start_measure, m - start_measure - num_measures

    def _pack_request(self, tokens: np.ndarray, start_measure: int,
                      num_measures: int, bucket: int):
        """Validate + pad a request into the static (bucket, n_bars, msl)
        layout; single source of truth for inpaint/inpaint_variations."""
        tokens = np.asarray(tokens)
        b, m, n_past, n_future = self._validate_request(
            tokens, start_measure, num_measures
        )
        assert b <= bucket, f"batch {b} exceeds bucket {bucket}"
        msl = self.msl
        tok_dtype = token_wire_dtype(self.model.vae_model.num_notes)
        nb = self.n_bars
        past = np.zeros((bucket, nb, msl), tok_dtype)
        future = np.zeros((bucket, nb, msl), tok_dtype)
        past[:b, :n_past] = tokens[:, :n_past]
        if n_future:
            future[:b, :n_future] = tokens[:, m - n_future:]
        pm = np.zeros((bucket, nb), np.uint8)
        fm = np.zeros((bucket, nb), np.uint8)
        tm = np.zeros((bucket, self.max_target), np.uint8)
        pm[:, :n_past] = 1
        fm[:, :n_future] = 1  # all-zero mask => zero context (no future)
        tm[:, :num_measures] = 1
        return tokens, past, pm, future, fm, tm

    # ------------------------------------------------------------------ #
    def inpaint(
        self,
        tokens: np.ndarray,
        start_measure: int,
        num_measures: int,
        seed: Optional[int] = None,
    ) -> np.ndarray:
        """Inpaint ``num_measures`` measures starting at ``start_measure``.

        :param tokens: (B, M, msl) int tokens, M <= n_bars; batches larger
            than the biggest bucket are processed in bucket-size chunks
        :param start_measure: first measure (0-based) of the masked span
        :param num_measures: 1..max_target measures to regenerate
        :return: (B, M, msl) tokens with the span replaced
        """
        tokens = np.asarray(tokens)
        b = tokens.shape[0]
        if b > self.batch_buckets[-1]:
            return np.concatenate(self._run_chunked(
                lambda lo, hi, s: self.inpaint(
                    tokens[lo:hi], start_measure, num_measures, seed=s
                ),
                b, seed,
            ))
        bucket, fn = self._compiled_for(b)
        tokens, past, pm, future, fm, tm = self._pack_request(
            tokens, start_measure, num_measures, bucket
        )
        past, pm, future, fm, tm = self._place_batch((past, pm, future, fm, tm))
        key = self._seed_key(seed)
        samples = np.asarray(
            fn(self._params, self._vae_params, past, pm, future, fm, tm, key)
        )
        out = tokens.copy()
        out[:, start_measure : start_measure + num_measures] = samples[
            :b, :num_measures
        ]
        return out

    def inpaint_hetero(self, requests: Sequence[dict],
                       bucket: Optional[int] = None) -> list:
        """One device call serving SEVERAL independent requests with
        (possibly) different inpaint spans — the dynamic-batching
        primitive behind :class:`inpaintnet_tpu.server.InpaintingServer`'s
        request coalescing.

        The compiled program already takes per-row past/future buffers and
        validity masks (static masked buffers are how ONE compilation
        serves every split shape), so heterogeneous requests pack into one
        batch for free. Per-row PRNG keys (host-derived from
        (request seed, row) — :func:`derive_row_keys`) make each row's
        output depend on its own request alone: a request
        gets the SAME tokens whether it runs solo or coalesced with others
        (bit-exact for f32/bf16 serving at a given bucket; int8 is
        near-exact — the decoder's data-dependent init-hidden quant bound
        spans the batch).

        :param requests: sequence of dicts with keys ``tokens`` (b, M,
            msl), ``start_measure``, ``num_measures``, optional ``seed``
            (default: engine seed — identical seedless requests return
            identical tokens, matching their solo behavior; pass distinct
            seeds or use :meth:`inpaint_variations` for diversity)
        :param bucket: run at this exact bucket instead of the smallest
            one that fits — different buckets are different XLA
            executables whose float results need not be bit-equal, so
            pinning one extends bit-identity across ALL load levels (the
            server's ``pin_bucket``) at the cost of padded transfers
        :return: list of (b, M, msl) outputs, one per request, each with
            only its span replaced

        Serves BOTH generation configs: non-autoregressive rows draw only
        the context rsample from their row key; autoregressive rows split
        their key into context + per-step re-encode streams inside the
        model (LatentRNN.apply row_keys), so the decode->re-encode scan is
        equally row-independent.
        """
        if not requests:
            return []
        norm = []
        rows = 0
        for r in requests:
            tokens = np.asarray(r["tokens"])
            start, num = r["start_measure"], r["num_measures"]
            b, m, n_past, n_future = self._validate_request(
                tokens, start, num
            )
            norm.append((tokens, start, num, r.get("seed"), b, m,
                         n_past, n_future))
            rows += b
        cap = self.batch_buckets[-1] if bucket is None else bucket
        if rows > cap:
            raise ValueError(
                f"{rows} total rows exceed the "
                f"{'largest bucket' if bucket is None else 'pinned bucket'} "
                f"({cap}); split the request set"
            )
        bucket, fn = self._compiled_for_hetero(rows, bucket)
        nb, msl = self.n_bars, self.msl
        # compact wire dtypes (cast back on device in _fn_hetero's core):
        # the big context buffers dominate per-call host->device transfer
        tok_dtype = token_wire_dtype(self.model.vae_model.num_notes)
        past = np.zeros((bucket, nb, msl), tok_dtype)
        future = np.zeros((bucket, nb, msl), tok_dtype)
        pm = np.zeros((bucket, nb), np.uint8)
        fm = np.zeros((bucket, nb), np.uint8)
        tm = np.zeros((bucket, self.max_target), np.uint8)
        row_keys = np.zeros((bucket, 2), np.uint32)
        lo = 0
        for tokens, start, num, seed, b, m, n_past, n_future in norm:
            sl = slice(lo, lo + b)
            past[sl, :n_past] = tokens[:, :n_past]
            if n_future:
                future[sl, :n_future] = tokens[:, m - n_future:]
            pm[sl, :n_past] = 1
            fm[sl, :n_future] = 1
            tm[sl, :num] = 1
            row_keys[sl] = derive_row_keys(
                self.seed if seed is None else seed, b
            )
            lo += b
        args = self._place_batch((past, pm, future, fm, tm, row_keys))
        samples = np.asarray(fn(self._params, self._vae_params, *args))
        outs = []
        lo = 0
        for tokens, start, num, seed, b, m, n_past, n_future in norm:
            out = tokens.copy()
            out[:, start : start + num] = samples[lo : lo + b, :num]
            outs.append(out)
            lo += b
        return outs

    def inpaint_variations(
        self,
        tokens: np.ndarray,
        start_measure: int,
        num_measures: int,
        num_variations: int,
        seed: Optional[int] = None,
    ) -> np.ndarray:
        """N stochastic re-inpaintings of the SAME context (the reference's
        diversity workload, script_gen_same_context.py) with the frozen-VAE
        encoder run ONCE: variation randomness comes only from the latent
        rsample, so the cached posterior is re-drawn per variation — the
        per-variation cost drops from (encode + generate) to generate only
        (~4x at flagship shapes).

        :return: (num_variations, B, M, msl) tokens
        """
        if self.model.auto_reg:
            # autoregressive generation re-encodes its own samples, so the
            # cached-posterior trick below doesn't apply. When the tiled
            # rows fit a bucket, a variations request is EXACTLY an
            # nvar-tiled hetero request — per-row keys make every tiled
            # row a distinct draw in ONE device call; otherwise fall back
            # to full passes (per-variation keys via fold_in)
            b0 = np.asarray(tokens).shape[0]
            if num_variations * b0 <= self.batch_buckets[-1]:
                tiled = np.tile(np.asarray(tokens), (num_variations, 1, 1))
                out = self.inpaint_hetero([{
                    "tokens": tiled, "start_measure": start_measure,
                    "num_measures": num_measures, "seed": seed,
                }])[0]
                return out.reshape(
                    (num_variations, b0) + out.shape[1:]
                )
            base_key = self._seed_key(seed)
            return np.stack([
                self.inpaint(tokens, start_measure, num_measures,
                             seed=jax.random.fold_in(base_key, i))
                for i in range(num_variations)
            ])
        tokens = np.asarray(tokens)
        b = tokens.shape[0]
        if b > self.batch_buckets[-1]:
            return np.concatenate(self._run_chunked(
                lambda lo, hi, s: self.inpaint_variations(
                    tokens[lo:hi], start_measure, num_measures,
                    num_variations, seed=s,
                ),
                b, seed,
            ), axis=1)
        bucket, _ = self._compiled_for(b)
        tokens, past, pm, future, fm, tm = self._pack_request(
            tokens, start_measure, num_measures, bucket
        )
        past, pm, future, fm, tm = self._place_batch((past, pm, future, fm, tm))

        model = self.model
        if "enc_dists" not in self._compiled:
            from inpaintnet_tpu.ops.quantize import serving_quant

            quant = self._quant

            def enc_dists(vp, p_ctx, f_ctx):
                # wire dtypes from _pack_request — widen on device
                p_ctx = p_ctx.astype(jnp.int32)
                f_ctx = f_ctx.astype(jnp.int32)
                with serving_quant(quant):
                    return model.encode_context_dists(vp, p_ctx, f_ctx)

            def gen_dists(p, vp, pd, fd, pm, fm, tm, key):
                pm, fm, tm = (m.astype(jnp.float32) for m in (pm, fm, tm))
                with serving_quant(quant):
                    return model.generate_from_context_dists(
                        p, vp, pd, fd, past_mask=pm, future_mask=fm,
                        target_mask=tm, rng=key,
                    )[1]

            if self.mesh is not None:
                import jax as _jax
                from jax.sharding import PartitionSpec as P

                # no randomness in the encode; per-shard key fold in gen
                enc_dists = _jax.shard_map(
                    enc_dists, mesh=self.mesh,
                    in_specs=(P(), P("data"), P("data")),
                    out_specs=P("data"), check_vma=False,
                )
                gen_plain = gen_dists

                def gen_core(p, vp, pd, fd, pm, fm, tm, key):
                    key = _jax.random.fold_in(
                        key, _jax.lax.axis_index("data")
                    )
                    return gen_plain(p, vp, pd, fd, pm, fm, tm, key)

                gen_dists = _jax.shard_map(
                    gen_core, mesh=self.mesh,
                    in_specs=(P(), P()) + (P("data"),) * 5 + (P(),),
                    out_specs=P("data"), check_vma=False,
                )
            self._compiled["enc_dists"] = jax.jit(enc_dists)
            self._compiled["gen_dists"] = jax.jit(gen_dists)
        pd, fd = self._compiled["enc_dists"](self._vae_params, past, future)
        base = self._seed_key(seed)
        keys = list(np.asarray(jax.random.split(base, num_variations)))
        outs = []
        for key in keys:
            samples = np.asarray(
                self._compiled["gen_dists"](
                    self._params, self._vae_params, pd, fd, pm, fm, tm, key
                )
            )
            out = tokens.copy()
            out[:, start_measure : start_measure + num_measures] = samples[
                :b, :num_measures
            ]
            outs.append(out)
        return np.stack(outs)

    # max interpolation points per request: rows pad to ONE compiled
    # (64, z) decode program (decode is row-independent, so padding is
    # exact) instead of a program per point count
    MAX_INTERP = 62

    def interpolate(self, measure_a: np.ndarray, measure_b: np.ndarray,
                    num_points: int) -> np.ndarray:
        """Latent interpolation between two measures (the reference
        VAETester capability, vae_tester.py:72-93, served): encode both
        measures to their posterior MEANS, decode ``num_points`` evenly
        spaced interpolants plus both endpoints with the frozen VAE
        (argmax — fully deterministic).

        :param measure_a/measure_b: (msl,) int tokens
        :return: (num_points + 2, msl) tokens, a -> b
        """
        assert 1 <= num_points <= self.MAX_INTERP, num_points
        a = np.asarray(measure_a).reshape(1, self.msl)
        b = np.asarray(measure_b).reshape(1, self.msl)
        n = num_points + 2
        if "interp" not in self._compiled:
            from inpaintnet_tpu.ops.quantize import serving_quant

            model = self.model
            quant = self._quant

            def interp(vp, pair, alphas):
                with serving_quant(quant):
                    dist = model.vae_model.encoder.apply(
                        vp["encoder"], pair.astype(jnp.int32),
                        train=False, rng=jax.random.PRNGKey(0),
                    )
                    z1, z2 = dist.loc[0], dist.loc[1]
                    zs = (z1[None, :] * (1 - alphas[:, None])
                          + z2[None, :] * alphas[:, None])
                    _, samples = model.vae_model.decoder.decode_sampling(
                        vp["decoder"], zs, train=False,
                        rng=jax.random.PRNGKey(0),
                    )
                return samples.astype(pair.dtype)

            self._compiled["interp"] = jax.jit(interp)
        wire = token_wire_dtype(self.model.vae_model.num_notes)
        pair = np.concatenate([a, b]).astype(wire)
        # pad alphas to the fixed row count; pad rows decode garbage
        # interpolants that are sliced away (row-independent decode)
        alphas = np.zeros((self.MAX_INTERP + 2,), np.float32)
        alphas[:n] = np.arange(n, dtype=np.float32) / (n - 1)
        out = np.asarray(
            self._compiled["interp"](self._vae_params, pair, alphas)
        )
        return out[:n].astype(np.int32)

    def inpaint_ticks(
        self, tensor_score: np.ndarray, time_index_range_ticks: Tuple[int, int],
        seed: Optional[int] = None,
    ) -> np.ndarray:
        """Tick-range API matching the reference product contract
        (latent_rnn_tester.py:131-195): (1, L) tokens + [a, b) tick range."""
        a, _b = time_index_range_ticks
        assert a % self.msl == 0 and _b % self.msl == 0
        tokens = np.asarray(tensor_score).reshape(1, -1, self.msl)
        out = self.inpaint(
            tokens, a // self.msl, (_b - a) // self.msl, seed=seed
        )
        return out.reshape(1, -1)
