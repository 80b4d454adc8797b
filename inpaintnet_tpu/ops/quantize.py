"""int8 serving quantization for the Pallas RNN kernels.

The v5e MXU runs int8 x int8 -> int32 at ~1.45-2x its bf16 rate *inside a
Pallas kernel* (measured 169 vs 117 T(FL)OP/s on resident operands; the
XLA-level int8 path measured only 1.06x — docs/PERFORMANCE.md "Negative
results"). The serving encoder/decode are matmul-floor-bound, so an int8
path is the one remaining large lever.

Scheme (symmetric, per-output-channel):
- weights: ``scale[col] = max|w[:, col]| / 127``, ``q = round(w / scale)``
  (int8); the int32 dot product is dequantized by ``scale`` in f32.
- recurrent hidden states: GRU outputs are a convex combination of a
  ``tanh`` candidate and the previous state with ``h_0 = 0``, so
  ``|h| < 1`` ALWAYS — a fixed scale of 127 is exact-range with no
  calibration: ``q_h = round(h * 127)``, dequant folds ``1/127`` into the
  weight scale.
- one-hot matmul operands (token tables) are exact in int8 (values 0/1);
  only the weight scale applies.
- gate math stays f32 (pallas_common.gru_gates_f32) — only the MXU
  contractions are quantized.

Quality: measured QUALITY-NEUTRAL on trained weights (inpaint accuracy
identical to f32 — table in docs/PERFORMANCE.md), on which basis int8 is
the TPU serving default in ``bench.py``; ``INPAINTNET_SERVE_QUANT=none``
or ``InpaintingEngine(dtype="bfloat16")`` revert to bf16.
"""
from __future__ import annotations

import os
from contextlib import contextmanager

import jax.numpy as jnp

# fixed scale for tanh-bounded recurrent states (|h| < 1)
H_SCALE = 127.0

# library-level override of the INPAINTNET_SERVE_QUANT env hook, so
# callers like serve.InpaintingEngine(dtype="int8") can request the
# quantized route without mutating process-global environment. Read at
# TRACE time by the model kernel gates.
_SERVE_QUANT_OVERRIDE: str | None = None


def serve_quant_mode() -> str:
    """The active serving quantization mode: "int8" or "none"."""
    if _SERVE_QUANT_OVERRIDE is not None:
        return _SERVE_QUANT_OVERRIDE
    return os.environ.get("INPAINTNET_SERVE_QUANT", "none")


@contextmanager
def serving_quant(mode: str | None):
    """Scoped serve-quant override (``None`` defers to the env hook).

    Wrap the region where a jitted serving function is TRACED (its first
    call) — the kernel gates read the mode at trace time."""
    global _SERVE_QUANT_OVERRIDE
    prev = _SERVE_QUANT_OVERRIDE
    _SERVE_QUANT_OVERRIDE = mode
    try:
        yield
    finally:
        _SERVE_QUANT_OVERRIDE = prev


def quantize_cols_int8(w):
    """Per-output-channel symmetric int8 quantization of a (K, N) matrix.

    :return: (q int8 (K, N), scale f32 (1, N)) with ``w ~= q * scale``
    """
    scale = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(
        jnp.int8
    )
    return q, scale


def quantize_h_int8(h, qscale=H_SCALE):
    """Quantize a bounded activation to int8 at ``qscale`` (= 127/bound;
    the default assumes the tanh bound |h| < 1). Traceable inside Pallas
    kernels — both int8 kernels call this per step."""
    return (
        jnp.clip(jnp.round(h.astype(jnp.float32) * qscale), -127, 127)
        .astype(jnp.int8)
    )


def dequantize_h(q, qscale=H_SCALE):
    """Inverse of :func:`quantize_h_int8` (f32)."""
    return q.astype(jnp.float32) * (1.0 / qscale)
