"""Diagonal-normal utilities for the VAE latent.

Replaces ``torch.distributions.Normal`` usage (reference
``encoder.py:133``, ``measure_vae.py:119-126``, ``vae_trainer.py:128-139``)
with explicit reparameterized sampling + closed-form KL.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DiagNormal(NamedTuple):
    loc: jnp.ndarray
    scale: jnp.ndarray

    def rsample(self, key):
        """Reparameterized sample (pathwise gradients flow to loc/scale)."""
        eps = jax.random.normal(key, self.loc.shape, self.loc.dtype)
        return self.loc + self.scale * eps

    def sample(self, key):
        return jax.lax.stop_gradient(self.rsample(key))

    def log_prob(self, x):
        var = self.scale**2
        return -0.5 * (jnp.log(2 * jnp.pi * var) + (x - self.loc) ** 2 / var)


def kl_diag_normal_vs_standard(dist: DiagNormal):
    """KL(N(loc, scale^2) || N(0, 1)), elementwise.

    Identical to ``torch.distributions.kl.kl_divergence`` for Normals with a
    standard-normal prior (vae_trainer.py:137).
    """
    var = dist.scale**2
    return 0.5 * (var + dist.loc**2 - 1.0) - jnp.log(dist.scale)
