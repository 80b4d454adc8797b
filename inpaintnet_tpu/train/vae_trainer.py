"""MeasureVAE trainer (reference MeasureVAE/vae_trainer.py:10-139)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from inpaintnet_tpu.data.dataset import FolkDatasetNBars
from inpaintnet_tpu.ops import kl_diag_normal_vs_standard
from inpaintnet_tpu.train.trainer import Trainer


class VAETrainer(Trainer):
    """ELBO = token cross-entropy + beta * KLD with FIXED beta=0.001
    (vae_trainer.py:128-139 — no annealing; ``beta`` is configurable here
    but defaults to the reference constant)."""

    def __init__(self, dataset, model, lr: float = 1e-4, beta: float = 0.001, **kw):
        self.beta = beta
        super().__init__(dataset, model, lr, **kw)

    def default_train_gru_impl(self):
        """On TPU: the trainfast custom-VJP layer with BOTH Pallas
        kernels (gate-emitting forward stream + sequential-backward) —
        with the shard_map step and rbg step keys the flagship 4096-row
        step runs 69.0 ms/step bf16, 1.51x the round-3 checkpointed scan
        (docs/PERFORMANCE.md "Training recurrence A/B" + the round-5
        decomposition). VAE training always runs n_bars measure-rows per
        window, so even modest window batches land in the kernels'
        large-row regime. Opt out with INPAINTNET_TRAIN_GRU_IMPL=xla.

        Multi-device meshes keep the kernels too: the base trainer swaps
        the GSPMD-jitted grad computation for an explicit ``jax.shard_map``
        over the data axis (Trainer._use_shard_map_train — GSPMD cannot
        partition Pallas custom calls, so each device runs the whole
        kernel-bearing program on its local rows, mirroring the serving
        layer's mesh path)."""
        import jax

        if jax.default_backend() != "tpu":
            return None
        return "trainfast_pallas"

    def process_batch_data(self, batch):
        """(B, 1, n_bars*24) -> (B * n_bars, 24) per-measure batch
        (vae_trainer.py:42-55)."""
        score_tensor = np.asarray(batch[0])
        if isinstance(self.dataset, FolkDatasetNBars):
            b = score_tensor.shape[0]
            score_tensor = score_tensor.reshape(b * self.dataset.n_bars, -1)
        else:
            score_tensor = score_tensor.reshape(score_tensor.shape[0], -1)
        return score_tensor.astype(np.int32)

    def loss_and_metrics(self, params, batch_data, rng, train, extra=None,
                         row_mask=None):
        score = batch_data
        weights, samples, z_dist, prior_dist, z_tilde, z_prior = self.model.apply(
            params, score, train=train, rng=rng
        )
        mask = None if row_mask is None else row_mask[:, None] * jnp.ones(
            (1, score.shape[1])
        )
        recons_loss = self.mean_crossentropy_loss(weights, score, mask=mask)
        # KLD in float32 regardless of compute dtype (see metrics._nll)
        kld = kl_diag_normal_vs_standard(
            type(z_dist)(z_dist.loc.astype(jnp.float32),
                         z_dist.scale.astype(jnp.float32))
        ).sum(axis=1)
        if row_mask is None:
            dist_loss = self.beta * kld.mean()
        else:
            dist_loss = self.beta * (kld * row_mask).sum() / jnp.maximum(
                row_mask.sum(), 1.0
            )
        loss = recons_loss + dist_loss
        accuracy = self.mean_accuracy(weights, score, mask=mask)
        return loss, {"accuracy": accuracy}

    @staticmethod
    def compute_kld_loss(z_dist, prior_dist=None, beta: float = 0.001):
        """(vae_trainer.py:128-139). Float32 regardless of compute dtype,
        matching the in-trainer KLD path (see metrics._nll)."""
        kld = kl_diag_normal_vs_standard(
            type(z_dist)(z_dist.loc.astype(jnp.float32),
                         z_dist.scale.astype(jnp.float32))
        )
        return beta * kld.sum(axis=1).mean()

    @staticmethod
    def compute_mmd_loss(z_tilde, z_prior, coeff: float = 10.0):
        """Unused alternative WAE objective kept for library parity
        (vae_trainer.py:81-126, gaussian kernel)."""

        def kernel(x, y, var=16.0):
            d = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
            return jnp.exp(-d / var).sum()

        n = z_tilde.shape[0]
        first = 1.0 / (n * (n - 1)) / 2 if n > 1 else 1.0
        second = 2.0 / (n * n)
        return coeff * (
            first * kernel(z_prior, z_prior)
            + first * kernel(z_tilde, z_tilde)
            - second * kernel(z_prior, z_tilde)
        )
