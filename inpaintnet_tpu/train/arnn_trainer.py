"""AnticipationRNN trainers
(reference AnticipationRNN/anticipation_rnn_trainer.py:8-210).

- ``AnticipationRNNGaussianRegTrainer``: contiguous-span constraint mask
  (past + future ticks = 1, target span = 0), sampled per batch. The
  reference defines a gaussian activation regularizer but never adds it to
  the loss (:138-152); ``gaussian_reg_coeff`` (default 0.0) mirrors that
  shipped behaviour while making the term available.
- ``AnticipationRNNBaselineTrainer``: scattered Bernoulli(p ~ U[0, 0.5])
  constraint mask shared across the batch (:193-210).
"""
from __future__ import annotations

import numpy as np

from inpaintnet_tpu.train.latent_rnn_trainer import split_to_measures
from inpaintnet_tpu.train.trainer import Trainer


class AnticipationRNNGaussianRegTrainer(Trainer):
    def __init__(self, dataset, model, lr: float = 1e-4, early_stopping=False,
                 gaussian_reg_coeff: float = 0.0, **kw):
        self.min_num_measures_target = 2
        self.max_num_measure_target = 6
        self.gaussian_reg_coeff = gaussian_reg_coeff
        super().__init__(dataset, model, lr, early_stopping, **kw)
        # see latent_rnn_trainer: randint(1, n_bars - target - 1) needs
        # n_bars >= target + 3
        assert dataset.n_bars >= self.max_num_measure_target + 3, (
            f"n_bars {dataset.n_bars} too small for "
            f"max target {self.max_num_measure_target} (need >= target + 3)"
        )
        self.measure_seq_len = dataset.subdivision * dataset.num_beats_per_bar
        self._np_rng = np.random.RandomState(kw.get("seed", 0) + 29)

    def process_batch_data(self, batch):
        score_tensor = np.asarray(batch[0])
        metadata_tensor = np.asarray(batch[1])
        constraint_loc, start_tick, end_tick = self.get_constraints_location(
            score_tensor
        )
        b = score_tensor.shape[0]
        score = score_tensor.reshape(b, -1).astype(np.int32)
        md = metadata_tensor.reshape(b, score.shape[1], -1).astype(np.int32)
        loc = constraint_loc.reshape(b, -1).astype(np.int32)
        return score, md, loc

    def get_num_target_stochastic(self):
        return int(
            self._np_rng.randint(
                self.min_num_measures_target, self.max_num_measure_target + 1
            )
        )

    def get_num_past_stochastic(self, num_target, num_measures):
        return int(self._np_rng.randint(1, num_measures - num_target - 1))

    def get_constraints_location(self, score_tensor, extra_outs=False, fix_num_target=None):
        """Contiguous span (reference :93-128, incl. the start at
        ``num_past + 1`` and the off-by-one guard at the right edge)."""
        m = split_to_measures(score_tensor, self.measure_seq_len)
        num_measures = m.shape[1]
        assert num_measures == self.dataset.n_bars
        num_target = (
            fix_num_target if fix_num_target is not None else self.get_num_target_stochastic()
        )
        num_past = self.get_num_past_stochastic(num_target, num_measures)
        start_measure = num_past + 1
        constraints_location = np.zeros_like(score_tensor)
        start_tick = start_measure * self.measure_seq_len
        end_tick = start_tick + num_target * self.measure_seq_len
        if start_tick > 0:
            constraints_location[:, :, :start_tick] = 1
        if end_tick < constraints_location.shape[2] - 1:
            constraints_location[:, :, end_tick:] = 1
        if extra_outs:
            return constraints_location, start_tick, end_tick, num_past, num_target
        return constraints_location, start_tick, end_tick

    def loss_and_metrics(self, params, batch_data, rng, train, extra=None,
                         row_mask=None):
        score, md, loc = batch_data
        if train and self.gaussian_reg_coeff > 0.0:
            # activation regularizer requires the TF full-sequence pass —
            # the reference defines this term but never adds it
            # (anticipation_rnn_trainer.py:138-152); here it is a working
            # opt-in. TRAIN only (and always teacher-forced, the
            # activations' requirement); eval keeps the standard ``apply``
            # path so val loss stays comparable to coeff=0 runs and
            # EarlyStopping tracks the serving-time objective.
            weights, (g_acts, c_acts) = self.model.forward_tf(
                params, score, md, loc, train=train, rng=rng,
                return_activations=True,
            )
            reg = self.gaussian_regularization(list(g_acts) + list(c_acts))
        else:
            weights = self.model.apply(params, score, md, loc, train=train, rng=rng)
            reg = 0.0
        mask = 1 - loc  # loss on unconstrained (target) ticks only (:41-47)
        if row_mask is not None:
            mask = mask * row_mask[:, None]
        loss = self.mean_crossentropy_loss(weights, score, mask=mask)
        loss = loss + self.gaussian_reg_coeff * reg
        accuracy = self.mean_accuracy(weights, score, mask=mask)
        return loss, {"accuracy": accuracy}

    @staticmethod
    def gaussian_regularization(activations):
        """Activation mean/variance regularizer (reference :138-152): pushes
        per-unit activation means to 0 and variances toward their mean.

        :param activations: list of (B, T, H) per-layer outputs
        """
        import jax.numpy as jnp

        loss_mean = 0.0
        loss_var = 0.0
        for h in activations:
            flat = h.reshape(-1, h.shape[-1])
            means = flat.mean(axis=0)
            variances = flat.var(axis=0, ddof=1)
            mean_vars = variances.mean()
            loss_mean = loss_mean + jnp.sum(means**2)
            loss_var = loss_var + jnp.sum((variances - mean_vars) ** 2)
        return loss_mean + loss_var


class AnticipationRNNBaselineTrainer(AnticipationRNNGaussianRegTrainer):
    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        self.constraint_prob = 0.5

    def process_batch_data(self, batch):
        score_tensor = np.asarray(batch[0])
        metadata_tensor = np.asarray(batch[1])
        b = score_tensor.shape[0]
        p = self._np_rng.random_sample() * self.constraint_prob
        # one scattered mask shared across the batch (reference :201-202)
        single = (
            self._np_rng.random_sample(score_tensor.shape[1:]) < p
        ).astype(np.int32)
        loc = np.broadcast_to(single[None], score_tensor.shape).copy()
        score = score_tensor.reshape(b, -1).astype(np.int32)
        md = metadata_tensor.reshape(b, score.shape[1], -1).astype(np.int32)
        return score, md, loc.reshape(b, -1)
