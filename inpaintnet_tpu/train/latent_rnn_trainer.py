"""LatentRNN (InpaintNet) trainer
(reference LatentRNN/latent_rnn_trainer.py:8-176).

The stochastic past/target/future split draws per-batch sizes on the host
(seeded), then packs them into the model's FIXED-size padded buffers +
masks — so every batch hits the same compiled step regardless of split.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from inpaintnet_tpu.train.trainer import Trainer


def split_to_measures(score_tensor: np.ndarray, measure_seq_len: int) -> np.ndarray:
    """(B, 1, seq) -> (B, M, measure_seq_len) (latent_rnn_trainer.py:162-176)."""
    b, _, seq_len = score_tensor.shape
    if seq_len % measure_seq_len != 0:
        raise ValueError("sequence length not a multiple of the measure length")
    return score_tensor.reshape(b, -1, measure_seq_len)


def split_score(score_tensor, num_past, num_future, num_target, measure_seq_len):
    """Deterministic split (latent_rnn_trainer.py:134-160)."""
    m = split_to_measures(np.asarray(score_tensor), measure_seq_len)
    num_measures = m.shape[1]
    assert num_measures == num_past + num_future + num_target
    past = m[:, :num_past]
    future = m[:, num_measures - num_future :]
    target = m[:, num_past : num_measures - num_future]
    return past, future, target


def pack_padded(
    past, future, target, max_context: int, max_target: int
) -> Tuple[np.ndarray, ...]:
    """Pad (past, future, target) into fixed buffers + masks."""
    b = past.shape[0]
    msl = past.shape[-1]

    def pad(x, n):
        buf = np.zeros((b, n, msl), dtype=np.int32)
        buf[:, : x.shape[1]] = x
        mask = np.zeros((b, n), dtype=np.float32)
        mask[:, : x.shape[1]] = 1.0
        return buf, mask

    p, pm = pad(past, max_context)
    f, fm = pad(future, max_context)
    t, tm = pad(target, max_target)
    return p, pm, f, fm, t, tm


class LatentRNNTrainer(Trainer):
    def __init__(self, dataset, model, lr: float = 1e-4, early_stopping=False, **kw):
        self.min_num_measures_target = 2  # latent_rnn_trainer.py:19-20
        self.max_num_measure_target = 6
        super().__init__(dataset, model, lr, early_stopping, **kw)
        assert self.max_num_measure_target >= self.min_num_measures_target
        # the stochastic split draws num_past ~ randint(1, n_bars -
        # num_target - 1), which needs n_bars >= num_target + 3 to be a
        # non-empty range for the LARGEST target (n_bars > max alone
        # admits 7/8-bar datasets that crash mid-training)
        assert dataset.n_bars >= self.max_num_measure_target + 3, (
            f"n_bars {dataset.n_bars} too small for "
            f"max target {self.max_num_measure_target} (need >= target + 3)"
        )
        self.measure_seq_len = dataset.subdivision * dataset.num_beats_per_bar
        self.max_context = dataset.n_bars
        self._np_rng = np.random.RandomState(kw.get("seed", 0) + 17)

    # --- frozen VAE plumbing ------------------------------------------------ #
    def extra_params(self):
        return self.model.vae_model.params

    # --- batch prep ----------------------------------------------------------- #
    def process_batch_data(self, batch):
        score_tensor = np.asarray(batch[0])
        return self.split_score_stochastic(score_tensor)

    def split_score_stochastic(
        self, score_tensor, extra_outs=False, fix_num_target: Optional[int] = None
    ):
        """(latent_rnn_trainer.py:77-132), packed into padded buffers."""
        m = split_to_measures(score_tensor, self.measure_seq_len)
        num_measures = m.shape[1]
        assert num_measures == self.dataset.n_bars
        if fix_num_target is None:
            num_target = int(
                self._np_rng.randint(
                    self.min_num_measures_target, self.max_num_measure_target + 1
                )
            )
        else:
            num_target = fix_num_target
        num_past = int(self._np_rng.randint(1, num_measures - num_target - 1))
        num_future = num_measures - num_past - num_target
        past, future, target = split_score(
            score_tensor, num_past, num_future, num_target, self.measure_seq_len
        )
        packed = pack_padded(
            past, future, target, self.max_context, self.max_num_measure_target
        )
        if extra_outs:
            return packed, num_past, num_target
        return packed

    # --- loss -------------------------------------------------------------------- #
    def loss_and_metrics(self, params, batch_data, rng, train, extra=None,
                         row_mask=None):
        past, pm, future, fm, target, tm = batch_data
        weights, samples, gen_z = self.model.apply(
            params,
            extra,
            past,
            future,
            target,
            past_mask=pm,
            future_mask=fm,
            target_mask=tm,
            train=train,
            rng=rng,
        )
        tick_mask = tm[:, :, None] * np.ones((1, 1, self.measure_seq_len))
        if row_mask is not None:
            tick_mask = tick_mask * row_mask[:, None, None]
        loss = self.mean_crossentropy_loss_alt(weights, target, mask=tick_mask)
        accuracy = self.mean_accuracy_alt(weights, target, mask=tick_mask)
        return loss, {"accuracy": accuracy}

    # static aliases used across the reference codebase
    split_score = staticmethod(split_score)
    split_to_measures = staticmethod(split_to_measures)
