"""LatentRNN tester / inpainting drivers
(reference LatentRNN/latent_rnn_tester.py:13-414).

The product-level contract — *(tensor_score, time_index_range_ticks) ->
inpainted score/tensor* — is ``generation(...)``; all drivers funnel into
``generate(...)`` which pads contexts into the model's static buffers and
runs ONE jitted forward.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np

from inpaintnet_tpu.data.tokenizer import END_SYMBOL, REST, START_SYMBOL
from inpaintnet_tpu.train.latent_rnn_trainer import (
    pack_padded,
    split_score,
    split_to_measures,
)
from inpaintnet_tpu.train.metrics import mean_accuracy, mean_crossentropy_loss


class LatentRNNTester:
    def __init__(self, dataset, model, seed: int = 0):
        self.dataset = dataset
        self.model = model
        self.min_num_measures_target = 1  # latent_rnn_tester.py:20-21
        self.max_num_measure_target = 4
        self.measure_seq_len = self.dataset.subdivision * self.dataset.num_beats_per_bar
        self.max_context = dataset.n_bars
        self.seed = seed
        self._np_rng = np.random.RandomState(seed + 41)
        self._fwd = jax.jit(
            lambda params, vae_params, past, pm, future, fm, target, tm, rng:
            self.model.apply(
                params, vae_params, past, future, target,
                past_mask=pm, future_mask=fm, target_mask=tm,
                train=False, rng=rng,
            )
        )

    # --- eval ---------------------------------------------------------------- #
    def test_model(self, batch_size: int = 512):
        """(latent_rnn_tester.py:28-50)"""
        _, _, gen_test = self.dataset.data_loaders(
            batch_size=batch_size, split=(0.01, 0.01)
        )
        print("Num Test Batches: ", len(gen_test))
        mean_loss, mean_acc = self.loss_and_acc_test(gen_test)
        print("Test Epoch: 1/1")
        print(f"\tTest Loss: {mean_loss}\tTest Accuracy: {mean_acc * 100} %")
        return mean_loss, mean_acc

    def loss_and_acc_test(self, data_loader):
        """(latent_rnn_tester.py:297-340)"""
        mean_loss, mean_acc, nb = 0.0, 0.0, 0
        key = jax.random.PRNGKey(self.seed)
        for i, batch in enumerate(data_loader):
            packed = self.process_batch_data(batch)
            past, pm, future, fm, target, tm = packed
            weights, _, _ = self._fwd(
                self.model.params, self.model.vae_model.params,
                past, pm, future, fm, target, tm, jax.random.fold_in(key, i),
            )
            tick_mask = tm[:, :, None] * np.ones((1, 1, self.measure_seq_len))
            mean_loss += float(mean_crossentropy_loss(weights, target, mask=tick_mask))
            mean_acc += float(mean_accuracy(weights, target, mask=tick_mask))
            nb += 1
        nb = max(nb, 1)
        return mean_loss / nb, mean_acc / nb

    def process_batch_data(self, batch):
        return self.split_score_stochastic(np.asarray(batch[0]))

    def split_score_stochastic(self, score_tensor, fix_num_target: Optional[int] = None):
        """(latent_rnn_tester.py:359-414) with tester target range [1, 4]."""
        m = split_to_measures(score_tensor, self.measure_seq_len)
        num_measures = m.shape[1]
        num_target = (
            fix_num_target
            if fix_num_target is not None
            else int(
                self._np_rng.randint(
                    self.min_num_measures_target, self.max_num_measure_target + 1
                )
            )
        )
        num_past = int(self._np_rng.randint(1, num_measures - num_target - 1))
        num_future = num_measures - num_past - num_target
        past, future, target = split_score(
            score_tensor, num_past, num_future, num_target, self.measure_seq_len
        )
        return pack_padded(
            past, future, target, self.max_context, self.model.max_target
        )

    # --- generation drivers ------------------------------------------------------ #
    def generation_test(self):
        """Inpaint a random test sample (latent_rnn_tester.py:52-72)."""
        _, _, gen_test = self.dataset.data_loaders(batch_size=1, split=(0.70, 0.20))
        it = iter(gen_test)
        # skip a random number of batches, then take the NEXT one (a draw
        # of 0 previously left `batch` unassigned -> UnboundLocalError)
        for _ in range(self._np_rng.randint(0, max(1, len(gen_test)))):
            next(it)
        batch = next(it)
        m = split_to_measures(np.asarray(batch[0]), self.measure_seq_len)
        num_target = int(self._np_rng.randint(1, self.max_num_measure_target + 1))
        num_past = int(self._np_rng.randint(1, m.shape[1] - num_target - 1))
        num_future = m.shape[1] - num_past - num_target
        past, future, target = split_score(
            np.asarray(batch[0]), num_past, num_future, num_target, self.measure_seq_len
        )
        return self.generate(past, future, target, num_target)

    def generation_random(self, tensor_score, start_measure, num_measures_gen):
        """Fixed-position inpainting (latent_rnn_tester.py:74-129)."""
        return self._generation_from_tensor(
            tensor_score, start_measure, num_measures_gen
        )

    def generation(
        self,
        num_iterations=None,
        sequence_length_ticks: int = 384,
        tensor_score=None,
        time_index_range_ticks: Optional[Tuple[int, int]] = None,
    ):
        """Tick-range inpainting API (latent_rnn_tester.py:131-195)."""
        del num_iterations
        if tensor_score is None:
            score = next(self.dataset.iterator_gen())
            tensor_score, _ = self.dataset.transposed_score_and_metadata_tensors(score, 0)
        # validate the tick range against the ACTUAL tensor (a corpus-drawn
        # tune's length differs from the 384-tick default)
        sequence_length_ticks = np.asarray(tensor_score).shape[-1]
        if time_index_range_ticks is None:
            start_measure, num_measures_gen = 8, 2
        else:
            a, b = time_index_range_ticks
            assert a < b
            assert a % self.measure_seq_len == 0
            assert b % self.measure_seq_len == 0
            start_measure = a // self.measure_seq_len + 1
            num_measures_gen = (b - a) // self.measure_seq_len
            if a <= 0 or b >= sequence_length_ticks:
                return self.dataset.tensor_to_score(tensor_score), tensor_score, None
        gen_score, gen_tensor, orig = self._generation_from_tensor(
            np.asarray(tensor_score), start_measure, num_measures_gen
        )
        return gen_score, gen_tensor.reshape(1, -1), None

    def _generation_from_tensor(self, tensor_score, start_measure, num_measures_gen):
        tensor_score = np.asarray(tensor_score)
        if tensor_score.ndim == 2:
            msl = self.measure_seq_len
            num_measures = tensor_score.shape[1] // msl
            tensor_score = tensor_score[:, : num_measures * msl]
            tensor_score = tensor_score[:, None, :]
        m = split_to_measures(tensor_score, self.measure_seq_len)
        num_measures = min(self.dataset.n_bars, m.shape[1])  # clamp (ref :117)
        tensor_score = tensor_score[:, :, : num_measures * self.measure_seq_len]
        num_past = start_measure - 1
        num_target = num_measures_gen
        num_future = num_measures - num_past - num_target
        past, future, target = split_score(
            tensor_score, num_past, num_future, num_target, self.measure_seq_len
        )
        return self.generate(past, future, target, num_target)

    def generate(self, tensor_past, tensor_future, tensor_target,
                 num_target_measures, eval: bool = False):
        """(latent_rnn_tester.py:197-266); unlike the reference this path
        WORKS without a ground-truth target (its forward always encoded
        ``target``)."""
        if tensor_target is not None:
            num_target_measures = tensor_target.shape[1]
        elif num_target_measures is None:
            raise ValueError("num_target_measures required without a target")
        if tensor_past is None:
            tensor_past = self.create_empty_context("start")
        if tensor_future is None:
            tensor_future = self.create_empty_context("end")

        batch = tensor_past.shape[0]
        target_for_pack = (
            tensor_target
            if tensor_target is not None
            else np.zeros((batch, num_target_measures, self.measure_seq_len), np.int32)
        )
        past, pm, future, fm, target, tm = pack_padded(
            tensor_past, tensor_future, target_for_pack,
            self.max_context, self.model.max_target,
        )
        weights, gen_target, _ = self._fwd(
            self.model.params, self.model.vae_model.params,
            past, pm, future, fm, target, tm, jax.random.PRNGKey(self.seed),
        )
        gen_target = np.asarray(gen_target)[:, :num_target_measures, :]

        if tensor_target is not None and eval:
            tick_mask = tm[:, :, None] * np.ones((1, 1, self.measure_seq_len))
            loss = float(mean_crossentropy_loss(np.asarray(weights), target, mask=tick_mask))
            acc = float(mean_accuracy(np.asarray(weights), target, mask=tick_mask))
            print("Accuracy for Test Case:")
            print(f"\tLoss: {loss}\tAccuracy: {acc * 100} %")

        gen_score_tensor = np.concatenate(
            [tensor_past, gen_target, tensor_future], axis=1
        )
        gen_score = self.dataset.tensor_to_score(gen_score_tensor)
        if tensor_target is not None:
            original = np.concatenate(
                [tensor_past, tensor_target, tensor_future], axis=1
            )
            original_score = self.dataset.tensor_to_score(original)
        else:
            original_score = None
        return gen_score, gen_score_tensor, original_score

    def create_empty_context(self, type: str):
        """(latent_rnn_tester.py:268-295)"""
        v = self.dataset.note2index_dicts[0]
        if type == "start":
            num_measures, symbol = 3, v[START_SYMBOL]
        elif type == "end":
            num_measures, symbol = 1, v[END_SYMBOL]
        elif type == "rest":
            num_measures, symbol = 1, v[REST]
        else:
            raise ValueError('Invalid argument "type"')
        return np.full((1, num_measures, self.measure_seq_len), symbol, np.int32)
