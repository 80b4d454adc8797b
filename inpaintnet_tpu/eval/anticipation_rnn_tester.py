"""AnticipationRNN tester
(reference AnticipationRNN/anticipation_rnn_tester.py:9-356)."""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from inpaintnet_tpu.train.latent_rnn_trainer import split_to_measures
from inpaintnet_tpu.train.metrics import mean_accuracy, mean_crossentropy_loss


class AnticipationRNNTester:
    def __init__(self, dataset, model, seed: int = 0):
        self.dataset = dataset
        self.model = model
        self.measure_seq_len = self.dataset.subdivision * self.dataset.num_beats_per_bar
        self.min_num_measures_target = 2
        self.max_num_measure_target = 6
        self.seed = seed
        self._np_rng = np.random.RandomState(seed + 53)
        self._inpaint = jax.jit(
            lambda params, score, md, loc, rng: self.model.apply_inpaint(
                params, score, md, loc, train=False, rng=rng
            )
        )
        self._generate = jax.jit(
            lambda params, score, md, loc, rng, temperature: self.model.generate(
                params, score, md, loc, temperature=temperature, rng=rng
            ),
            static_argnames=("temperature",),
        )

    # --- eval -------------------------------------------------------------- #
    def test_model(self, batch_size: int = 512):
        """(anticipation_rnn_tester.py:20-42)"""
        _, _, gen_test = self.dataset.data_loaders(
            batch_size=batch_size, split=(0.01, 0.01)
        )
        print("Num Test Batches: ", len(gen_test))
        mean_loss, mean_acc = self.loss_and_acc_test(gen_test)
        print("Test Epoch: 1/1")
        print(f"\tTest Loss: {mean_loss}\tTest Accuracy: {mean_acc * 100} %")
        return mean_loss, mean_acc

    def loss_and_acc_test(self, data_loader):
        """Inpainting NLL/accuracy on the unconstrained span
        (anticipation_rnn_tester.py:44-86)."""
        mean_loss, mean_acc, nb = 0.0, 0.0, 0
        key = jax.random.PRNGKey(self.seed)
        for i, batch in enumerate(data_loader):
            score, md, loc = self.process_batch_data(batch)
            logits, _ = self._inpaint(
                self.model.params, score, md, loc, jax.random.fold_in(key, i)
            )
            mask = 1 - loc
            mean_loss += float(mean_crossentropy_loss(logits, score, mask=mask))
            mean_acc += float(mean_accuracy(logits, score, mask=mask))
            nb += 1
        nb = max(nb, 1)
        return mean_loss / nb, mean_acc / nb

    def loss_and_acc_test_alt(self, data_loader):
        """Single-tick eval near the sequence midpoint
        (anticipation_rnn_tester.py:88-130)."""
        mean_loss, mean_acc, nb = 0.0, 0.0, 0
        key = jax.random.PRNGKey(self.seed)
        for i, batch in enumerate(data_loader):
            score, md, loc = self.process_batch_data(batch)
            logits = self.model.apply(
                self.model.params, score, md, loc,
                train=False, rng=jax.random.fold_in(key, i),
            )
            t = score.shape[1] // 2 + int(self._np_rng.randint(-5, 5))
            mean_loss += float(mean_crossentropy_loss(logits[:, t], score[:, t]))
            mean_acc += float(mean_accuracy(logits[:, t], score[:, t]))
            nb += 1
        nb = max(nb, 1)
        return mean_loss / nb, mean_acc / nb

    def process_batch_data(self, batch):
        score_tensor = np.asarray(batch[0])
        metadata_tensor = np.asarray(batch[1])
        loc, _, _ = self.get_constraints_location(score_tensor)
        b = score_tensor.shape[0]
        score = score_tensor.reshape(b, -1).astype(np.int32)
        md = metadata_tensor.reshape(b, score.shape[1], -1).astype(np.int32)
        return score, md, loc.reshape(b, -1).astype(np.int32)

    def get_constraints_location(
        self,
        score_tensor,
        stochastic: bool = False,
        start_measure: int = 8,
        num_measures: int = 2,
        fix_num_target: Optional[int] = None,
    ):
        """Deterministic or stochastic constraint placement
        (anticipation_rnn_tester.py:262-316; defaults start_measure=8,
        num_measures=2)."""
        m = split_to_measures(score_tensor, self.measure_seq_len)
        total = m.shape[1]
        if stochastic:
            num_measures = (
                fix_num_target
                if fix_num_target is not None
                else int(
                    self._np_rng.randint(
                        self.min_num_measures_target, self.max_num_measure_target + 1
                    )
                )
            )
            start_measure = int(self._np_rng.randint(1, total - num_measures - 1)) + 1
        loc = np.zeros_like(score_tensor)
        start_tick = start_measure * self.measure_seq_len
        end_tick = start_tick + num_measures * self.measure_seq_len
        if start_tick > 0:
            loc[..., :start_tick] = 1
        if end_tick < loc.shape[-1] - 1:
            loc[..., end_tick:] = 1
        return loc, start_tick, end_tick

    # --- generation --------------------------------------------------------- #
    def generation_test(self, temperature: float = 1.5):
        """Inpaint a random test sample (anticipation_rnn_tester.py:132-183)."""
        _, _, gen_test = self.dataset.data_loaders(batch_size=1, split=(0.70, 0.20))
        batch = next(iter(gen_test))
        score, md, loc = self.process_batch_data(batch)
        return self.generation_from_tensor(score, md, loc, temperature)

    def generation(
        self,
        tensor_score=None,
        tensor_metadata=None,
        start_measure: int = 8,
        num_measures_gen: int = 2,
        temperature: float = 1.5,
    ):
        """(anticipation_rnn_tester.py:185-243)"""
        if tensor_score is None:
            score = next(self.dataset.iterator_gen())
            st, mt = (
                self.dataset.get_score_tensor(score),
                self.dataset.get_metadata_tensor(score),
            )
            msl = self.measure_seq_len
            n = min(self.dataset.n_bars, st.shape[1] // msl)
            tensor_score = st[:, : n * msl]
            tensor_metadata = mt[: n * msl]
        score = np.asarray(tensor_score).reshape(1, -1).astype(np.int32)
        md = np.asarray(tensor_metadata).reshape(1, score.shape[1], -1).astype(np.int32)
        loc, _, _ = self.get_constraints_location(
            score[:, None, :], start_measure=start_measure, num_measures=num_measures_gen
        )
        return self.generation_from_tensor(score, md, loc.reshape(1, -1), temperature)

    def generation_from_tensor(self, score, md, loc, temperature: float = 1.5):
        _, gen = self._generate(
            self.model.params, score, md, loc,
            jax.random.PRNGKey(self.seed), temperature,
        )
        gen = np.asarray(gen)
        gen_score = self.dataset.tensor_to_score(gen[0])
        original_score = self.dataset.tensor_to_score(np.asarray(score)[0])
        return gen_score, gen, original_score
