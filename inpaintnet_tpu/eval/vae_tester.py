"""MeasureVAE tester (reference MeasureVAE/vae_tester.py:17-331):
test-set NLL/accuracy, latent interpolation, latent-space probes."""
from __future__ import annotations

import os
import jax
import jax.numpy as jnp
import numpy as np

from inpaintnet_tpu.data.dataset import FolkDatasetNBars
from inpaintnet_tpu.data.tokenizer import END_SYMBOL, START_SYMBOL
from inpaintnet_tpu.train.metrics import mean_accuracy, mean_crossentropy_loss


class VAETester:
    def __init__(self, dataset, model, seed: int = 0):
        self.dataset = dataset
        self.model = model
        self.z_dim = model.latent_space_dim
        self.measure_seq_len = 24
        self.seed = seed
        self._eval_fn = jax.jit(
            lambda params, score, rng: self.model.apply(
                params, score, train=False, rng=rng
            )[:2]
        )
        self._decode_fn = jax.jit(
            lambda params, z, rng: self.model.decoder.decode_sampling(
                params["decoder"], z, train=False, rng=rng
            )
        )
        self._encode_fn = jax.jit(
            lambda params, score: self.model.encoder.apply(
                params["encoder"], score, train=False
            )
        )

    # --- eval ------------------------------------------------------------- #
    def _measure_batch(self, score_tensor: np.ndarray) -> np.ndarray:
        if isinstance(self.dataset, FolkDatasetNBars):
            b = score_tensor.shape[0]
            return score_tensor.reshape(b * self.dataset.n_bars, -1).astype(np.int32)
        return score_tensor.reshape(score_tensor.shape[0], -1).astype(np.int32)

    def test_model(self, batch_size: int = 64):
        """(vae_tester.py:34-49)"""
        _, _, gen_test = self.dataset.data_loaders(
            batch_size=batch_size, split=(0.01, 0.01)
        )
        print("Num Test Batches: ", len(gen_test))
        mean_loss, mean_acc = self.loss_and_acc_test(gen_test)
        print("Test Epoch:")
        print("\tTest Loss: ", mean_loss, "\n\tTest Accuracy: ", mean_acc * 100)
        return mean_loss, mean_acc

    def loss_and_acc_test(self, data_loader):
        """Reconstruction NLL + accuracy (vae_tester.py:114-155)."""
        mean_loss, mean_acc, nb = 0.0, 0.0, 0
        key = jax.random.PRNGKey(self.seed)
        for i, batch in enumerate(data_loader):
            score = self._measure_batch(np.asarray(batch[0]))
            weights, _ = self._eval_fn(
                self.model.params, score, jax.random.fold_in(key, i)
            )
            mean_loss += float(mean_crossentropy_loss(weights, score))
            mean_acc += float(mean_accuracy(weights, score))
            nb += 1
        nb = max(nb, 1)
        return mean_loss / nb, mean_acc / nb

    def loss_and_acc_test_alt(self, data_loader):
        """Per-measure-grouped variant via apply_test (vae_tester.py:157-194)."""
        mean_loss, mean_acc, nb = 0.0, 0.0, 0
        key = jax.random.PRNGKey(self.seed)
        for i, batch in enumerate(data_loader):
            score = np.asarray(batch[0])
            b = score.shape[0]
            score = score.reshape(b, -1, 24).astype(np.int32)
            weights, _ = self.model.apply_test(
                self.model.params, score, rng=jax.random.fold_in(key, i)
            )
            mean_loss += float(mean_crossentropy_loss(weights, score))
            mean_acc += float(mean_accuracy(weights, score))
            nb += 1
        nb = max(nb, 1)
        return mean_loss / nb, mean_acc / nb

    # --- interpolation ------------------------------------------------------ #
    def decode_mid_point(self, z1, z2, n: int):
        """(vae_tester.py:72-93): decode z1, n interpolants, z2 and
        concatenate -> (1, (n+2)*24) token tensor."""
        assert n >= 1 and isinstance(n, int)
        alphas = jnp.arange(0, n + 2) / (n + 1)
        zs = z1[None, :] * (1 - alphas[:, None]) + z2[None, :] * alphas[:, None]
        _, samples = self._decode_fn(self.model.params, zs, jax.random.PRNGKey(0))
        return np.asarray(samples).reshape(1, -1)

    def test_interpolation(self, tensor_score1, tensor_score2, n: int = 1):
        """(vae_tester.py:95-112): encode means, decode the interpolation
        path, return the stitched Score."""
        z1 = self._encode_fn(self.model.params, jnp.asarray(tensor_score1)).loc[0]
        z2 = self._encode_fn(self.model.params, jnp.asarray(tensor_score2)).loc[0]
        tensor = self.decode_mid_point(z1, z2, n)
        return self.dataset.tensor_to_score(tensor)

    def test_interp(self, n: int = 10):
        """(vae_tester.py:51-70) with a seeded pick instead of randint."""
        _, gen_val, gen_test = self.dataset.data_loaders(
            batch_size=1, split=(0.01, 0.5)
        )
        s1 = self._measure_batch(np.asarray(next(iter(gen_test))[0]))[:1]
        s2 = self._measure_batch(np.asarray(next(iter(gen_val))[0]))[:1]
        return self.test_interpolation(s1, s2, n)

    # --- latent-space probes ------------------------------------------------- #
    def encode_test_set(self, batch_size: int = 64, num_batches: int = 6,
                        attribute: str = "num_notes"):
        """Latent means + attribute values over test batches
        (vae_tester.py:196-246)."""
        _, _, gen_test = self.dataset.data_loaders(
            batch_size=batch_size, split=(0.70, 0.20)
        )
        z_all, n_all = [], []
        start_idx = self.dataset.note2index_dicts[0][START_SYMBOL]
        end_idx = self.dataset.note2index_dicts[0][END_SYMBOL]
        for i, batch in enumerate(gen_test):
            if i > num_batches:
                break
            score = self._measure_batch(np.asarray(batch[0]))
            z = np.asarray(self._encode_fn(self.model.params, score).loc)
            if attribute == "num_notes":
                attr = np.asarray(self.dataset.get_num_notes_in_measure(score))
            elif attribute == "note_range":
                attr = np.asarray(self.dataset.get_note_range_of_measure(score))
            elif attribute == "rhy_entropy":
                attr = np.asarray(self.dataset.get_rhythmic_entropy(score))
            elif attribute == "beat_strength":
                attr = np.asarray(self.dataset.get_beat_strength(score))
            else:
                raise ValueError("Invalid attribute type")
            attr = attr.copy()
            attr[score[:, 0] == start_idx] = -0.1
            attr[score[:, 0] == end_idx] = -0.2
            z_all.append(z)
            n_all.append(attr)
        return np.concatenate(z_all), np.concatenate(n_all)

    def plot_attribute_dist(self, attribute="num_notes", plt_type="pca",
                            out_dir="plots"):
        """(vae_tester.py:196-254) PCA/t-SNE scatter saved to disk."""
        z_all, n_all = self.encode_test_set(attribute=attribute)
        os.makedirs(out_dir, exist_ok=True)
        filename = os.path.join(
            out_dir, f"{plt_type}_{attribute}_measure_vae.png"
        )
        self._plot_projection(z_all, n_all, filename, plt_type)
        return filename

    def plot_transposition_points(self, plt_type="pca", out_dir="plots"):
        """(vae_tester.py:256-295)"""
        score = next(self.dataset.iterator_gen())
        z_all, n_all = [], []
        for semi in self.dataset.all_transposition_intervals(score):
            st, _ = self.dataset.transposed_score_and_metadata_tensors(score, semi)
            measures = self.dataset.split_score_tensor_to_measures(st)
            z = np.asarray(self._encode_fn(self.model.params, measures).loc)
            z_all.append(z)
            n_all.append(np.arange(z.shape[0]))
        z_all, n_all = np.concatenate(z_all), np.concatenate(n_all)
        os.makedirs(out_dir, exist_ok=True)
        filename = os.path.join(out_dir, f"{plt_type}_transposition_measure_vae.png")
        self._plot_projection(z_all, n_all, filename, plt_type)
        return filename

    @staticmethod
    def _plot_projection(data, target, filename, plt_type="pca"):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        if plt_type == "pca":
            from sklearn.decomposition import PCA

            proj = PCA(n_components=2, whiten=False).fit_transform(data)
        elif plt_type == "tsne":
            from sklearn.manifold import TSNE

            proj = TSNE(
                n_components=2, perplexity=min(40, max(5, len(data) // 4))
            ).fit_transform(data)
        else:
            raise ValueError("Invalid plot type")
        plt.figure()
        plt.scatter(x=proj[:, 0], y=proj[:, 1], c=target, cmap="viridis", alpha=0.3)
        plt.colorbar()
        plt.savefig(filename, format="png", dpi=150)
        plt.close()
