"""Shared model/data/epoch driver for the real multi-process test
(tests/test_multiprocess.py + tests/multiprocess_vae_worker.py): both the
2-process workers and the single-process comparison run EXACTLY this code,
so any divergence is the multi-host branches, not the harness."""
import numpy as np

V, E, H, L, Z, MSL = 30, 8, 16, 2, 12, 24
TRAIN_GLOBAL_ROWS = 16  # divides the 8-way data axis -> make_global_batch
EVAL_GLOBAL_ROWS = 12  # 12 % 8 != 0 -> the indivisible-tail path
NUM_TRAIN_BATCHES = 3
NUM_EPOCHS = 2
SEED = 0


class _Dataset:
    note2index_dicts = [{f"t{i}": i for i in range(V)}]

    def __repr__(self):
        return "MultiprocFake"


class _Loader(list):
    def __init__(self, batches, batch_size):
        super().__init__(batches)
        self.batch_size = batch_size


def build_trainer():
    """Same seed everywhere -> identical init params on every process.

    rsample is neutralized (-> mean) on ALL runs being compared: the
    multi-host eval tail is padded to 16 rows while the single-host one
    stays 12, and ``jax.random.normal(key, shape)`` draws different values
    for the shared rows under different shapes — a PRNG artifact, not a
    semantic difference. Everything else (masking, feeding, collectives,
    the jitted steps) runs live."""
    from inpaintnet_tpu.models.measure_vae import MeasureVAE
    from inpaintnet_tpu.ops.distributions import DiagNormal
    from inpaintnet_tpu.train.vae_trainer import VAETrainer

    DiagNormal.rsample = lambda self, key: self.loc

    ds = _Dataset()
    model = MeasureVAE(
        ds, note_embedding_dim=E, num_encoder_layers=L,
        encoder_hidden_size=H, encoder_dropout_prob=0.0,
        latent_space_dim=Z, num_decoder_layers=L, decoder_hidden_size=H,
        decoder_dropout_prob=0.0,
    )
    return VAETrainer(ds, model, lr=1e-3, seed=SEED)


def global_batches():
    rs = np.random.RandomState(123)
    train = [
        rs.randint(0, V, (TRAIN_GLOBAL_ROWS, 1, MSL))
        for _ in range(NUM_TRAIN_BATCHES)
    ]
    evalb = [rs.randint(0, V, (EVAL_GLOBAL_ROWS, 1, MSL))]
    return train, evalb


def run_epochs(trainer, train_batches, eval_batches):
    train_loader = _Loader(
        [(b, 0) for b in train_batches], batch_size=train_batches[0].shape[0]
    )
    # nominal batch_size stays the divisible train size: the 12-global-row
    # eval batch is a TAIL batch (smaller than nominal), which is the real
    # loader shape that exercises pad_rows_to_divisible
    eval_loader = _Loader(
        [(b, 0) for b in eval_batches], batch_size=train_batches[0].shape[0]
    )
    out = {"train": [], "eval": []}
    for _ in range(NUM_EPOCHS):
        out["train"].append(
            list(trainer.loss_and_acc_on_epoch(train_loader, train=True))
        )
        out["eval"].append(
            list(trainer.loss_and_acc_on_epoch(eval_loader, train=False))
        )
    return out
