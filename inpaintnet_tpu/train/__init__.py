from inpaintnet_tpu.train.trainer import Trainer, EarlyStopping
from inpaintnet_tpu.train.vae_trainer import VAETrainer
from inpaintnet_tpu.train.latent_rnn_trainer import (
    LatentRNNTrainer,
    split_score,
    split_to_measures,
    pack_padded,
)
from inpaintnet_tpu.train.arnn_trainer import (
    AnticipationRNNGaussianRegTrainer,
    AnticipationRNNBaselineTrainer,
)
from inpaintnet_tpu.train.checkpoints import save_train_state, load_train_state
