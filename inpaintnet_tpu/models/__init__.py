from inpaintnet_tpu.models.base import Model, flatten_params, unflatten_like
from inpaintnet_tpu.models.measure_vae import (
    Encoder,
    HierarchicalDecoder,
    SRDecoder,
    SRDecoderNoInput,
    MeasureVAE,
)
from inpaintnet_tpu.models.latent_rnn import LatentRNN, LatentRNNAblations
from inpaintnet_tpu.models.anticipation_rnn import (
    ConstraintModelGaussianReg,
    AnticipationRNNBaseline,
)
