from inpaintnet_tpu.ops.linear import (
    linear_init,
    linear_apply,
    mlp_selu_init,
    mlp_selu_apply,
    embedding_init,
    embedding_apply,
)
from inpaintnet_tpu.ops.gru import (
    gru_init,
    gru_apply,
    gru_cell_init,
    gru_cell_apply,
)
from inpaintnet_tpu.ops.lstm import (
    lstm_cell_init,
    lstm_layer_apply,
    lstm_stack_init,
    lstm_stack_apply,
)
from inpaintnet_tpu.ops.distributions import DiagNormal, kl_diag_normal_vs_standard
from inpaintnet_tpu.ops.sampling import sample_categorical, sample_argmax
