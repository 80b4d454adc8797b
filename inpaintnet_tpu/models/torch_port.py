"""Reference (PyTorch) checkpoint -> framework pytree conversion.

The reference ships ``state_dict`` checkpoints keyed by torch module paths
(``utils/model.py:16-53``). These converters map them weight-for-weight onto
this framework's param pytrees so reference-trained models can be evaluated
for NLL parity. Layout rules:

- torch ``nn.Linear.weight`` is (out, in); ours is (in, out)  -> transpose.
- torch GRU/LSTM ``weight_ih_l{k}[_reverse]`` is (3H|4H, in)  -> transpose;
  gate order is preserved (our cells use torch order [r,z,n] / [i,f,g,o]).
- ``nn.Embedding.weight`` maps directly.

Accepts either a live ``state_dict()`` of torch tensors or a dict of numpy
arrays (e.g. loaded from a converted npz).
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    # always COPY: ``tensor.numpy()`` returns a view of the torch storage
    # (and CPU jax can zero-copy-alias numpy buffers), so without a copy a
    # later torch-side ``optimizer.step()`` would silently mutate the ported
    # params in place
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy().copy()
    return np.array(x, copy=True)


def _linear(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "w": _np(sd[f"{prefix}.weight"]).T,
        "b": _np(sd[f"{prefix}.bias"]),
    }


def _mlp_selu(sd: Mapping, prefix: str) -> Dict:
    # torch nn.Sequential(Linear, SELU, Linear) -> indices 0 and 2
    return {"l1": _linear(sd, f"{prefix}.0"), "l2": _linear(sd, f"{prefix}.2")}


def _embedding(sd: Mapping, prefix: str) -> Dict:
    return {"table": _np(sd[f"{prefix}.weight"])}


def _gru(sd: Mapping, prefix: str, num_layers: int, bidirectional: bool):
    num_dirs = 2 if bidirectional else 1
    layers = []
    for layer in range(num_layers):
        dirs = []
        for d in range(num_dirs):
            sfx = f"_l{layer}" + ("_reverse" if d == 1 else "")
            dirs.append(
                {
                    "w_ih": _np(sd[f"{prefix}.weight_ih{sfx}"]).T,
                    "w_hh": _np(sd[f"{prefix}.weight_hh{sfx}"]).T,
                    "b_ih": _np(sd[f"{prefix}.bias_ih{sfx}"]),
                    "b_hh": _np(sd[f"{prefix}.bias_hh{sfx}"]),
                }
            )
        layers.append(dirs)
    return layers


def _lstm_list(sd: Mapping, prefix: str, num_layers: int):
    """Reference per-layer ``ModuleList`` of 1-layer LSTMs
    (anticipation_rnn_gauss_reg_model.py:110-133)."""
    return [
        {
            "w_ih": _np(sd[f"{prefix}.{k}.weight_ih_l0"]).T,
            "w_hh": _np(sd[f"{prefix}.{k}.weight_hh_l0"]).T,
            "b_ih": _np(sd[f"{prefix}.{k}.bias_ih_l0"]),
            "b_hh": _np(sd[f"{prefix}.{k}.bias_hh_l0"]),
        }
        for k in range(num_layers)
    ]


def port_encoder(sd: Mapping, num_layers: int = 2) -> Dict:
    """Reference MeasureVAE Encoder (encoder.py:9-134) state_dict subtree
    (keys prefixed ``encoder.``) -> our Encoder params."""
    return {
        "embedding": _embedding(sd, "encoder.note_embedding_layer"),
        "gru": _gru(sd, "encoder.lstm", num_layers, bidirectional=True),
        "mean_head": _mlp_selu(sd, "encoder.linear_mean"),
        "log_std_head": _mlp_selu(sd, "encoder.linear_log_std"),
    }


def port_hierarchical_decoder(sd: Mapping, num_layers: int = 2) -> Dict:
    """(decoder.py:313-377)"""
    return {
        "embedding": _embedding(sd, "decoder.note_embedding_layer"),
        "z_to_beat_hidden": _linear(sd, "decoder.z_to_beat_rnn_input.0"),
        "b_0": _np(sd["decoder.b_0"]),
        "beat_gru": _gru(sd, "decoder.rnn_beat", num_layers, False),
        "beat_to_tick_hidden": _linear(sd, "decoder.beat_emb_to_tick_rnn_hidden.0"),
        "beat_to_tick_input": _linear(sd, "decoder.beat_emb_to_tick_rnn_input.0"),
        "x_0": _np(sd["decoder.x_0"]),
        "tick_gru": _gru(sd, "decoder.rnn_tick", num_layers, False),
        "head": _linear(sd, "decoder.tick_emb_to_note_emb.0"),
    }


def port_measure_vae(sd: Mapping, num_encoder_layers: int = 2,
                     num_decoder_layers: int = 2) -> Dict:
    return {
        "encoder": port_encoder(sd, num_encoder_layers),
        "decoder": port_hierarchical_decoder(sd, num_decoder_layers),
    }


def port_latent_rnn(sd: Mapping, num_layers: int = 2, auto_reg: bool = False) -> Dict:
    """(latent_rnn.py:53-84); the nested frozen VAE lives under
    ``vae_model.`` and is ported separately via ``port_measure_vae``."""
    params = {
        "context_rnn_past": _gru(sd, "context_rnn_past", num_layers, True),
        "context_rnn_future": _gru(sd, "context_rnn_future", num_layers, True),
        "generation_rnn": _gru(sd, "generation_rnn", num_layers, True),
        "generation_linear": _linear(sd, "generation_linear"),
    }
    if not auto_reg:
        params["x_0"] = _np(sd["x_0"])
    return params


def port_anticipation_rnn(sd: Mapping, num_layers: int = 1,
                          num_metadata: int = 3) -> Dict:
    """(anticipation_rnn_gauss_reg_model.py:74-140); single voice."""
    return {
        "note_embedding": _embedding(sd, "note_embeddings.0"),
        "lstm_constraint": _lstm_list(sd, "lstm_constraint", num_layers),
        "lstm_generation": _lstm_list(sd, "lstm_generation", num_layers),
        "linear_1": _linear(sd, "linear_1"),
        "linear_output_notes": _linear(sd, "linear_ouput_notes.0"),  # [sic]
        "metadata_embeddings": [
            _embedding(sd, f"metadata_embeddings.{i}") for i in range(num_metadata)
        ],
    }


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch ``state_dict`` file into numpy arrays (CPU)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    return {k: _np(v) for k, v in sd.items()}
