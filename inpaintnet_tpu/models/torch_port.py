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


# --------------------------------------------------------------------------- #
# Export direction: framework pytree -> reference-format ``state_dict``.
#
# Exact inverses of the port_* converters above (same key sets the reference
# modules produce, so ``ref_module.load_state_dict(sd, strict=True)``
# succeeds), letting models trained here be loaded back into the reference
# implementation. Floating weights are emitted as float32 contiguous numpy
# (the reference era's torch has no bfloat16 CPU kernels).
# --------------------------------------------------------------------------- #


def _out(x) -> np.ndarray:
    a = np.asarray(x)
    if np.issubdtype(a.dtype, np.floating) and a.dtype != np.float32:
        a = a.astype(np.float32)
    return np.ascontiguousarray(a)


def _export_linear(p: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {f"{prefix}.weight": _out(p["w"]).T.copy(),
            f"{prefix}.bias": _out(p["b"])}


def _export_mlp_selu(p: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {**_export_linear(p["l1"], f"{prefix}.0"),
            **_export_linear(p["l2"], f"{prefix}.2")}


def _export_embedding(p: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {f"{prefix}.weight": _out(p["table"])}


def _export_gru(layers, prefix: str) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    for layer, dirs in enumerate(layers):
        for d, p in enumerate(dirs):
            sfx = f"_l{layer}" + ("_reverse" if d == 1 else "")
            sd[f"{prefix}.weight_ih{sfx}"] = _out(p["w_ih"]).T.copy()
            sd[f"{prefix}.weight_hh{sfx}"] = _out(p["w_hh"]).T.copy()
            sd[f"{prefix}.bias_ih{sfx}"] = _out(p["b_ih"])
            sd[f"{prefix}.bias_hh{sfx}"] = _out(p["b_hh"])
    return sd


def _export_lstm_list(layers, prefix: str) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    for k, p in enumerate(layers):
        sd[f"{prefix}.{k}.weight_ih_l0"] = _out(p["w_ih"]).T.copy()
        sd[f"{prefix}.{k}.weight_hh_l0"] = _out(p["w_hh"]).T.copy()
        sd[f"{prefix}.{k}.bias_ih_l0"] = _out(p["b_ih"])
        sd[f"{prefix}.{k}.bias_hh_l0"] = _out(p["b_hh"])
    return sd


def export_encoder(params: Mapping) -> Dict[str, np.ndarray]:
    """Inverse of :func:`port_encoder` (keys prefixed ``encoder.``)."""
    return {
        **_export_embedding(params["embedding"], "encoder.note_embedding_layer"),
        **_export_gru(params["gru"], "encoder.lstm"),
        **_export_mlp_selu(params["mean_head"], "encoder.linear_mean"),
        **_export_mlp_selu(params["log_std_head"], "encoder.linear_log_std"),
    }


def export_hierarchical_decoder(params: Mapping) -> Dict[str, np.ndarray]:
    """Inverse of :func:`port_hierarchical_decoder` (``decoder.`` keys)."""
    return {
        **_export_embedding(params["embedding"], "decoder.note_embedding_layer"),
        **_export_linear(params["z_to_beat_hidden"], "decoder.z_to_beat_rnn_input.0"),
        "decoder.b_0": _out(params["b_0"]),
        **_export_gru(params["beat_gru"], "decoder.rnn_beat"),
        **_export_linear(params["beat_to_tick_hidden"],
                         "decoder.beat_emb_to_tick_rnn_hidden.0"),
        **_export_linear(params["beat_to_tick_input"],
                         "decoder.beat_emb_to_tick_rnn_input.0"),
        "decoder.x_0": _out(params["x_0"]),
        **_export_gru(params["tick_gru"], "decoder.rnn_tick"),
        **_export_linear(params["head"], "decoder.tick_emb_to_note_emb.0"),
    }


def export_measure_vae(params: Mapping) -> Dict[str, np.ndarray]:
    return {
        **export_encoder(params["encoder"]),
        **export_hierarchical_decoder(params["decoder"]),
    }


def export_latent_rnn(params: Mapping, vae_params: Mapping = None) -> Dict[str, np.ndarray]:
    """Inverse of :func:`port_latent_rnn`. The reference LatentRNN holds
    its frozen VAE as a submodule, so its ``state_dict`` includes
    ``vae_model.*`` keys — pass ``vae_params`` to emit them (required for
    ``strict=True`` loading into the reference class)."""
    sd = {
        **_export_gru(params["context_rnn_past"], "context_rnn_past"),
        **_export_gru(params["context_rnn_future"], "context_rnn_future"),
        **_export_gru(params["generation_rnn"], "generation_rnn"),
        **_export_linear(params["generation_linear"], "generation_linear"),
    }
    if "x_0" in params:
        sd["x_0"] = _out(params["x_0"])
    if vae_params is not None:
        sd.update({f"vae_model.{k}": v
                   for k, v in export_measure_vae(vae_params).items()})
    return sd


def export_anticipation_rnn(params: Mapping) -> Dict[str, np.ndarray]:
    """Inverse of :func:`port_anticipation_rnn` (single voice)."""
    return {
        **_export_embedding(params["note_embedding"], "note_embeddings.0"),
        **_export_lstm_list(params["lstm_constraint"], "lstm_constraint"),
        **_export_lstm_list(params["lstm_generation"], "lstm_generation"),
        **_export_linear(params["linear_1"], "linear_1"),
        **_export_linear(params["linear_output_notes"], "linear_ouput_notes.0"),  # [sic]
        **{k: v for i, emb in enumerate(params["metadata_embeddings"])
           for k, v in _export_embedding(emb, f"metadata_embeddings.{i}").items()},
    }


def save_torch_checkpoint(sd: Mapping, path: str) -> None:
    """Write a reference-loadable ``state_dict`` file (torch.save of CPU
    float32 tensors — the reference's ``Model.load`` maps straight in)."""
    import torch

    # copy=True: jax-backed arrays are non-writable and torch.from_numpy
    # would warn (and alias storage it must not mutate)
    torch.save({k: torch.from_numpy(np.array(v, copy=True))
                for k, v in sd.items()}, path)
