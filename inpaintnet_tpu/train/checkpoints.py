"""Training-state checkpoints: params + optimizer state + step.

The reference "resume" reloads weights only (utils/model.py:16-53 — no
optimizer state is ever saved); here the Adam moments and step counter
persist too, stored as flat npz alongside the model checkpoint.
"""
from __future__ import annotations

import os
from typing import Any, Tuple

import numpy as np

from inpaintnet_tpu.models.base import flatten_params, unflatten_like


def save_train_state(path: str, params, opt_state, step: int):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {}
    for k, v in flatten_params(params).items():
        flat["p/" + k] = v
    for k, v in flatten_params(opt_state).items():
        flat["o/" + k] = v
    flat["step"] = np.asarray(step)
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)


def load_train_state(path: str, params_template, opt_state_template) -> Tuple[Any, Any, int]:
    real = path if path.endswith(".npz") else path + ".npz"
    with np.load(real) as z:
        flat = {k: z[k] for k in z.files}
    p_flat = {k[2:]: v for k, v in flat.items() if k.startswith("p/")}
    o_flat = {k[2:]: v for k, v in flat.items() if k.startswith("o/")}
    params = unflatten_like(params_template, p_flat)
    opt_state = unflatten_like(opt_state_template, o_flat)
    return params, opt_state, int(flat["step"])
