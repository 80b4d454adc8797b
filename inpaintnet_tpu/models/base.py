"""Model base: config-addressed parameter checkpoints.

Mirrors the reference's ``utils/model.py:5-53`` contract — ``save()``,
``save_checkpoint(epoch)``, ``load()`` keyed by the model's ``__repr__``
(config-addressed filenames) — over JAX pytrees stored as ``npz`` (flat
path->array maps; no pickling). Unlike the reference, trainers can also
persist optimizer state + step for true resume (see
``train/checkpoints.py``).
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np


def flatten_params(params) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(_path_str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


def unflatten_like(template, flat: Dict[str, np.ndarray]):
    paths_and_leaves = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_and_leaves[0]:
        key = "/".join(_path_str(p) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing parameter {key!r}")
        arr = flat[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(
                f"shape mismatch for {key!r}: checkpoint {arr.shape} vs model {np.shape(leaf)}"
            )
        leaves.append(jax.numpy.asarray(arr))
    return jax.tree_util.tree_unflatten(paths_and_leaves[1], leaves)


def cast_pytree(params, dtype):
    """Cast all floating leaves to ``dtype`` (e.g. bf16 serving params —
    integer leaves untouched)."""
    import jax.numpy as jnp

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, params)


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    return str(p)


class Model:
    """Stateful wrapper over pure-functional params.

    Subclasses define ``init_params(key)`` and pure ``apply``-style methods;
    ``self.params`` holds the current pytree for the trainer/tester layer.
    """

    def __init__(self, checkpoint_dir: Optional[str] = None):
        self.params: Any = None
        self.checkpoint_dir = checkpoint_dir or os.path.join(os.getcwd(), "checkpoints")

    # --- identity ------------------------------------------------------- #
    def __repr__(self):  # overridden by subclasses
        return type(self).__name__

    @property
    def filepath(self) -> str:
        # filesystem-safe config-addressed name
        safe = re.sub(r"[^A-Za-z0-9_.,()\[\]'=-]", "_", repr(self))
        return os.path.join(self.checkpoint_dir, safe + ".npz")

    # --- init ------------------------------------------------------------ #
    def init_params(self, key):
        raise NotImplementedError

    def init(self, key):
        self.params = self.init_params(key)
        return self.params

    @property
    def num_parameters(self) -> int:
        return sum(np.size(x) for x in jax.tree_util.tree_leaves(self.params))

    # --- persistence ------------------------------------------------------ #
    @staticmethod
    def _npz(path: str) -> str:
        """np.savez appends .npz when absent; normalize so the string a
        caller passed to save() always loads back verbatim."""
        return path if path.endswith(".npz") else path + ".npz"

    def save(self, path: Optional[str] = None):
        path = self._npz(path or self.filepath)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.savez(path, **flatten_params(self.params))
        print(f"Model {repr(self)} saved")

    def save_checkpoint(self, epoch_num: int):
        base = self.filepath[:-4]  # strip .npz
        self.save(f"{base}_{epoch_num}.npz")

    def load(self, path: Optional[str] = None, cpu: bool = False):
        del cpu  # device placement is a jit concern in JAX
        path = self._npz(path or self.filepath)
        if self.params is None:
            raise RuntimeError("call init() before load() to build the param template")
        with np.load(path) as z:
            flat = {k: z[k] for k in z.files}
        self.params = unflatten_like(self.params, flat)
        print(f"Model {repr(self)} loaded")
        return self
