"""Device-mesh utilities: the framework's parallelism substrate.

The reference is single-device (only ``.cuda()`` placement,
utils/helpers.py:5-26, no torch.distributed anywhere). Here every train/eval
step is a jitted SPMD program over a ``jax.sharding.Mesh``:

- axis ``"data"``: batch sharding — gradient all-reduce is inserted by XLA
  as a psum over ICI; this is the scaling axis that matters at these model
  sizes.
- axis ``"model"``: reserved tensor-parallel axis. ``shard_params`` can
  shard the large GRU weight matrices (3H gate dim) over it; with
  ``model=1`` (the default) annotations are no-ops, but the same program
  dryruns/compiles at model>1 so scaling out is a mesh-shape change, not a
  code change.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("data", "model") mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} mesh != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree onto the mesh, batch-axis sharded.

    A batch whose leading dim doesn't divide the data axis (tail eval
    batches) is placed replicated instead — every device then computes the
    full batch redundantly, which is correct and only wastes work on the
    (rare) remainder batch. The fallback warns once per process so a
    persistently-misdividing batch size can't silently serialize a pod."""
    data_axis = mesh.shape["data"]
    leaves = jax.tree_util.tree_leaves(batch)
    divisible = all(x.shape[0] % data_axis == 0 for x in leaves)
    if not divisible:
        import warnings

        warnings.warn(
            f"batch leading dim {leaves[0].shape[0]} does not divide the "
            f"{data_axis}-way data axis; replicating this batch on every "
            "device (correct but redundant — expected only for tail "
            "batches)",
            stacklevel=2,
        )
    sh = batch_sharding(mesh) if divisible else replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def local_batch_size(mesh: Mesh, global_batch: int) -> int:
    """Rows THIS process must supply for a ``global_batch``-row step."""
    if global_batch % jax.process_count() != 0:
        raise ValueError(
            f"global batch {global_batch} must divide the "
            f"{jax.process_count()} processes"
        )
    return global_batch // jax.process_count()


def make_global_batch(mesh: Mesh, local_batch):
    """Multi-host input feeding: assemble a globally-sharded batch from
    process-local rows.

    Each process passes only ITS rows (``local_batch_size`` of the global
    batch); ``jax.make_array_from_process_local_data`` places them on the
    process's addressable shard of the "data" axis — no host ever
    materializes the global batch (SURVEY §2 comm-backend row; the
    reference is single-process so this surface is new). Single-process
    this is exactly ``shard_batch`` on a divisible batch.

    :param local_batch: pytree of numpy arrays, leading dim = local rows
    :return: pytree of global jax.Arrays sharded over the "data" axis
    """
    sh = batch_sharding(mesh)
    nproc = jax.process_count()
    data_axis = mesh.shape["data"]

    def put(x):
        x = np.asarray(x)
        global_rows = x.shape[0] * nproc
        if global_rows % data_axis:
            raise ValueError(
                f"global batch {global_rows} ({x.shape[0]} local rows x "
                f"{nproc} processes) does not divide the {data_axis}-way "
                "data axis; multi-host batches cannot fall back to "
                "replication (no process holds the global rows) — drop or "
                "pad the tail instead"
            )
        global_shape = (global_rows,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sh, x, global_shape)

    return jax.tree_util.tree_map(put, local_batch)


def pad_rows_to_divisible(batch, data_axis: int, process_count: int):
    """Pad a process-local batch's leading dim so the GLOBAL row count
    divides the data axis, and return the per-row validity mask.

    Multi-host tail batches cannot fall back to replication (no process
    holds the global rows), so eval pads instead: every process zero-pads
    its local rows to the smallest count whose global total divides the
    mesh, and losses mask the pad rows out (masked batch mean over real
    rows == the unpadded batch mean, so epoch aggregation matches the
    single-host "eval loaders keep tails" semantics exactly).

    :param batch: pytree of numpy arrays, equal leading dim = local rows
    :param data_axis: mesh "data" axis size
    :param process_count: number of feeding processes
    :return: (padded batch, row_mask (padded_rows,) float32 1=real) —
        the input batch and ``None`` if already divisible
    """
    import math

    leaves = jax.tree_util.tree_leaves(batch)
    rows = leaves[0].shape[0]
    if (rows * process_count) % data_axis == 0:
        return batch, None
    # r' * P % D == 0  <=>  r' % (D / gcd(D, P)) == 0
    step = data_axis // math.gcd(data_axis, process_count)
    padded_rows = ((rows + step - 1) // step) * step

    def pad(x):
        x = np.asarray(x)
        return np.concatenate(
            [x, np.zeros((padded_rows - rows,) + x.shape[1:], dtype=x.dtype)]
        )

    row_mask = np.zeros(padded_rows, dtype=np.float32)
    row_mask[:rows] = 1.0
    return jax.tree_util.tree_map(pad, batch), row_mask


def _is_gate_matrix(path_str: str, x) -> bool:
    return (
        x.ndim == 2
        and ("w_ih" in path_str or "w_hh" in path_str or "w" == path_str.split("/")[-1])
        and x.shape[-1] % 128 == 0
    )


def shard_params(mesh: Mesh, params):
    """Tensor-parallel placement: shard the output (gate) dimension of
    large RNN/linear weight matrices over the "model" axis; everything else
    replicated. With model=1 this is pure replication."""
    if mesh.shape.get("model", 1) == 1:
        return replicate(mesh, params)

    flat = jax.tree_util.tree_flatten_with_path(params)
    treedef = flat[1]
    leaves = []
    for path, x in flat[0]:
        path_str = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if hasattr(x, "ndim") and _is_gate_matrix(path_str, x):
            spec = P(None, "model")
        else:
            spec = P()
        leaves.append(jax.device_put(x, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, leaves)
