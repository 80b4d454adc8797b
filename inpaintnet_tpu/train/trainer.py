"""Trainer base class — the reference's training harness, rebuilt around one
jitted SPMD train step.

API mirrors ``utils/trainer.py:16-269``:
``Trainer(dataset, model, lr, early_stopping)`` +
``train_model(batch_size, num_epochs, plot, log)`` with per-epoch
train/val passes, stdout stats, a model save every epoch and a numbered
checkpoint every 10 epochs, optional early stopping.

Redesigned internals:
- subclasses implement ``process_batch_data`` (host-side numpy prep:
  stochastic splits, constraint masks) and the PURE ``loss_and_metrics``
  (params, batch, rng, train) -> (loss, {"accuracy": ...}); the base class
  jits one (grad + adam-update) step and one eval step over the device
  mesh — batch sharded on the "data" axis, params replicated, gradient
  all-reduce compiled in by XLA;
- optimizer state persists with the model (true resume — the reference
  saves weights only, utils/model.py:16-53);
- logging goes to stdout + an optional JSONL metrics file (replacing
  tensorboard_logger / live matplotlib).
"""
from __future__ import annotations

import json
import os
import time
import warnings
from abc import ABC, abstractmethod
from typing import Optional

import jax
import numpy as np
import optax

from inpaintnet_tpu.parallel.mesh import (
    make_global_batch,
    make_mesh,
    pad_rows_to_divisible,
    replicate,
    shard_batch,
)
from inpaintnet_tpu.train import metrics as M
from inpaintnet_tpu.train.checkpoints import load_train_state, save_train_state
from inpaintnet_tpu.utils.rng import RngStream


class EarlyStopping:
    """(reference utils/trainer.py:379-413, semantics preserved incl. the
    'improvement < 1e-5 still counts toward patience' detail)."""

    def __init__(self, patience: int = 5, verbose: bool = False):
        self.patience = patience
        self.verbose = verbose
        self.counter = 0
        self.best_score = None
        self.early_stop = False
        self.val_loss_min = np.inf

    def __call__(self, val_loss, model=None):
        score = -val_loss
        if self.best_score is None:
            self.best_score = score
        elif score <= self.best_score:
            self.counter += 1
            if self.counter >= self.patience:
                self.early_stop = True
        else:
            if score - self.best_score < 1e-5:
                self.counter += 1
                if self.counter >= self.patience:
                    self.early_stop = True
            else:
                self.best_score = score
                self.val_loss_min = val_loss
                self.counter = 0


class Trainer(ABC):
    # static loss/metric library (reference exposes these as staticmethods)
    mean_crossentropy_loss = staticmethod(M.mean_crossentropy_loss)
    mean_accuracy = staticmethod(M.mean_accuracy)
    mean_crossentropy_loss_alt = staticmethod(M.mean_crossentropy_loss_alt)
    mean_accuracy_alt = staticmethod(M.mean_accuracy_alt)
    mean_l1_loss_rnn = staticmethod(M.mean_l1_loss)
    mean_mse_loss_rnn = staticmethod(M.mean_mse_loss)

    def __init__(
        self,
        dataset,
        model,
        lr: float = 1e-4,
        early_stopping: bool = False,
        seed: int = 0,
        mesh=None,
        debug: bool = False,
        compute_dtype: Optional[str] = None,
    ):
        self.dataset = dataset
        self.model = model
        self.lr = lr
        # debug=True sweeps params for NaN/Inf once per epoch — the
        # jit-compatible equivalent of the reference's per-forward NaN check
        # (encoder.py:111-116)
        self.debug = debug
        # mixed precision: compute_dtype="bfloat16" casts params to bf16
        # inside the loss (activations follow), while master params and the
        # Adam state stay fp32 — ~2-4x MXU throughput, no loss scaling
        # needed for bf16
        self.compute_dtype = compute_dtype
        self.optimizer = optax.adam(lr)
        self.early_stopping = bool(early_stopping)
        if early_stopping:
            self.early_stopper = EarlyStopping()
        self.rng = RngStream(seed)
        # per-STEP keys: the TPU hardware RNG (rbg) by default on TPU —
        # threefry key derivation inside the jitted step (the splits and
        # fold_ins feeding dropout masks, rsample noise, the TF coin)
        # costs real step time at the flagship VAE shape (79.0 -> 69.0
        # ms/step, 1.146x; PERFORMANCE.md "Training recurrence A/B").
        # Param INIT above stays threefry so seeded init draws are
        # backend-independent; INPAINTNET_TRAIN_RNG=threefry opts out,
        # and on CPU step_rng IS self.rng (identical key sequence, so
        # seeded CPU runs and tests are byte-stable across this change).
        step_impl = os.environ.get("INPAINTNET_TRAIN_RNG") or (
            "rbg" if jax.default_backend() == "tpu" else "threefry"
        )
        self.step_rng = (
            self.rng if step_impl == "threefry"
            else RngStream(seed, impl=step_impl)
        )
        self.seed = seed
        self.mesh = mesh if mesh is not None else make_mesh()
        # training-forward recurrence impl (gru_impl_scope around the
        # loss + value_and_grad): None = global default.
        # INPAINTNET_TRAIN_GRU_IMPL overrides ("xla" to opt out); else
        # each trainer family picks its measured winner
        # (default_train_gru_impl, which may consult self.mesh) —
        # decided by the bench_training A/B.
        self.train_gru_impl = os.environ.get(
            "INPAINTNET_TRAIN_GRU_IMPL"
        ) or self.default_train_gru_impl()
        self.epoch = 0
        self._train_step = None
        self._eval_step = None
        if self.model.params is None:
            self.model.init(self.rng.next())
        self.opt_state = self.optimizer.init(self.trainable_params(self.model.params))

    # --- subclass surface -------------------------------------------------- #
    @abstractmethod
    def process_batch_data(self, batch):
        """Host-side batch prep: returns a pytree of numpy arrays."""

    @abstractmethod
    def loss_and_metrics(self, params, batch_data, rng, train: bool, extra=None,
                         row_mask=None):
        """PURE loss: (scalar loss, {"accuracy": scalar or None}).

        ``row_mask`` (optional (B,) float, 1 = real row) marks zero-padded
        rows appended by the multi-host eval-tail path; implementations
        must exclude masked rows so the batch mean equals the unpadded
        batch's mean."""

    def update_scheduler(self, epoch_num: int):
        """LR schedule hook (no-op like reference vae_trainer.py:57-63)."""

    def default_train_gru_impl(self):
        """Per-family training-recurrence default (override; None = the
        global default scan). Decided by the measured bench_training A/B
        at each family's flagship shape — see docs/PERFORMANCE.md."""
        return None

    def trainable_params(self, params):
        """Override to exclude frozen sub-trees from optimization."""
        return params

    def merge_params(self, params, trained):
        """Inverse of ``trainable_params``."""
        return trained

    def extra_params(self):
        """Frozen auxiliary params passed alongside the batch (e.g. the
        frozen MeasureVAE inside LatentRNN). Constant w.r.t. the optimizer
        but an explicit jit argument so they stay device-resident without
        bloating the compiled program with constants."""
        return None

    def _fit_mesh_to_batch_size(self, batch: int):
        """Shrink the data axis to the largest divisor of the batch size so
        small (test/debug) batches still run; full-size batches keep the
        full mesh. Shrinking idles devices, so it WARNS loudly — and fails
        under ``INPAINTNET_STRICT_MESH=1`` — rather than silently wasting
        most of a pod on an awkward batch size."""
        import math

        data_axis = self.mesh.shape["data"]
        # loaders yield PROCESS-LOCAL rows; the sharded dimension is global
        global_batch = batch * jax.process_count()
        if global_batch % data_axis == 0:
            return
        model_axis = self.mesh.shape.get("model", 1)
        if jax.process_count() > 1:
            # a shrunk mesh would be built from jax.devices()[:n], which
            # spans only the first processes' devices — never valid
            raise ValueError(
                f"global batch {global_batch} ({batch} rows x "
                f"{jax.process_count()} processes) must divide the "
                f"{data_axis}-way data axis in a multi-host run"
            )
        new_data = math.gcd(global_batch, data_axis)
        msg = (
            f"batch size {global_batch} does not divide the {data_axis}-way "
            f"data axis; shrinking the mesh to {new_data}x{model_axis} — "
            f"{(data_axis - new_data) * model_axis} device(s) will idle. "
            f"Pick a batch size divisible by {data_axis} to use the full "
            "mesh."
        )
        if os.environ.get("INPAINTNET_STRICT_MESH", "0") == "1":
            raise ValueError(msg)
        warnings.warn(msg, stacklevel=2)
        self.mesh = make_mesh(
            num_devices=new_data * model_axis, data=new_data, model=model_axis
        )
        # the recurrence default may consult the mesh
        if not os.environ.get("INPAINTNET_TRAIN_GRU_IMPL"):
            self.train_gru_impl = self.default_train_gru_impl()
        # the shard_map train step closes over the mesh — rebuild steps
        self._train_step = self._eval_step = None

    # --- jitted steps -------------------------------------------------------- #
    def _use_shard_map_train(self) -> bool:
        """Pallas kernels lower to custom calls GSPMD cannot partition, so
        on a multi-device mesh a kernel-bearing train step must run under
        an explicit ``jax.shard_map`` — each device traces the WHOLE
        program (kernels included) on its local batch rows, exactly like
        the serving layer's mesh path (serve.py ``_shard_mapped``).

        On TPU the wrapper is used even on a SINGLE-device mesh: measured
        1.095x faster than the plain GSPMD-jitted step at the flagship
        VAE shape (86.7 -> 79.2 ms/step — benchmarks/bench_shardmap_train
        .py, A/B interleaved), i.e. the explicit formulation is free-to-
        negative-cost, so multi-chip and single-chip share one code path.
        CPU keeps the plain jit at size 1 (kernel gates are TPU-only and
        the tiny-shape tests pin exact jit-path math)."""
        import jax

        if self.train_gru_impl is None or "pallas" not in str(
            self.train_gru_impl
        ) or self.mesh is None:
            return False
        return (
            self.mesh.devices.size > 1 or jax.default_backend() == "tpu"
        )

    def _build_steps(self):
        optimizer = self.optimizer

        compute_dtype = self.compute_dtype

        def maybe_cast(tree):
            if compute_dtype is None:
                return tree
            from inpaintnet_tpu.models.base import cast_pytree
            import jax.numpy as jnp

            return cast_pytree(tree, jnp.dtype(compute_dtype))

        from inpaintnet_tpu.ops.gru import gru_impl_scope

        def value_and_grads(params, trainable, batch_data, rng, extra):
            # frozen auxiliaries (e.g. LatentRNN's frozen VAE — the
            # dominant compute) follow the compute dtype too
            extra = maybe_cast(extra) if extra is not None else None

            def loss_fn(tp):
                full = maybe_cast(self.merge_params(params, tp))
                loss, metrics = self.loss_and_metrics(
                    full, batch_data, rng, True, extra
                )
                return loss, metrics

            # scoped trace-time recurrence selection: the TRAINING
            # forward/backward uses self.train_gru_impl (e.g. the
            # minimal-residual "trainfast" VJP, ops/gru_trainfast.py)
            # while eval/serving traces keep the global default. The
            # scope wraps value_and_grad — custom-VJP BACKWARD rules
            # trace when the cotangent pass is built, after the loss
            # body returns, so a loss-body-only scope would miss them
            with gru_impl_scope(self.train_gru_impl):
                return jax.value_and_grad(loss_fn, has_aux=True)(trainable)

        if self._use_shard_map_train():
            from jax.sharding import PartitionSpec as P

            def grads_per_shard(params, trainable, batch_data, rng, extra):
                # decorrelate per-shard randomness (dropout masks, rsample
                # noise) like the serving mesh path; note the per-batch TF
                # coin (HierarchicalDecoder quirk) becomes per-SHARD here —
                # each shard flips its own coin over its local rows
                key = jax.random.fold_in(rng, jax.lax.axis_index("data"))
                (loss, metrics), grads = value_and_grads(
                    params, trainable, batch_data, key, extra
                )
                # equal shard sizes: mean of per-shard batch means == the
                # global batch mean, so loss/metrics/grads match the GSPMD
                # formulation exactly (up to fp reassociation)
                loss = jax.lax.pmean(loss, "data")
                metrics = {
                    k: None if v is None else jax.lax.pmean(v, "data")
                    for k, v in metrics.items()
                }
                grads = jax.tree_util.tree_map(
                    lambda g: jax.lax.pmean(g, "data"), grads
                )
                return loss, metrics, grads

            sharded_grads = jax.shard_map(
                grads_per_shard,
                mesh=self.mesh,
                in_specs=(P(), P(), P("data"), P(), P()),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )

        def train_step(params, opt_state, batch_data, rng, extra):
            trainable = self.trainable_params(params)
            if self._use_shard_map_train():
                loss, metrics, grads = sharded_grads(
                    params, trainable, batch_data, rng, extra
                )
            else:
                (loss, metrics), grads = value_and_grads(
                    params, trainable, batch_data, rng, extra
                )
            updates, opt_state = optimizer.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return self.merge_params(params, trainable), opt_state, loss, metrics

        def eval_step(params, batch_data, rng, extra, row_mask=None):
            extra = maybe_cast(extra) if extra is not None else None
            return self.loss_and_metrics(
                maybe_cast(params), batch_data, rng, False, extra,
                row_mask=row_mask,
            )

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._eval_step = jax.jit(eval_step)

    # --- epoch machinery ---------------------------------------------------- #
    def loss_and_acc_on_epoch(self, data_loader, epoch_num=None, train=True):
        """(reference trainer.py:126-163)"""
        if hasattr(data_loader, "batch_size"):
            self._fit_mesh_to_batch_size(data_loader.batch_size)
        if self._train_step is None:
            self._build_steps()
        losses, accs = [], []
        params = replicate(self.mesh, self.model.params)
        opt_state = self.opt_state
        extra = self.extra_params()
        if extra is not None:
            extra = replicate(self.mesh, extra)
        for batch in data_loader:
            batch_data = self.process_batch_data(batch)
            row_mask = None
            if jax.process_count() > 1:
                # multi-host: this process's loader yields its local rows;
                # assemble the global array without gathering on any host.
                # Indivisible tail batches cannot be replicated across
                # hosts (no host holds the global rows): eval pads each
                # process's rows and masks them out of the loss (the masked
                # batch mean over real rows == the unpadded mean, so this
                # matches single-host "eval loaders keep tails" exactly);
                # train skips them (train loaders drop_last like the
                # reference, so this only guards misconfigured loaders —
                # every process sees the same loader length, so all skip
                # together).
                rows = jax.tree_util.tree_leaves(batch_data)[0].shape[0]
                if (rows * jax.process_count()) % self.mesh.shape["data"]:
                    if train:
                        warnings.warn(
                            f"skipping {rows}-row train tail batch: global "
                            "size does not divide the "
                            f"{self.mesh.shape['data']}-way data axis in a "
                            "multi-host run",
                            stacklevel=2,
                        )
                        continue
                    batch_data, row_mask = pad_rows_to_divisible(
                        batch_data, self.mesh.shape["data"], jax.process_count()
                    )
                if row_mask is None:
                    batch_data = make_global_batch(self.mesh, batch_data)
                else:
                    batch_data, row_mask = make_global_batch(
                        self.mesh, (batch_data, row_mask)
                    )
            else:
                batch_data = shard_batch(self.mesh, batch_data)
            key = self.step_rng.next()
            if train:
                params, opt_state, loss, metrics = self._train_step(
                    params, opt_state, batch_data, key, extra
                )
            else:
                loss, metrics = self._eval_step(
                    params, batch_data, key, extra, row_mask
                )
            # keep device scalars — converting per step would force a host
            # sync and stall the dispatch pipeline; one sync at epoch end
            losses.append(loss)
            if metrics.get("accuracy") is not None:
                accs.append(metrics["accuracy"])
        self.model.params = params
        if train:
            self.opt_state = opt_state
        if self.debug:
            from inpaintnet_tpu.utils.debug import nan_check

            nan_check(self.model.params, f"{type(self.model).__name__} params")
        nb = max(len(losses), 1)
        mean_loss = float(np.sum([np.asarray(l) for l in losses])) / nb
        mean_acc = float(np.sum([np.asarray(a) for a in accs])) / nb if accs else 0.0
        return mean_loss, mean_acc

    def train_model(self, batch_size, num_epochs, plot=False, log=False,
                    split=(0.70, 0.20), run_name=None):
        """(reference trainer.py:41-124). ``plot`` redraws live train/val
        loss+accuracy curves each epoch like the reference (interactive
        figure with a display; a PNG under ``runs/`` headless) and also
        enables the JSONL metrics log. ``run_name`` pins the metrics-log
        filename (``runs/<run_name>.jsonl``): resumed runs append to ONE
        stable per-model log instead of a fresh timestamped file, which is
        what lets long schedules replay their validation history into the
        early stopper (benchmarks/full_schedule.py)."""
        log = log or plot or run_name is not None
        # multi-host: every process computes identically (SPMD), but only
        # process 0 may touch the shared filesystem — concurrent writes to
        # the same checkpoint/metrics paths corrupt them
        is_writer = jax.process_index() == 0
        metrics_path = None
        live_plot = None
        if log and is_writer:
            os.makedirs("runs", exist_ok=True)
            if run_name is None:
                run_name = f"{type(self.model).__name__}_{int(time.time())}"
            metrics_path = os.path.join("runs", run_name + ".jsonl")
            if plot:
                from inpaintnet_tpu.utils.plotting import LivePlot

                live_plot = LivePlot(os.path.join("runs", run_name + ".png"))
        generator_train, generator_val, _ = self.dataset.data_loaders(
            batch_size=batch_size, split=split, seed=self.seed
        )
        print("Num Train Batches: ", len(generator_train))
        print("Num Valid Batches: ", len(generator_val))
        # resume-aware: ``self.epoch`` counts COMPLETED epochs (0 for a
        # fresh trainer; restored by load_state). The loop runs
        # ``num_epochs`` MORE epochs with absolute numbering, so numbered
        # checkpoints from a resumed run don't overwrite earlier ones and
        # back-to-back train_model calls continue counting.
        start_epoch = self.epoch
        total_epochs = start_epoch + num_epochs
        for i in range(num_epochs):
            epoch_index = start_epoch + i
            self.update_scheduler(epoch_index)
            t0 = time.time()
            mean_loss_train, mean_accuracy_train = self.loss_and_acc_on_epoch(
                generator_train, epoch_index, train=True
            )
            mean_loss_val, mean_accuracy_val = self.loss_and_acc_on_epoch(
                generator_val, epoch_index, train=False
            )
            dt = time.time() - t0
            self.epoch = epoch_index + 1  # completed count, saved below
            data_element = {
                "epoch_index": epoch_index,
                "num_epochs": total_epochs,
                "mean_loss_train": mean_loss_train,
                "mean_accuracy_train": mean_accuracy_train,
                "mean_loss_val": mean_loss_val,
                "mean_accuracy_val": mean_accuracy_val,
                "epoch_seconds": dt,
            }
            if metrics_path:
                with open(metrics_path, "a") as f:
                    f.write(json.dumps(data_element) + "\n")
            if live_plot is not None:
                live_plot.update(**data_element)
            self.print_epoch_stats(**data_element)
            if is_writer:
                self.model.save()
                self.save_state()
                if epoch_index > 0 and epoch_index % 10 == 0:
                    self.model.save_checkpoint(epoch_index)
            if self.early_stopping:
                self.early_stopper(mean_loss_val, self.model)
                if self.early_stopper.early_stop:
                    print("Early Stopping")
                    if live_plot is not None:
                        live_plot.close()
                    return
        if live_plot is not None:
            live_plot.close()

    # --- persistence ----------------------------------------------------------- #
    @property
    def state_path(self) -> str:
        return self.model.filepath + ".train_state"

    def save_state(self):
        save_train_state(
            self.state_path,
            self.trainable_params(self.model.params),
            self.opt_state,
            self.epoch,
        )

    def load_state(self) -> int:
        trained, self.opt_state, step = load_train_state(
            self.state_path,
            self.trainable_params(self.model.params),
            self.opt_state,
        )
        self.model.params = self.merge_params(self.model.params, trained)
        self.epoch = step
        return step

    @staticmethod
    def print_epoch_stats(
        epoch_index, num_epochs, mean_loss_train, mean_accuracy_train,
        mean_loss_val, mean_accuracy_val, epoch_seconds=None, **_,
    ):
        extra = f"\t({epoch_seconds:.1f}s)" if epoch_seconds is not None else ""
        print(f"Train Epoch: {epoch_index + 1}/{num_epochs}{extra}")
        print(
            f"\tTrain Loss: {mean_loss_train}"
            f"\tTrain Accuracy: {mean_accuracy_train * 100} %"
        )
        print(
            f"\tValid Loss: {mean_loss_val}"
            f"\tValid Accuracy: {mean_accuracy_val * 100} %"
        )
