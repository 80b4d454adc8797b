"""Worker for the REAL multi-process multi-host test (round-2 verdict #2).

Launched twice by tests/test_multiprocess.py. Each process initializes
``jax.distributed`` (localhost coordinator, gloo CPU collectives) with 4
virtual CPU devices — 8 global — and trains a small MeasureVAE through the
production multi-host branches: ``make_global_batch`` for divisible train
batches and ``pad_rows_to_divisible`` + row-masked eval for the indivisible
tail (parallel/mesh.py:93-163, train/trainer.py:249-295). Writes its
per-epoch losses to JSON for the parent to compare against a single-process
run of the same data/seed.

Usage: python multiprocess_vae_worker.py <pid> <nprocs> <port> <outdir> [devs]

``devs`` = virtual devices per process (default 4); the test drives both
the 2-process x 4-device and 4-process x 2-device layouts over the same
8-device global mesh.
"""
import json
import os
import sys

PID, NPROCS, PORT, OUTDIR = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
)
DEVS = int(sys.argv[5]) if len(sys.argv) > 5 else 4

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={DEVS}"
os.environ.setdefault("JAX_ENABLE_X64", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    f"localhost:{PORT}", num_processes=NPROCS, process_id=PID
)

import numpy as np  # noqa: E402

from multiprocess_vae_common import (  # noqa: E402
    build_trainer,
    global_batches,
    run_epochs,
)

assert jax.process_count() == NPROCS, jax.process_count()
assert jax.device_count() == DEVS * NPROCS

trainer = build_trainer()
train_global, eval_global = global_batches()
# this process feeds ONLY its local rows (multi-host input feeding)
local = lambda b: b[  # noqa: E731
    PID * (b.shape[0] // NPROCS) : (PID + 1) * (b.shape[0] // NPROCS)
]
result = run_epochs(
    trainer,
    [local(b) for b in train_global],
    [local(b) for b in eval_global],
)

with open(os.path.join(OUTDIR, f"proc{PID}.json"), "w") as f:
    json.dump(result, f)
