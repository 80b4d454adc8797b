"""Render the cross-framework training-trajectory parity table (docs).

Drives the SAME harness as tests/test_reference_trainer_parity.py (the
reference's own trainers on CPU torch vs our jitted optax steps, identical
data/init/masks, sampling neutralized) for more epochs, and prints a
markdown table for docs/PARITY.md.

Usage (from the repo root):
    python benchmarks/trainer_parity_trajectory.py [num_epochs]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests")
)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import torch  # noqa: E402

import test_reference_trainer_parity as tp  # noqa: E402
from inpaintnet_tpu.ops import distributions as _dist  # noqa: E402


def main():
    num_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    # sampling neutralized on BOTH frameworks (see the test module)
    _dist.DiagNormal.rsample = lambda self, key: self.loc
    torch.distributions.Normal.rsample = (
        lambda self, sample_shape=torch.Size(): self.loc
    )

    rows = []
    for name, runner, kw in (
        ("MeasureVAE", tp.run_vae_trajectory, dict(num_batches=5)),
        ("AnticipationRNN (reg)", tp.run_arnn_trajectory, dict(num_batches=4)),
        ("LatentRNN", tp.run_latent_rnn_trajectory, dict(num_batches=4)),
    ):
        ref, ours = runner(num_epochs=num_epochs, **kw)
        # column 0 = train loss; VAE runner also returns (acc, val loss)
        for e in range(num_epochs):
            rows.append((name, e, ref[e][0], ours[e][0],
                         abs(ours[e][0] - ref[e][0])))
        print(f"{name}: max |ours-ref| over all reported scalars = "
              f"{np.max(np.abs(np.asarray(ours) - np.asarray(ref))):.2e}")

    print()
    print("| model | epoch | reference train NLL | ours train NLL | abs diff |")
    print("|---|---|---|---|---|")
    for name, e, r, o, d in rows:
        print(f"| {name} | {e + 1} | {r:.6f} | {o:.6f} | {d:.1e} |")


if __name__ == "__main__":
    main()
