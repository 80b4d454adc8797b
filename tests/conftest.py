"""Test configuration: force an 8-virtual-device CPU backend.

Multi-chip sharding paths are exercised on a fake 8-device CPU mesh
(``--xla_force_host_platform_device_count=8``) since only one real TPU chip
is attached in CI. Must run before jax initializes its backends.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
import pytest  # noqa: E402

# The hosting environment's TPU plugin overrides JAX_PLATFORMS at import
# time; force CPU through the config API as well (must precede any backend
# initialization).
jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs[:8]
