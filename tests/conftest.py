"""Test config: force JAX onto a virtual 8-device CPU mesh.

Must run before jax is imported anywhere; multi-chip sharding tests use the
8 virtual devices (mirrors how the driver validates multi-chip paths).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run the virtual CPU mesh
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# the container's sitecustomize imports jax at interpreter start (TPU
# tunnel registration), which freezes the config default from the old env —
# override it before any backend initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    import jax
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs[:8]
