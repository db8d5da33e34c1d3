"""Test harness: force CPU backend with an 8-device virtual mesh.

Tests never touch the (single, tunneled) TPU chip; sharding/collective tests
run on 8 virtual CPU devices per the multi-chip validation strategy in the
build brief. Must run before jax is imported anywhere.
"""

import os

# The harness pre-sets JAX_PLATFORMS=axon (tunneled TPU) — tests must
# override it unconditionally or every compile goes over the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize may have imported jax already (axon PJRT registration), in
# which case jax snapshotted JAX_PLATFORMS=axon from the env at import time
# and the os.environ override above is ignored — force it via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    """Function-scoped, fixed-seed rng: every test draws the same sequence
    regardless of execution order (a session-scoped rng made test inputs
    depend on which tests ran before — order-dependent flakiness)."""
    return np.random.default_rng(0)


# Fast smoke tier: `pytest -m quick` runs the cheap unit files (< ~1 min
# total) for inner-loop development; the full suite stays the CI gate.
_QUICK_FILES = {
    "test_se3.py", "test_camera.py", "test_features.py", "test_io.py",
    "test_map_backend.py", "test_viz_cli.py",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if os.path.basename(str(item.fspath)) in _QUICK_FILES:
            item.add_marker(pytest.mark.quick)
