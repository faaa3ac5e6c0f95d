"""Test harness config: force the CPU backend with 8 virtual devices so
sharding tests exercise a multi-chip mesh without TPU hardware.

NB: in this environment a preinstalled TPU plugin overrides the
JAX_PLATFORMS *environment variable*, so we must also set the config flag
after import (XLA_FLAGS still must be set before the first backend init)."""

import os
import tempfile

# Keep tests hermetic: the CLI enables a persistent compilation cache under
# ~/.cache by default (see __main__._enable_compile_cache).
os.environ.setdefault("RRT_TPU_COMPILE_CACHE", "0")
# Auto-named recordings (an R-toggle in a Session test) go to a temp dir,
# never the source tree.
os.environ.setdefault(
    "RRT_RECORDING_DIR", tempfile.mkdtemp(prefix="rrt_recordings_")
)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
