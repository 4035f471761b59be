"""Test harness configuration.

Tests run on a simulated 8-device CPU platform so multi-chip sharding
code (mesh/pjit paths) executes without TPU hardware — the standard JAX
technique for testing pjit programs (SURVEY.md §4 item 5). The env vars
must be set before jax initializes a backend, hence at conftest import
time.
"""

import os

# Force CPU even when the environment presets a TPU platform: unit tests
# must be hermetic and exercise the simulated 8-device mesh. The env var
# alone is not enough here — a site-level PJRT plugin may have already
# registered a TPU backend at interpreter start — so also override via
# jax.config, which wins at backend-selection time.
os.environ["JAX_PLATFORMS"] = "cpu"
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
