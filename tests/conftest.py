"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices (no TPU needed);
the driver separately dry-runs the multi-chip path via __graft_entry__.
"""

import os

# Force tests onto 8 virtual CPU devices.  NOTE: this environment's
# sitecustomize registers the tunneled axon TPU backend at interpreter
# startup (before conftest) and latches jax_platforms=axon, so the env-var
# route (JAX_PLATFORMS=cpu) is ignored here — jax.config.update after
# import is the reliable override.  XLA_FLAGS must still be set before the
# first backend initialization.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

import numpy as np
import pytest
import jax

jax.config.update("jax_platforms", "cpu")
# Parity tests compare against torch float32; JAX's default matmul precision
# is reduced (bf16-ish passes, ~3e-3 error) — pin full precision for tests.
# Production code keeps the fast default (bf16 on the TPU MXU).
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"
CONNECTIVITY_DIR = os.path.join(REFERENCE_ROOT, "connectivity")

# small scans (node counts) chosen for fast tests
SMALL_SCANS = ["17DRP5sb8fy", "2azQ1b91cZZ"]


@pytest.fixture(scope="session")
def connectivity_dir():
    return CONNECTIVITY_DIR


@pytest.fixture(scope="session")
def graph_bank():
    from speaker_follower_tpu.data.graph import load_graph_bank

    return load_graph_bank(SMALL_SCANS, CONNECTIVITY_DIR)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
