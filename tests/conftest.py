"""Test configuration: run everything on CPU with 8 virtual devices so the
multi-chip sharding paths (mesh, shard_map, ppermute halo exchange) execute
without TPU hardware, per the reference test strategy gap analysis
(SURVEY.md section 4: distributed tests runnable on CPU via
xla_force_host_platform_device_count)."""

import os

# TRIALIGN_TEST_TPU=1 leaves the real backend in place so the tpu-marked
# tests (pytest -m tpu) exercise compiled kernels on hardware.
_ON_TPU = os.environ.get("TRIALIGN_TEST_TPU") == "1"

if not _ON_TPU:
    # Must be set before the first backend initialization.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _ON_TPU:
    # The axon sitecustomize force-sets jax_platforms="axon,cpu" at
    # interpreter start; override it back so tests run on the virtual
    # 8-device CPU mesh.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_triplet(rng, la, lb, lc, nsym=4):
    return (
        rng.integers(0, nsym, size=la).astype(np.uint8),
        rng.integers(0, nsym, size=lb).astype(np.uint8),
        rng.integers(0, nsym, size=lc).astype(np.uint8),
    )
