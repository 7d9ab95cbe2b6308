"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-world fake backend (SURVEY.md §4): multi-device sharding
tests execute on host CPU via XLA's forced device count, so the full
distributed path is exercised without hardware.

Note: the execution image registers a remote-TPU ("axon") JAX backend from
sitecustomize and force-sets ``jax_platforms`` — we must override BOTH the
env var and the jax config before any backend is instantiated.
"""

import os

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

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "reference_goldens.npz")


@pytest.fixture(scope="session")
def goldens():
    return np.load(GOLDEN)
