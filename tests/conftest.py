"""Test configuration: run everything on a virtual 8-device CPU mesh.

The image's axon sitecustomize force-registers the TPU platform via
jax.config (overriding JAX_PLATFORMS env), so we override back through
jax.config before any backend initializes (SURVEY.md section 4).
"""
import os

os.environ.setdefault("WG_OFFLINE", "1")  # hermetic: never hit the network

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("WG_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
