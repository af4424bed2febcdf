"""Test env: force an 8-device virtual CPU platform.

Multi-device sharding tests run on this virtual mesh exactly as they would on
an 8-chip TPU slice (SURVEY.md §4: the torch reference could not test its
distributed paths; we can). The axon sitecustomize imports jax at interpreter
startup with JAX_PLATFORMS=axon, so env vars alone are too late — we must also
update jax.config directly.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, jax.devices()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
