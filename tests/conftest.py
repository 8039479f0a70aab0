"""Test harness: deterministic 8-device CPU mesh (the TPU-native equivalent
of a fake backend — SURVEY §4), set before jax is imported anywhere."""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The axon sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon latched; env alone is too late, so override via config
# (backend init is still lazy at this point, XLA_FLAGS above is honoured).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def lines_data():
    """The vendored lines 2D gather + 66%-decimation mask
    (float64 -> float32 on use); no reference checkout needed."""
    from deep_prior_interpolation_tpu.data import lines_dataset
    return lines_dataset()
