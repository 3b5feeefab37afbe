"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh
(xla_force_host_platform_device_count), per the repo testing contract.
Must run before jax is imported anywhere.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# The axon sitecustomize registers the TPU platform at interpreter start,
# before this file runs, so env vars alone can't deselect it; the config
# update below wins as long as it happens before the first jax op.
os.environ["JAX_PLATFORMS"] = ""
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def small_dataset():
    from gala_tpu.data.synthetic import synthetic_dataset

    return synthetic_dataset(n=300, avg_degree=8, n_feats=24, n_classes=5, seed=7)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
