"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh
(xla_force_host_platform_device_count), per the repo testing contract.
Must run before jax is imported anywhere.
"""
import os
import sys

# The axon sitecustomize registers the TPU plugin at interpreter start,
# before this file runs — and once the plugin is registered, a DEAD
# tunnel hangs `import jax`-level initialization no matter what
# JAX_PLATFORMS says (r5: the CPU-only suite wedged 43 minutes in a
# sleep-retry after a mid-session tunnel death).  The only reliable
# opt-out is PALLAS_AXON_POOL_IPS="" from interpreter start, so rerun
# pytest in a child with it unset (tests are CPU-only by contract).
# Caveat: the parent pytest's fd-level capture already owns stdout
# here, so the child's console output is not replayed — exit code and
# --junitxml are authoritative.  `scripts/run_tests.sh` presets the
# env so the normal path (with console output) is taken; this guard is
# the backstop for plain `python -m pytest tests/` invocations.
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    import subprocess

    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    rc = subprocess.call(
        [sys.executable, "-m", "pytest"] + sys.argv[1:], env=os.environ
    )
    os._exit(rc)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
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
