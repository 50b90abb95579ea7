"""Test configuration: force an 8-device virtual CPU platform.

SPMD semantics (data-parallel sharding, pmean-BN, per-host batch split)
are tested on a virtual 8-device CPU mesh instead of a TPU pod —
the pattern SURVEY.md §4 prescribes for the new framework.
Must run before jax initializes, hence the env vars at import time.
"""

import os

# force CPU regardless of ambient env: tests must not occupy the TPU and
# need the 8-device virtual platform. The TPU-tunnel sitecustomize imports
# jax at interpreter start with JAX_PLATFORMS=axon, so updating the env
# alone is not enough — update the live jax config too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
