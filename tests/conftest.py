"""Test environment: force CPU with 8 virtual devices so sharding tests
run without a TPU pod (SURVEY.md §4's multi-host test strategy)."""

import os
import re

# The session environment pins JAX_PLATFORMS=axon (the real TPU tunnel);
# unit tests must run on the virtual CPU mesh, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
_m = re.search(r"xla_force_host_platform_device_count=(\d+)", flags)
# honor a user-specified device count (e.g. a 16-way mesh run)
_n_devices = int(_m.group(1)) if _m else 8
if _m is None:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={_n_devices}"
    ).strip()

# The axon sitecustomize (PALLAS_AXON_POOL_IPS set) imports jax at
# interpreter start — before this conftest — so XLA_FLAGS alone comes
# too late. jax.config works post-import as long as no backend has been
# initialized yet.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", _n_devices)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(20220414)
