"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere, so this lives at the
top of conftest collection.
"""

import os

# The container exports JAX_PLATFORMS=axon (remote TPU tunnel) — override it
# unconditionally: unit tests run on a virtual 8-device CPU mesh. Setting
# PALLAS_AXON_POOL_IPS="" stops the axon sitecustomize from registering the
# TPU backend at interpreter start.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
# don't let the CPU test suite enable the persistent XLA compile cache
# (it would write cached CPU executables into the user's ~/.cache)
os.environ["ARIES_COMPILE_CACHE"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize imports jax at interpreter start, before this file
# runs, so the env alone is not enough — force the platform via config too.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


GOLDEN_DIR = "/root/reference/api_outputs"


@pytest.fixture
def golden_dir():
    import pathlib

    p = pathlib.Path(GOLDEN_DIR)
    if not p.exists():
        pytest.skip("reference golden outputs not available")
    return p
