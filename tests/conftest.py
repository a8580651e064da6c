"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere, so this lives at the
top of conftest collection.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
