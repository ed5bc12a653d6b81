"""Test configuration: force CPU with 8 virtual devices so sharding tests run
anywhere (mirrors the driver's dryrun_multichip environment).  Must run before
jax initializes a backend, so keep this at import time of conftest."""

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
    return np.random.default_rng(1234)
