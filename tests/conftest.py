"""Test configuration: force CPU with 8 virtual devices so tests are fast and
sharding tests run anywhere (mirrors the driver's dryrun_multichip env).

Note: this image preloads jax and registers a remote 'axon' TPU backend in
sitecustomize before any user code runs, so setting JAX_PLATFORMS via
os.environ is too late -- use jax.config.update on the already-imported jax
before the first computation creates a backend."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
