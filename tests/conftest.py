"""Test configuration: force CPU with 8 virtual devices BEFORE importing jax.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(--xla_force_host_platform_device_count); the real-TPU path is exercised by
bench.py and the driver's compile checks, not by unit tests.
"""

import os

# force-assign (not setdefault): the ambient environment may pin JAX_PLATFORMS
# to a remote TPU platform, which would send every eager test op over the wire
os.environ["JAX_PLATFORMS"] = os.environ.get("TFHE_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the environment's TPU-tunnel plugin pins jax_platforms via config.update at
# interpreter start, which wins over the env var — override it back explicitly
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0x7F4E)


def pytest_configure(config):
    # wrapping mod-2^32 arithmetic intentionally overflows NumPy scalars
    config.addinivalue_line(
        "filterwarnings", "ignore:overflow encountered:RuntimeWarning"
    )
