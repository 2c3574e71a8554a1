"""Test configuration: run on CPU with 8 virtual devices so the sharding /
multi-chip paths are exercised without TPU hardware (the driver separately
dry-runs the multi-chip path; bench runs on the real chip)."""

import os

# jax is already imported by a pytest plugin by the time conftest runs, so
# plain env vars are too late for platform selection — but the backend is not
# initialized yet, so jax.config still takes effect. XLA_FLAGS is read at
# backend init, so the env var works for the virtual device count.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

import ldpc_tpu


@pytest.fixture(scope="session")
def test_code():
    """The (7,4) universal fixture (reference ldpc_decoder.py:274-284)."""
    return ldpc_tpu.create_test_ldpc_code()


@pytest.fixture(scope="session")
def test_graph(test_code):
    return ldpc_tpu.build_graph(test_code)


@pytest.fixture(scope="session")
def mid_code():
    """A mid-size irregular code for statistical tests."""
    return ldpc_tpu.create_peg_code(n=128, m=64, dv=3, seed=1,
                                    max_iterations=20)
