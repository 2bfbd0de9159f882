"""Test harness config.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (the strategy SURVEY.md §4 prescribes:
``xla_force_host_platform_device_count`` stands in for a v4-8 slice).
Must run before jax is imported anywhere.
"""

import os

# Force CPU. The image's sitecustomize registers the axon TPU plugin at
# interpreter startup (importing jax before this file runs) and rewrites
# jax_platforms, so env vars alone are not enough: override the config
# directly, and clear the pool var so our test subprocesses skip the
# plugin entirely.
_TPU_MODE = os.environ.get("EHTPU_TPU_TESTS") == "1"

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ehtpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
if not _TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU mesh, got " + jax.default_backend()
    )
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
# EHTPU_TPU_TESTS=1 leaves the real backend in place so @pytest.mark.tpu
# tests exercise actual Mosaic lowerings:
#   EHTPU_TPU_TESTS=1 python -m pytest tests -m tpu

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_addoption(parser):
    parser.addoption(
        "--golden-update",
        action="store_true",
        default=False,
        help="rewrite tests/golden/ snapshot files instead of comparing "
             "(test_cli_golden.py)",
    )
