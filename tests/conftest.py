"""Test configuration: force an 8-device virtual CPU mesh for JAX tests.

This box boots the axon TPU backend from sitecustomize, so the platform
is pinned via jax.config (which wins over the pre-set JAX_PLATFORMS env)
before any test imports jax. Set KWAGE_TEST_TPU=1 to run the suite on the
real chip instead (single device; mesh tests will skip).
"""

import os
import pathlib

import pytest

if os.environ.get("KWAGE_TEST_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
DATA_DIR = pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN_DIR


@pytest.fixture(scope="session")
def data_dir():
    return DATA_DIR
