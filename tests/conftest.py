"""Test configuration: force an 8-device virtual CPU mesh for JAX tests.

Must run before any jax import so the XLA flags take effect.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
DATA_DIR = pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN_DIR


@pytest.fixture(scope="session")
def data_dir():
    return DATA_DIR
