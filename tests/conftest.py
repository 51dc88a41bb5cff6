"""Test configuration: force an 8-device virtual CPU mesh so sharding
tests run anywhere (no TPU pod needed)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import pytest

DATA = pathlib.Path(__file__).parent / "data"
GOLD = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return DATA


@pytest.fixture(scope="session")
def golden_dir() -> pathlib.Path:
    return GOLD


@pytest.fixture(scope="session")
def toy_index():
    """The toy-genome index, loaded once per session (from the committed
    reference-built golden files)."""
    from dart_tpu.index import load_index

    return load_index(str(GOLD / "index" / "toy"))
