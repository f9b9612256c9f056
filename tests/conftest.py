"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Mirrors the reference's test strategy (SURVEY.md §4): the CPU backend doubles
as the no-accelerator test target, and multi-chip sharding is validated on
virtual CPU devices. Benchmarks (bench.py) run on the real TPU instead.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/tests/data"


def reference_data_path(name: str) -> str:
    return os.path.join(REFERENCE_DATA, name)


def has_reference_data(name: str) -> bool:
    return os.path.exists(reference_data_path(name))


@pytest.fixture(scope="session")
def ref_data_dir():
    if not os.path.isdir(REFERENCE_DATA):
        pytest.skip("reference test data not available")
    return REFERENCE_DATA
