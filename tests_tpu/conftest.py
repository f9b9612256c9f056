"""Real-TPU test configuration.

Unlike tests/ (which forces an 8-device virtual CPU mesh), this suite
runs on whatever accelerator JAX finds — the axon-tunneled v5e here, a
local TPU elsewhere. Run explicitly:

    timeout 560 python3 -m pytest tests_tpu/ -q

First compile of each new shape goes through the remote compiler
(30-240s); keep shapes small and few.
"""

import jax
import pytest


@pytest.fixture(scope="session", autouse=True)
def require_tpu():
    if jax.devices()[0].platform not in ("tpu",):
        pytest.skip("real TPU not available", allow_module_level=True)
