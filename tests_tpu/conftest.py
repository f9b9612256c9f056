"""Real-TPU test configuration.

Unlike tests/ (which forces an 8-device virtual CPU mesh), this suite
runs on whatever accelerator JAX finds — the axon-tunneled v5e here, a
local TPU elsewhere. Run explicitly:

    timeout 560 python3 -m pytest tests_tpu/ -q

First compile of each new shape goes through the remote compiler
(30-240s); keep shapes small and few.
"""

import threading

import pytest


@pytest.fixture(scope="session", autouse=True)
def require_tpu():
    # Probe in a worker thread with a timeout: during a tunnel outage
    # jax.devices() BLOCKS indefinitely (observed: even device discovery
    # hung), and a hung collection is worse than a skipped suite.
    result = {}

    def probe():
        import jax

        try:
            result["platform"] = jax.devices()[0].platform
        except Exception as e:  # noqa: BLE001
            result["error"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout=90.0)
    if t.is_alive():
        pytest.skip("TPU runtime unresponsive after 90s (tunnel outage?)",
                    allow_module_level=True)
    if result.get("platform") not in ("tpu",):
        pytest.skip(f"real TPU not available ({result})",
                    allow_module_level=True)
