"""Test harness config.

Forces the JAX CPU backend with 8 virtual devices (the standard fake-backend
trick for testing mesh/sharding code without a TPU) BEFORE jax is imported
anywhere. Reference parity tests additionally use the read-only reference
checkout at /root/reference as a numerical oracle when present.
"""

import os
import sys

# Force the CPU backend with 8 virtual devices. jax may already be imported
# by a pytest plugin before this conftest runs, so set BOTH the env vars and
# the live jax config (the latter works any time before backend init).
# Set PEV_TEST_BACKEND to run the suite against a real accelerator instead.
_backend = os.environ.get("PEV_TEST_BACKEND", "cpu")
os.environ["JAX_PLATFORMS"] = _backend
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _backend)
if _backend == "cpu":
    jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_DIR, "models"))


@pytest.fixture(scope="session")
def ref_modules():
    """Import the reference torch modules as a numerical oracle (read-only)."""
    if not reference_available():
        pytest.skip("reference checkout not available")
    torch = pytest.importorskip("torch")
    sys.path.insert(0, os.path.join(REFERENCE_DIR, "models"))
    import losses as ref_losses  # noqa: F401
    return {"losses": ref_losses, "torch": torch}


@pytest.fixture()
def rng():
    return np.random.default_rng(13)
