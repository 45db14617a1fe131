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


def _load_ref_prepare_fns() -> dict:
    """Load the reference's pure-numpy alignment functions as an oracle.

    ``scripts/prepare_data.py`` imports Bio/rcsbapi (not installed here), so
    the module can't be imported directly; the needed functions are
    numpy-only, so extract just their defs from the AST and exec them.
    """
    if not reference_available():
        pytest.skip("reference checkout not available")
    import ast
    from typing import Dict, List, Optional, Tuple

    path = os.path.join(REFERENCE_DIR, "scripts", "prepare_data.py")
    with open(path) as f:
        tree = ast.parse(f.read())
    wanted = {"kabsch", "pairwise_rmsd_matrix", "choose_medoid",
              "align_to_reference", "detect_core_mask", "align_core_fit"}
    nodes = [n for n in tree.body
             if isinstance(n, ast.FunctionDef) and n.name in wanted]
    assert {n.name for n in nodes} == wanted
    ns = {"np": np, "List": List, "Tuple": Tuple, "Dict": Dict,
          "Optional": Optional}
    exec(compile(ast.Module(body=nodes, type_ignores=[]), path, "exec"), ns)
    return ns


@pytest.fixture()
def ref_prepare_fns():
    """Reference alignment oracle, verbatim (including its kabsch bug)."""
    return _load_ref_prepare_fns()


@pytest.fixture()
def ref_prepare_fns_fixed():
    """Reference alignment oracle with its inverted-rotation kabsch replaced
    by a correct one — parity target for the *algorithm* (medoid choice, core
    detection, fit structure), see test_reference_kabsch_is_inverted."""
    from protein_ensemble_vae_tpu.dataprep.align import _kabsch_rt

    ns = _load_ref_prepare_fns()
    ns["kabsch"] = _kabsch_rt
    return ns


@pytest.fixture()
def rng():
    return np.random.default_rng(13)
