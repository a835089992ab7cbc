"""Test configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY.md §4) so sharding logic is
exercised without TPU hardware. Set BEFORE importing jax anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon sitecustomize pins JAX_PLATFORMS to the TPU plugin; tests run on
# the 8-device virtual CPU backend instead (fast compiles, sharding logic
# exercised without hardware).
import jax  # noqa: E402

try:
    _cpu0 = jax.devices("cpu")[0]
    jax.config.update("jax_default_device", _cpu0)
except Exception:  # pragma: no cover - CPU backend always present
    pass

# Persistent XLA compilation cache: the suite is compile-dominated (big
# jitted training steps on the 8-device virtual mesh), so repeat runs drop
# from tens of minutes to minutes. Keyed by HLO + config, so stale entries
# are impossible; safe to delete .jax_cache/ at any time.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def ref_modules():
    """Import the reference implementation (read-only) for golden parity
    tests. Skipped when the reference tree is absent."""
    if not reference_available():
        pytest.skip("reference tree not available")
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import importlib
    mods = {}
    for name in ["config", "signal_processing.gammatone",
                 "signal_processing.features", "signal_processing.haircell",
                 "masks.irm", "masks.pcirm", "masks.opt_pcirm",
                 "evaluation.stoi", "evaluation.ssnr",
                 "evaluation.pesq_eval", "evaluation.csii", "evaluation.ncm"]:
        mods[name] = importlib.import_module(name)
    return mods
