"""Test harness: force a virtual 8-device CPU platform before jax imports so
every test (including mesh/sharding tests) runs without TPU hardware."""

import os

# Hard override: the session environment presets JAX_PLATFORMS=axon (the real
# TPU tunnel); tests must run on the virtual 8-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# the CI box has ONE core and the suite is XLA-compile-bound; O0 halves
# compile time (engine file: 398s -> 172s) and every golden tolerance holds
if "xla_backend_optimization_level" not in _flags:
    _flags = (_flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = _flags

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import jax  # noqa: E402
import pytest  # noqa: E402

# An installed pytest plugin may import jax before this conftest runs, in
# which case jax captured JAX_PLATFORMS=axon at import time — override the
# live config too (backends are selected lazily, so this still wins).
jax.config.update("jax_platforms", "cpu")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (heavy torch/transformers golden builds)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy golden test (torch/transformers model build); "
        "skipped unless --runslow",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow golden test; use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected >=8 virtual devices, got {len(devs)}"
    return devs[:8]
