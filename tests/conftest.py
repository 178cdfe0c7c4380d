"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

Mirrors the reference's MPI-aware-but-serial-capable test strategy
(SURVEY.md §4.5): the same suite runs on one host with
``--xla_force_host_platform_device_count=8`` standing in for an 8-chip TPU
slice, so sharding paths are exercised without hardware.

Must configure the environment BEFORE jax initializes a backend.
"""
import os

# force CPU: the ambient environment sets JAX_PLATFORMS=axon (the TPU relay),
# and must be overridden, not defaulted, for the test suite
os.environ["JAX_PLATFORMS"] = "cpu"
# keep the axon PJRT plugin's remote-compile hooks out of CPU test processes
# (they stall for minutes reconnecting to the relay)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env assignment above is NOT sufficient when a sitecustomize has
# already imported jax at interpreter start (the ambient JAX_PLATFORMS
# value gets baked into the config at import time) — override the config
# directly so the suite really runs on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", (
    "test suite must run on CPU, got " + jax.default_backend())

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (reference conftest.py:1-21 analog)")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: mark test as slow to run")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip_slow = pytest.mark.skip(reason="need --runslow option to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
