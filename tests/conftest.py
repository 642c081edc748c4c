"""Test configuration: run the suite on CPU with 8 virtual devices.

Tests must be deterministic and runnable without TPU hardware; sharding /
collective logic is exercised on a fake 8-device mesh
(SURVEY.md SS5.2 'multi-chip without a cluster').  Real-TPU kernel checks are
marked `tpu` and skipped unless a TPU backend is actually available AND
APD_TPU_TESTS=1 (run manually on the dev chip).

This module is imported by pytest before any test module, so the env mutation
happens before jax initializes its backend.
"""

import os

# NOTE: the axon TPU plugin registers itself from sitecustomize at interpreter
# start (importing jax), so the JAX_PLATFORMS env var is already consumed by
# the time pytest code runs.  jax.config.update after import is the reliable
# route; XLA_FLAGS is only read at first backend-client creation, which
# happens later, so setting it here still works.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("APD_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

# SURVEY.md SS6.2: JAX is functional so data races are structurally absent;
# the numerics sanitizer is NaN trapping on every primitive's output.
jax.config.update("jax_debug_nans", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert os.environ.get("APD_TPU_TESTS") == "1" or all(
        d.platform == "cpu" for d in jax.devices()
    ), "test suite must run on the virtual CPU mesh"


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires real TPU hardware (manual)")
    config.addinivalue_line(
        "markers",
        "full: slow e2e/scale test, excluded from the default fast profile "
        "(include with -m full / -m 'full or not full' or APD_FULL_TESTS=1)",
    )


def pytest_collection_modifyitems(config, items):
    # Fast/full profiles (1-core host; the full suite is >12 min and grows):
    # a plain `pytest tests/ -q` runs the fast profile; the round ritual and
    # any behavior-touching change should run the FULL suite via
    # APD_FULL_TESTS=1 (or an explicit -m expression, which wins outright).
    if not config.getoption("-m") and os.environ.get("APD_FULL_TESTS") != "1":
        skip_full = pytest.mark.skip(
            reason="full-profile test; run APD_FULL_TESTS=1 pytest (or -m full)"
        )
        for item in items:
            if "full" in item.keywords:
                item.add_marker(skip_full)
    if os.environ.get("APD_TPU_TESTS") == "1":
        return
    skip = pytest.mark.skip(reason="TPU test; set APD_TPU_TESTS=1 on real hardware")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
