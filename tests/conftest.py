"""Test harness config: run all tests on a fake 8-device CPU mesh.

SURVEY.md section 4 'Distributed': the TPU analog of a fake backend is
XLA's forced host platform device count — shard_map / pjit tests exercise
the real partitioning logic without TPU hardware. Must run before any
`import jax` in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The env var alone is NOT enough: auto-loaded pytest plugins (jaxtyping)
# import jax before this conftest runs, and JAX_PLATFORMS is read at import
# time — without the explicit config.update the whole suite silently runs on
# the real TPU chip (single-client: concurrent pytest runs then deadlock, and
# bf16 MXU conv precision breaks tight parity tolerances).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# NOTE: do NOT enable jax's persistent compilation cache here — concurrent
# pytest processes sharing one cache dir produced corrupt executables
# (silently wrong numerics) and deadlocks in this environment.


def pytest_collection_modifyitems(config, items):
    """Everything not marked `slow` IS the smoke tier, so `pytest -m smoke`
    and `pytest -m "not slow"` are the same ~10-min fast pass (round-3
    VERDICT weak #5: a 40-min cold suite stops being run). The slow set =
    tests measured >=12 s on the 1-core host (2026-08-20 --durations=0
    run), except one cheapest-per-module keep (test_bf16, test_elastic)
    so smoke still touches every module's cheapest path."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
