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


@pytest.fixture
def rng():
    return np.random.default_rng(0)
