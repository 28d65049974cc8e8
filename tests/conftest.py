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
import numpy as np
import pytest

# Persistent compilation cache: repeat test runs skip XLA compiles entirely.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_pytest")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
