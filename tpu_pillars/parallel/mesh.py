"""Device mesh construction (SURVEY.md section 2 'Parallelism strategies').

The detector is ~5 M params — data parallelism over sweeps is the only axis
that matters (the reference has none at all). One 1-D 'data' mesh axis over
ICI; collectives (grad psum, detection all_gather) are inserted by GSPMD or
written explicitly in shard_map. A 'model' axis is reserved in the helper
signature for completeness but intentionally unused (nothing to shard).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_n(n: int, axis_name: str = "data") -> Mesh:
    """1-D mesh over the first `n` local devices; raises SystemExit with a
    clear message when fewer are visible (the CLI `--dp N` contract)."""
    devices = jax.devices()[:n]
    if len(devices) < n:
        raise SystemExit(
            f"requested {n} devices, only {len(devices)} visible "
            f"(backend: {jax.default_backend()})")
    return make_mesh(devices, axis_name)
