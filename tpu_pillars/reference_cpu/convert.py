"""Flax <-> torch weight conversion for the parity oracle.

The Flax model (models/) is the source of truth; the torch CPU reference
(reference_cpu/model.py) receives converted weights so fidelity tests can
assert both paths compute the same function (SURVEY.md section 4
'bit-for-boxes' contract).
"""

from __future__ import annotations

import numpy as np
import torch

from tpu_pillars.config import PillarsConfig


def _t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x, dtype=np.float32).copy())


def flax_to_torch(variables: dict, config: PillarsConfig) -> dict:
    """Build a TorchPointPillars state_dict from flax variables
    {'params': ..., 'batch_stats': ...}."""
    p = variables["params"]
    bs = variables["batch_stats"]
    sd: dict[str, torch.Tensor] = {}

    # PFN: flax Dense kernel (D, C) -> torch Linear weight (C, D)
    sd["pfn.linear.weight"] = _t(p["pfn"]["linear"]["kernel"]).t()
    _bn(sd, "pfn.bn", p["pfn"]["bn"], bs["pfn"]["bn"])

    # RPN blocks: flax Conv kernel (kh, kw, in, out) -> torch (out, in, kh, kw)
    for i, n_layers in enumerate(config.rpn_layers):
        for j in range(n_layers):
            k = _t(p["rpn"][f"block{i}"][f"conv{j}"]["kernel"])
            sd[f"rpn.blocks.{i}.{j}.0.weight"] = k.permute(3, 2, 0, 1)
            _bn(sd, f"rpn.blocks.{i}.{j}.1",
                p["rpn"][f"block{i}"][f"bn{j}"], bs["rpn"][f"block{i}"][f"bn{j}"])
        # up: flax ConvTranspose kernel (kh, kw, in, out), applied flipped
        # relative to torch ConvTranspose2d (in, out, kh, kw) -> flip spatial
        k = _t(p["rpn"][f"up{i}"]["deconv"]["kernel"])
        sd[f"rpn.ups.{i}.0.weight"] = k.flip(0, 1).permute(2, 3, 0, 1)
        _bn(sd, f"rpn.ups.{i}.1", p["rpn"][f"up{i}"]["bn"], bs["rpn"][f"up{i}"]["bn"])

    # head 1x1 convs (with bias)
    for name in ("cls", "box", "dir"):
        k = _t(p["head"][name]["kernel"])
        sd[f"{name}.weight"] = k.permute(3, 2, 0, 1)
        sd[f"{name}.bias"] = _t(p["head"][name]["bias"])
    return sd


def _bn(sd: dict, prefix: str, params: dict, stats: dict) -> None:
    sd[f"{prefix}.weight"] = _t(params["scale"])
    sd[f"{prefix}.bias"] = _t(params["bias"])
    sd[f"{prefix}.running_mean"] = _t(stats["mean"])
    sd[f"{prefix}.running_var"] = _t(stats["var"])
    sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)
