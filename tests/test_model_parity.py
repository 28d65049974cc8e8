"""Flax model vs torch-CPU reference with converted weights: both must
compute the identical function (the weight-parity half of the bit-for-boxes
contract, SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from tpu_pillars.config import tiny_config
from tpu_pillars.models import PointPillars
from tpu_pillars.ops.voxelize import PillarBatch
from tpu_pillars.reference_cpu.convert import flax_to_torch
from tpu_pillars.reference_cpu.model import TorchPointPillars
from tpu_pillars.reference_cpu.pillarizer import pillarize_np

CFG = tiny_config()


def _random_variables(rng, model, batch):
    """Init (well-conditioned fan-in scaling — unit per-layer gain, so f32
    backend summation-order noise stays ~1e-5) and jitter BN affine/stats so
    BatchNorm actually transforms instead of being identity."""
    variables = model.init(jax.random.PRNGKey(0), batch)

    def jitter(path, leaf):
        name = path[-1].key
        if name in ("scale",):
            return jnp.asarray(rng.normal(1.0, 0.1, leaf.shape).astype(np.float32))
        if name in ("bias", "mean"):
            return jnp.asarray(rng.normal(0.0, 0.1, leaf.shape).astype(np.float32))
        if name == "var":
            return jnp.asarray(
                np.abs(rng.normal(1.0, 0.1, leaf.shape)).astype(np.float32) + 0.1
            )
        return leaf

    return jax.tree_util.tree_map_with_path(jitter, variables)


def _make_batch(rng, cfg):
    pts = np.zeros((500, 4), dtype=np.float32)
    pts[:, 0] = rng.uniform(cfg.x_min, cfg.x_max, 500)
    pts[:, 1] = rng.uniform(cfg.y_min, cfg.y_max, 500)
    pts[:, 2] = rng.uniform(cfg.z_min, cfg.z_max, 500)
    pts[:, 3] = rng.uniform(0, 1, 500)
    feats, mask, coords, pmask = pillarize_np(pts, cfg)
    return PillarBatch(jnp.asarray(feats), jnp.asarray(mask),
                       jnp.asarray(coords), jnp.asarray(pmask))


def _run_both(model, variables, batch, cfg):
    outs_j = model.apply(variables, batch)
    tmodel = TorchPointPillars(cfg)
    tmodel.load_state_dict(flax_to_torch(variables, cfg))
    tmodel.eval()
    with torch.no_grad():
        outs_t = tmodel(
            torch.from_numpy(np.asarray(batch.features)),
            torch.from_numpy(np.asarray(batch.mask)),
            torch.from_numpy(np.asarray(batch.coords)),
            torch.from_numpy(np.asarray(batch.pillar_mask)),
        )
    return outs_j, outs_t


def test_flax_torch_forward_parity_exact_init(rng):
    """Whole-net parity on init variables: on CPU both backends agree to f32
    rounding. (On TPU the MXU computes f32 convs via bf16 passes by default —
    ~2e-3 — which is why this test pins the CPU backend via conftest.)"""
    cfg = CFG
    model = PointPillars(cfg)
    batch = _make_batch(rng, cfg)
    variables = model.init(jax.random.PRNGKey(0), batch)
    outs_j, outs_t = _run_both(model, variables, batch, cfg)
    assert outs_j[0].shape == (cfg.num_anchors, cfg.num_classes)
    assert outs_j[1].shape == (cfg.num_anchors, 7)
    assert outs_j[2].shape == (cfg.num_anchors, 2)
    for a, b in zip(outs_j, outs_t):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=1e-4)


def test_deconv_kernel_mapping_exact(rng):
    """flax ConvTranspose(k=s, VALID) == torch ConvTranspose2d(k=s) with the
    spatially-flipped kernel — the one non-obvious mapping in the converter.
    A single layer has no chaos amplification, so this is tight."""
    import flax.linen as nn

    x = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    k = rng.normal(size=(2, 2, 3, 5)).astype(np.float32)
    mod = nn.ConvTranspose(5, (2, 2), strides=(2, 2), padding="VALID",
                           use_bias=False)
    y_flax = mod.apply({"params": {"kernel": jnp.asarray(k)}}, jnp.asarray(x))
    tc = torch.nn.ConvTranspose2d(3, 5, 2, stride=2, bias=False)
    tc.weight.data = torch.from_numpy(k[::-1, ::-1].copy()).permute(2, 3, 0, 1)
    y_t = tc(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y_flax), y_t.numpy(), atol=1e-5)


def test_flax_torch_forward_parity_jittered_bn(rng):
    """With jittered BN affine/stats, pre-activations land near ReLU
    boundaries where f32 backend rounding flips units discretely — so assert
    robust agreement (tiny median, bounded tail) rather than elementwise."""
    cfg = CFG
    model = PointPillars(cfg)
    batch = _make_batch(rng, cfg)
    variables = _random_variables(rng, model, batch)
    outs_j, outs_t = _run_both(model, variables, batch, cfg)
    for a, b in zip(outs_j, outs_t):
        d = np.abs(np.asarray(a) - b.numpy())
        assert np.median(d) < 1e-5
        assert d.max() < 2e-3  # rare ReLU-boundary flips under jittered BN


def test_state_dict_covers_torch_model():
    cfg = CFG
    model = PointPillars(cfg)
    batch = PillarBatch(
        jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar,
                   cfg.num_decorated_features)),
        jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar), bool),
        jnp.zeros((cfg.max_pillars, 2), jnp.int32),
        jnp.zeros((cfg.max_pillars,), bool),
    )
    variables = model.init(jax.random.PRNGKey(0), batch)
    sd = flax_to_torch(variables, cfg)
    tmodel = TorchPointPillars(cfg)
    # must be a perfect 1:1 key match — no silently missing layers
    tmodel.load_state_dict(sd, strict=True)


def test_torch_to_flax_round_trip_bit_identical(rng):
    """The migration importer (torch_to_flax) is the exact inverse of
    flax_to_torch: flax -> torch -> flax round-trips bit-for-bit, so
    reference-trained torch weights serve here unchanged."""
    from tpu_pillars.reference_cpu.convert import torch_to_flax

    cfg = CFG
    model = PointPillars(cfg)
    batch = _make_batch(rng, cfg)
    variables = _random_variables(rng, model, batch)

    back = torch_to_flax(flax_to_torch(variables, cfg), cfg)

    want = {"params": jax.tree.map(np.asarray, variables["params"]),
            "batch_stats": jax.tree.map(np.asarray,
                                        variables["batch_stats"])}
    assert (jax.tree_util.tree_structure(back)
            == jax.tree_util.tree_structure(want))
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and the imported tree actually drives the model
    outs = model.apply(back, batch)
    ref = model.apply(variables, batch)
    np.testing.assert_array_equal(np.asarray(outs.cls_logits),
                                  np.asarray(ref.cls_logits))


def test_torch_to_flax_missing_key_is_loud(rng):
    import pytest

    from tpu_pillars.reference_cpu.convert import torch_to_flax

    cfg = CFG
    model = PointPillars(cfg)
    batch = _make_batch(rng, cfg)
    sd = flax_to_torch(_random_variables(rng, model, batch), cfg)
    del sd["rpn.ups.1.0.weight"]
    with pytest.raises(KeyError, match="rpn.ups.1.0.weight"):
        torch_to_flax(sd, cfg)


def test_detector_from_torch(rng, tmp_path):
    """Detector.from_torch accepts a state_dict, a saved .pth file, and a
    whole nn.Module; all three serve the same boxes."""
    from tpu_pillars.detector import Detector
    from tpu_pillars.reference_cpu.model import TorchPointPillars

    cfg = CFG
    torch.manual_seed(3)
    tmodel = TorchPointPillars(cfg)
    path = str(tmp_path / "weights.pth")
    torch.save(tmodel.state_dict(), path)

    pts = np.zeros((400, 4), np.float32)
    pts[:, 0] = rng.uniform(cfg.x_min, cfg.x_max, 400)
    pts[:, 1] = rng.uniform(cfg.y_min, cfg.y_max, 400)
    pts[:, 2] = rng.uniform(cfg.z_min, cfg.z_max, 400)
    pts[:, 3] = rng.uniform(0, 1, 400)

    outs = [Detector.from_torch(cfg, src).predict(pts)
            for src in (tmodel.state_dict(), path, tmodel)]
    assert len({len(o) for o in outs}) == 1
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_array_equal(a.center, b.center)
    for a, b in zip(outs[0], outs[2]):
        np.testing.assert_array_equal(a.center, b.center)
