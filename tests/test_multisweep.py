"""Multi-sweep operating point (BASELINE config #4: accumulated clouds,
larger pillar budget, dt feature channel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pillars.config import tiny_config
from tpu_pillars.data.fixture import build_fixture
from tpu_pillars.data.lyft import LyftDataset
from tpu_pillars.detector import Detector
from tpu_pillars.models import PointPillars
from tpu_pillars.ops.voxelize import PillarBatch, pillarize
from tpu_pillars.reference_cpu.pillarizer import pillarize_np

MS_CFG = tiny_config(num_sweeps=3, max_points=8192, max_pillars=768,
                     max_points_per_pillar=24)


def _variables(cfg):
    model = PointPillars(cfg)
    dummy = PillarBatch(
        jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar,
                   cfg.num_decorated_features)),
        jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar), bool),
        jnp.zeros((cfg.max_pillars, 2), jnp.int32),
        jnp.zeros((cfg.max_pillars,), bool),
    )
    return model.init(jax.random.PRNGKey(3), dummy)


def test_config_shapes():
    assert MS_CFG.num_decorated_features == 10  # x,y,z,i,dt + 3 + 2


def test_pillarizer_passes_dt_channel(rng):
    n = 500
    pts = np.zeros((n, 5), np.float32)
    pts[:, 0] = rng.uniform(MS_CFG.x_min, MS_CFG.x_max, n)
    pts[:, 1] = rng.uniform(MS_CFG.y_min, MS_CFG.y_max, n)
    pts[:, 2] = rng.uniform(MS_CFG.z_min, MS_CFG.z_max, n)
    pts[:, 3] = rng.uniform(0, 1, n)
    pts[:, 4] = rng.choice([0.0, 0.1, 0.2], n)  # sweep lags

    ref_feats, ref_mask, _, _ = pillarize_np(pts, MS_CFG)
    padded = np.full((MS_CFG.max_points, 5), 1e6, np.float32)
    padded[:n] = pts
    got = pillarize(jnp.asarray(padded), np.int32(n), MS_CFG)
    np.testing.assert_allclose(np.asarray(got.features), ref_feats, atol=1e-5)
    # the dt channel is column 4 of the decorated features
    dts = np.asarray(got.features)[np.asarray(got.mask)][:, 4].astype(np.float64)
    uniq = np.unique(np.round(dts, 6))
    assert all(any(abs(u - v) < 1e-6 for v in (0.0, 0.1, 0.2)) for u in uniq)


def test_multisweep_detector_end_to_end(rng, tmp_path):
    """Fixture sweeps -> accumulate -> detect: the full config-#4 path."""
    json_dir = build_fixture(str(tmp_path), MS_CFG, num_scenes=1,
                             samples_per_scene=2, sweeps_per_sample=3)
    ds = LyftDataset(json_dir)
    det = Detector(MS_CFG, _variables(MS_CFG))

    tok = ds.sample_tokens()[1]
    cloud = ds.load_sweeps(tok, num_sweeps=3)          # (N, 6) x,y,z,i,ring,dt
    pts = np.concatenate([cloud[:, :4], cloud[:, 5:6]], axis=1)
    boxes = det.predict(pts, token=tok)
    assert isinstance(boxes, list)
    # multi-sweep cloud is ~3x denser than a single sweep
    single = ds.load_point_cloud(ds.lidar_sample_data(tok))
    assert len(cloud) == 3 * len(single)


def test_pad_points_rejects_missing_dt():
    det = Detector(MS_CFG, _variables(MS_CFG))
    with pytest.raises(ValueError, match="feature columns"):
        det.pad_points(np.zeros((10, 4), np.float32))


def test_pad_points_drops_extra_columns(rng):
    cfg = tiny_config()
    det = Detector(cfg, _variables(cfg))
    # in-range xyz (host_crop is on by default) + intensity + a ring column
    pts = np.stack([rng.uniform(-15, 15, 20), rng.uniform(-15, 15, 20),
                    rng.uniform(-2, 2, 20), rng.uniform(0, 1, 20),
                    rng.integers(0, 32, 20)], axis=1).astype(np.float32)
    padded, n = det.pad_points(pts)
    assert padded.shape == (cfg.max_points, 4)
    assert n == 20
    np.testing.assert_array_equal(padded[:20], pts[:, :4])
