"""Dataset -> TrainBatch loading over the on-disk fixture, driven through a
real train step (the reference's DataLoader tier, SURVEY.md 3.2)."""

import jax
import numpy as np
import pytest

from tpu_pillars.config import tiny_config
from tpu_pillars.data.augment import AugmentConfig
from tpu_pillars.data.fixture import build_fixture
from tpu_pillars.data.lyft import LyftDataset
from tpu_pillars.train import TrainConfig, create_train_state, make_train_step
from tpu_pillars.train.data import dataset_batches, sample_to_arrays

CFG = tiny_config()


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("lyft_train_fixture")
    return LyftDataset(build_fixture(str(root), CFG, num_scenes=2,
                                     samples_per_scene=2,
                                     sweeps_per_sample=1))


def test_sample_to_arrays(dataset):
    tok = dataset.sample_tokens()[0]
    pts, gb, gc, gv = sample_to_arrays(dataset, tok, CFG, max_gt_boxes=8)
    assert pts.shape[1] == CFG.num_raw_features
    assert gv.sum() == len(dataset.get_boxes_lidar(tok))
    # GT landed inside the range and with valid class ids
    assert (gc[gv] >= 0).all() and (gc[gv] < CFG.num_classes).all()
    assert np.abs(gb[gv][:, :2]).max() < CFG.x_max


def test_dataset_batches_epoch(dataset):
    batches = list(dataset_batches(dataset, CFG, batch_size=2, max_gt_boxes=8,
                                   epochs=1, seed=1))
    assert len(batches) == 2  # 4 samples / batch 2
    b = batches[0]
    assert b.points.shape == (2, CFG.max_points, 4)
    assert (b.num_points > 0).all()
    assert b.gt_valid.any()


@pytest.mark.slow
def test_train_step_on_dataset_batch(dataset):
    tcfg = TrainConfig(batch_size=2, max_gt_boxes=8, total_steps=10)
    state = create_train_state(CFG, tcfg)
    step = jax.jit(make_train_step(CFG, iou_chunk=4096))
    it = dataset_batches(dataset, CFG, batch_size=2, max_gt_boxes=8,
                         augment=AugmentConfig(), epochs=1)
    state, losses = step(state, next(it))
    assert np.isfinite(float(losses.total))
    assert float(losses.num_pos) > 0
    assert int(state.step) == 1


def test_dataset_batches_too_few_samples_raises(dataset):
    with pytest.raises(ValueError, match="batch_size"):
        next(iter(dataset_batches(dataset, CFG, batch_size=64,
                                  max_gt_boxes=8)))


def test_lyft_dataset_wrong_root_raises(tmp_path):
    """Passing the fixture ROOT (instead of the json table dir) must fail
    fast with a pointer to the right directory, not index zero scenes."""
    from tpu_pillars.data.fixture import build_fixture
    from tpu_pillars.data.lyft import LyftDataset

    root = str(tmp_path / "fxroot")
    json_dir = build_fixture(root, CFG, num_scenes=1, samples_per_scene=2,
                             sweeps_per_sample=1)
    assert json_dir != root
    with pytest.raises(FileNotFoundError, match="json TABLE dir"):
        LyftDataset(root)
    with pytest.raises(FileNotFoundError):
        LyftDataset(str(tmp_path / "nowhere"))


# --- CBGS scene-level class-balanced resampling (arXiv:1908.09492 §3.1) ---

def test_class_balanced_tokens_equal_share_and_determinism(dataset):
    from tpu_pillars.train.data import class_balanced_tokens

    tokens = dataset.sample_tokens()
    name_to_id = {c.name: i for i, c in enumerate(CFG.classes)}
    present = set()
    for tok in tokens:
        present |= {name_to_id[b.label] for b in dataset.get_boxes_lidar(tok)
                    if b.label in name_to_id}
    assert present  # fixture annotates known classes

    out = class_balanced_tokens(dataset, CFG, seed=3)
    share = max(1, round(len(tokens) / len(present)))
    assert len(out) == share * len(present)
    assert set(out) <= set(tokens)

    # every present class gets AT LEAST `share` draws via its own bucket
    # (a multi-class holder scene can also be drawn through another class's
    # bucket, so per-class frequency only approximately flattens)
    for ci in present:
        holders = {t for t in tokens
                   if any(name_to_id.get(b.label) == ci
                          for b in dataset.get_boxes_lidar(t))}
        drawn = sum(1 for t in out if t in holders)
        assert drawn >= share  # at least its own bucket's share

    assert class_balanced_tokens(dataset, CFG, seed=3) == out  # deterministic
    # ratio scales the epoch length
    out2 = class_balanced_tokens(dataset, CFG, seed=3, ratio=2.0)
    assert len(out2) == max(1, round(2.0 * len(tokens) / len(present))) \
        * len(present)


def test_class_balanced_tokens_feeds_dataset_batches(dataset):
    from tpu_pillars.train.data import class_balanced_tokens

    toks = class_balanced_tokens(dataset, CFG, seed=0, ratio=1.0)
    batches = list(dataset_batches(dataset, CFG, batch_size=2, max_gt_boxes=8,
                                   tokens=toks, epochs=1, seed=1))
    assert len(batches) == len(toks) // 2
    assert all((b.num_points > 0).all() for b in batches)


def test_class_balanced_tokens_no_known_classes_raises(dataset):
    from tpu_pillars.train.data import class_balanced_tokens

    class Empty:
        def sample_tokens(self):
            return ["a", "b"]

        def get_boxes_lidar(self, tok):
            return []

    with pytest.raises(ValueError, match="no sample contains"):
        class_balanced_tokens(Empty(), CFG)
