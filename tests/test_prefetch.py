"""Async input pipeline (train/prefetch.py + dataset_batches(num_workers)):
order/content preservation, exception forwarding, shutdown, and the
worker-count-invariant stream contract."""

import time

import jax
import numpy as np
import pytest

from tpu_pillars.config import tiny_config
from tpu_pillars.data.augment import AugmentConfig
from tpu_pillars.data.fixture import build_fixture
from tpu_pillars.data.lyft import LyftDataset
from tpu_pillars.train.data import dataset_batches
from tpu_pillars.train.prefetch import device_prefetch, prefetch

CFG = tiny_config()


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("lyft_prefetch_fixture")
    return LyftDataset(build_fixture(str(root), CFG, num_scenes=2,
                                     samples_per_scene=3,
                                     sweeps_per_sample=1))


def test_prefetch_preserves_sequence():
    src = [np.full((3,), i) for i in range(20)]
    out = list(prefetch(iter(src), size=3))
    assert len(out) == 20
    for a, b in zip(src, out):
        np.testing.assert_array_equal(a, b)


def test_prefetch_forwards_exception_in_order():
    def gen():
        yield 1
        yield 2
        raise RuntimeError("boom")

    it = prefetch(gen(), size=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_prefetch_early_close_stops_producer():
    produced = []

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i

    it = prefetch(gen(), size=2)
    assert next(it) == 0
    it.close()  # must not hang; producer should stop promptly
    time.sleep(0.3)
    n = len(produced)
    time.sleep(0.2)
    assert len(produced) == n  # no further production after close
    assert n < 10_000


def test_device_prefetch_stages_committed_arrays():
    src = [{"a": np.arange(6, dtype=np.float32).reshape(2, 3), "b": i}
           for i in range(4)]
    out = list(device_prefetch(iter(src), size=2))
    assert len(out) == 4
    for s, o in zip(src, out):
        assert isinstance(o["a"], jax.Array)
        np.testing.assert_array_equal(np.asarray(o["a"]), s["a"])


def test_dataset_batches_worker_count_invariant(dataset):
    """num_workers must not change the stream: per-sample spawned RNGs make
    parallel == serial bit-for-bit (resume replay depends on this)."""
    from tpu_pillars.data.gt_sampler import GTDatabase, GTSampler

    db = GTDatabase.from_dataset(dataset, CFG, min_points=1)
    kw = dict(batch_size=2, max_gt_boxes=8, epochs=2, seed=7,
              augment=AugmentConfig(), gt_sampler=GTSampler(db))
    serial = list(dataset_batches(dataset, CFG, num_workers=0, **kw))
    threaded = list(dataset_batches(dataset, CFG, num_workers=3, **kw))
    assert len(serial) == len(threaded) > 0
    for a, b in zip(serial, threaded):
        for fa, fb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


@pytest.mark.slow
def test_fit_through_device_prefetch():
    """fit() consumes a device_prefetch-staged synthetic stream unchanged:
    same losses as the synchronous stream."""
    from tpu_pillars.train import TrainConfig, create_train_state
    from tpu_pillars.train.loop import fit, synthetic_batches

    tcfg = TrainConfig(batch_size=2, max_gt_boxes=8, total_steps=2)
    losses = []
    for wrap in (lambda it: it, lambda it: device_prefetch(it, size=2)):
        state = create_train_state(CFG, tcfg, rng_key=jax.random.PRNGKey(0))
        stream = wrap(synthetic_batches(CFG, tcfg, seed=3, num_objects=2,
                                        clutter=50))

        seen = []

        def step_probe(state, batch, _seen=seen):
            _seen.append(float(np.asarray(batch.points).sum()))
            from tpu_pillars.train.step import make_train_step
            if not hasattr(step_probe, "fn"):
                step_probe.fn = jax.jit(make_train_step(CFG, iou_chunk=4096))
            return step_probe.fn(state, batch)

        out = fit(state, stream, steps=2, step_fn=step_probe, config=CFG)
        assert int(out.step) == 2
        losses.append(seen)
    assert losses[0] == losses[1]  # staged stream bit-matches synchronous
