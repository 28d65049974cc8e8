"""Training driver (SURVEY.md L4 / 3.2, rebuilt): batches in, jitted
train_step on device, JSONL metrics, periodic checkpoints, optional
data-parallel mesh. Runnable directly for a synthetic-data smoke train:

    python -m tpu_pillars.train.loop --steps 200 --batch 4 --out /tmp/run
"""

from __future__ import annotations

import argparse
import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from tpu_pillars.config import PillarsConfig, tiny_config
from tpu_pillars.data.synthetic import make_scene, scenes_to_train_batch
from tpu_pillars.train.checkpoint import save_checkpoint
from tpu_pillars.train.state import TrainConfig, TrainState, create_train_state
from tpu_pillars.train.step import TrainBatch, make_train_step
from tpu_pillars.utils.logging import JsonlLogger


def synthetic_batches(config: PillarsConfig, tcfg: TrainConfig, seed: int = 0,
                      augment: bool = False,
                      **scene_kw) -> Iterable[TrainBatch]:
    """Endless stream of synthetic-scene batches (SURVEY.md section 4:
    synthetic scenes are the data story absent the real dataset)."""
    from tpu_pillars.data.augment import augment_scene

    rng = np.random.default_rng(seed)
    while True:
        scenes = []
        for _ in range(tcfg.batch_size):
            scene = make_scene(rng, config, **scene_kw)
            if augment:
                pts, boxes = augment_scene(rng, scene.points, scene.gt_boxes)
                scene = scene.__class__(pts, boxes, scene.gt_classes,
                                        scene.boxes)
            scenes.append(scene)
        yield TrainBatch(*scenes_to_train_batch(scenes, config,
                                                tcfg.max_gt_boxes))


def fit(state: TrainState, batches: Iterable[TrainBatch], steps: int,
        step_fn: Optional[Callable] = None, config: PillarsConfig = None,
        logger: Optional[JsonlLogger] = None, log_every: int = 10,
        ckpt_path: Optional[str] = None, ckpt_every: int = 500,
        eval_fn: Optional[Callable] = None,
        eval_every: int = 1000,
        stop: Optional[Callable[[], bool]] = None,
        heartbeat=None, guard=None, ema=None) -> TrainState:
    """Run `steps` optimizer steps. step_fn defaults to the jitted
    single-device train step for `config`.

    eval_fn, if given, is called as eval_fn(state) every `eval_every` steps
    (and at the end); its returned dict is logged as an 'eval' event — e.g.
    a closure running evaluation.pipeline.evaluate_dataset on a val split.

    Elastic hooks (train/elastic.py): `stop` is polled before each step —
    when it goes true (e.g. a GracefulShutdown caught SIGTERM) the loop
    logs a 'preempted' event, checkpoints, and returns cleanly for a
    --resume restart. `heartbeat` gets .beat(step) every step (host-side
    counter: no device sync added). `guard` (NaNGuard) gets
    .observe(state, loss) at the logging cadence, where the loss is on
    host anyway.

    ema (train/ema.py EmaTracker): updated after every step; eval runs on
    BOTH the raw and EMA weights (the EMA metrics get an '_ema' suffix),
    and every checkpoint write also exports `ckpt_path + '.ema'` — an
    inference-only artifact of the EMA weights (loads through
    Detector.from_checkpoint; resume correctly refuses it)."""
    if step_fn is None:
        step_fn = jax.jit(make_train_step(config))
    logger = logger or JsonlLogger(echo=False)
    t0 = time.perf_counter()
    step0 = int(state.step)

    def run_eval():
        if eval_fn is None:
            return
        metrics = dict(eval_fn(state) or {})
        if ema is not None:
            for k, v in (eval_fn(ema.swap_into(state)) or {}).items():
                metrics[f"{k}_ema"] = v
        logger.log("eval", step=int(state.step),
                   **{k: float(v) for k, v in metrics.items()})

    def save_all(path):
        save_checkpoint(path, state, config=config)
        if ema is not None:
            from tpu_pillars.train.checkpoint import (
                export_inference_checkpoint,
            )

            export_inference_checkpoint(path + ".ema", ema.swap_into(state),
                                        config=config)

    i = -1
    for i, batch in enumerate(batches):
        if i >= steps:
            break
        if stop is not None and stop():
            logger.log("preempted", step=step0 + i)
            break
        state, losses = step_fn(state, batch)
        if ema is not None:
            ema.update(state.params)
        if heartbeat is not None:
            heartbeat.beat(step0 + i + 1)
        if (i + 1) % log_every == 0 or i + 1 == steps:
            loss_val = float(losses.total)
            logger.log(
                "train_step", step=int(state.step),
                loss=loss_val, cls=float(losses.cls),
                loc=float(losses.loc), dir=float(losses.dir),
                num_pos=float(losses.num_pos),
                steps_per_s=round((i + 1) / (time.perf_counter() - t0), 3),
            )
            if guard is not None:
                guard.observe(state, loss_val)
        if ckpt_path and (i + 1) % ckpt_every == 0:
            save_all(ckpt_path)
            logger.log("checkpoint", step=int(state.step), path=ckpt_path)
        if eval_fn is not None and (i + 1) % eval_every == 0 and i + 1 < steps:
            run_eval()
    if ckpt_path:
        save_all(ckpt_path)
    if i >= 0:
        run_eval()
    return state


def make_synthetic_eval_fn(config: PillarsConfig, num_scenes: int = 8,
                           seed: int = 100_000, **scene_kw):
    """eval_fn for `fit`: detection mAP on a fixed held-out synthetic split.

    The Detector (and its jitted programs) is built once on first call and
    reused — only `variables` are swapped per evaluation."""
    from tpu_pillars.detector import Detector
    from tpu_pillars.evaluation.pipeline import evaluate_scenes

    rng = np.random.default_rng(seed)
    scenes = [make_scene(rng, config, **scene_kw) for _ in range(num_scenes)]
    cache: list = []

    def eval_fn(state: TrainState):
        if not cache:
            cache.append(Detector(config, state.variables))
        det = cache[0]
        det.variables = state.variables
        mAP, _table = evaluate_scenes(det, scenes)
        return {"mAP": mAP}

    return eval_fn


def main() -> None:
    import itertools
    import os

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--out", type=str, default="/tmp/tpu_pillars_run")
    p.add_argument("--data", type=str, default=None,
                   help="Lyft-format dataset directory (data.lyft.LyftDataset"
                        " json root). Default: seeded synthetic scenes")
    p.add_argument("--workers", type=int, default=4,
                   help="thread-pool width for per-sample dataset loads "
                        "(--data only; any value yields the same stream)")
    p.add_argument("--no-augment", action="store_true",
                   help="disable the global flip/rotate/scale/translate "
                        "augmentation on dataset samples")
    p.add_argument("--object-noise", action="store_true",
                   help="per-object augmentation: independent yaw jitter + "
                        "xy translation of each GT box and its points, "
                        "collision-rejected (--data only)")
    p.add_argument("--cbgs", type=float, default=0.0,
                   help="class-balanced scene resampling (CBGS, "
                        "arXiv:1908.09492): >0 resamples the train tokens "
                        "so every class gets an equal share; the value is "
                        "the output/input length ratio (1.0 = same-size "
                        "epoch). Composes with --gt-sample (--data only).")
    p.add_argument("--gt-sample", type=int, default=0,
                   help="if > 0, GT-database sampling augmentation: paste-"
                        "inject stored objects until each class has N "
                        "instances per scene (--data only)")
    p.add_argument("--val-samples", type=int, default=8,
                   help="with --data and --eval-every: hold out the last N "
                        "samples for detection-mAP eval (never trained on)")
    p.add_argument("--full-size", action="store_true",
                   help="full 400x400 config instead of the tiny smoke config")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--remat", choices=("all", "pfn", "rpn", "off"),
                   default="all",
                   help="activation checkpointing tier: 'all' (default; "
                        "required for batch-8 full-size), 'pfn' keeps the "
                        "RPN conv activations saved (recompute-free conv "
                        "backward when memory allows), 'rpn'/'off'")
    p.add_argument("--no-fused-frontend", action="store_true",
                   help="force the classic pillarize+decorate+PFN train "
                        "forward instead of the fused emit-table front end "
                        "(TPU default; see ops/fused_pfn.py)")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel training over the first N local "
                        "devices: per-shard shard_map step with sync-BN "
                        "psums and pmean'd grads (parallel/train_dp.py). "
                        "--batch must divide by N")
    p.add_argument("--accum", type=int, default=1,
                   help="gradient-accumulation microbatches per step: the "
                        "batch is split in --accum equal microbatches, "
                        "grads averaged, ONE optimizer update (per-"
                        "microbatch BN moments; composes with remat to "
                        "push effective batch past the HBM ceiling)")
    p.add_argument("--ema", type=float, default=0.0,
                   help="parameter-EMA decay (e.g. 0.999); 0 disables. "
                        "Evals run on raw AND EMA weights; checkpoints "
                        "also export <ckpt>.ema inference weights")
    p.add_argument("--bf16", action="store_true",
                   help="mixed-precision training: bf16 activations, "
                        "f32 params/optimizer/BN stats/losses")
    p.add_argument("--resume", action="store_true",
                   help="continue from {out}/ckpt.msgpack if it exists: "
                        "restores params/opt_state/step and fast-forwards "
                        "the seeded data stream so the loss curve continues "
                        "exactly where the killed run left off")
    p.add_argument("--prefetch", type=int, default=2,
                   help="input-pipeline depth: batches built ahead in a "
                        "background thread and device_put off the critical "
                        "path (0 = synchronous)")
    p.add_argument("--eval-every", type=int, default=0,
                   help="if > 0, log detection mAP on a held-out synthetic "
                        "split every N steps (and at the end)")
    p.add_argument("--eval-scenes", type=int, default=8)
    p.add_argument("--tensorboard", action="store_true",
                   help="also write TensorBoard scalar events to "
                        "{out}/tb (dependency-free writer, "
                        "utils/tensorboard.py)")
    p.add_argument("--platform", choices=("auto", "cpu"), default="auto",
                   help="'cpu' pins the CPU backend BEFORE first device use "
                        "(this image's TPU plugin ignores JAX_PLATFORMS; the "
                        "chip is single-client, so subprocess smoke runs "
                        "must not touch it)")
    args = p.parse_args()

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    config = PillarsConfig() if args.full_size else tiny_config()
    tcfg = TrainConfig(learning_rate=args.lr, total_steps=args.steps,
                       batch_size=args.batch,
                       compute_dtype="bfloat16" if args.bf16 else "float32")
    state = create_train_state(config, tcfg,
                               rng_key=jax.random.PRNGKey(args.seed))

    mesh = batch_sharding = None
    if args.dp > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        from tpu_pillars.parallel import make_mesh_n

        if args.batch % args.dp:
            raise SystemExit(f"--batch {args.batch} must divide by "
                             f"--dp {args.dp}")
        mesh = make_mesh_n(args.dp)
        batch_sharding = NamedSharding(mesh, PartitionSpec("data"))

    ckpt_path = f"{args.out}/ckpt.msgpack"
    start = 0
    if args.resume and os.path.exists(ckpt_path):
        from tpu_pillars.train.checkpoint import restore_checkpoint

        state = restore_checkpoint(ckpt_path, state, config=config)
        start = int(state.step)

    eval_fn = None
    if args.data:
        from tpu_pillars.data.augment import AugmentConfig
        from tpu_pillars.data.lyft import LyftDataset
        from tpu_pillars.train.data import dataset_batches

        ds = LyftDataset(args.data)
        tokens = list(ds.sample_tokens())
        train_tokens = tokens
        if args.eval_every > 0 and args.val_samples > 0:
            n_val = min(args.val_samples, max(len(tokens) - args.batch, 0))
            train_tokens = tokens[: len(tokens) - n_val]
            val_tokens = tokens[len(tokens) - n_val:]
            if val_tokens:
                from tpu_pillars.detector import Detector
                from tpu_pillars.evaluation.pipeline import evaluate_dataset

                det_cache: list = []

                def eval_fn(state, _ds=ds, _tok=val_tokens):
                    if not det_cache:
                        det_cache.append(Detector(config, state.variables))
                    det = det_cache[0]
                    det.variables = state.variables
                    mAP, _t, _p = evaluate_dataset(det, _ds,
                                                   sample_tokens=_tok)
                    return {"mAP": mAP}
        gt_sampler = None
        if args.gt_sample > 0:
            from tpu_pillars.data.gt_sampler import (
                GTDatabase, GTSampleConfig, GTSampler,
            )

            db = GTDatabase.from_dataset(ds, config, tokens=train_tokens)
            gt_sampler = GTSampler(
                db, GTSampleConfig(target_per_class=args.gt_sample))
        from tpu_pillars.data.augment import ObjectNoiseConfig

        if args.cbgs > 0:
            # balance AFTER the GT database build: the database's per-class
            # counts must come from the unique tokens (see docstring)
            from tpu_pillars.train.data import class_balanced_tokens

            train_tokens = class_balanced_tokens(
                ds, config, tokens=train_tokens, seed=args.seed,
                ratio=args.cbgs)
        batches = dataset_batches(
            ds, config, tcfg.batch_size, tcfg.max_gt_boxes,
            tokens=train_tokens,
            augment=None if args.no_augment else AugmentConfig(),
            object_noise=ObjectNoiseConfig() if args.object_noise else None,
            gt_sampler=gt_sampler, seed=args.seed,
            num_workers=max(args.workers, 0))
    else:
        if args.cbgs > 0:
            import sys
            print("warning: --cbgs needs --data; ignored on the synthetic "
                  "path", file=sys.stderr)
        batches = synthetic_batches(config, tcfg, seed=args.seed)
    if start:
        # the stream is a pure function of (seed, config): dropping the
        # first `start` batches replays exactly the data the killed run saw
        batches = itertools.islice(batches, start, None)
    if args.prefetch > 0:
        # content-preserving async staging (train/prefetch.py): batch k+1
        # is built and h2d-copied while step k runs (sharded straight onto
        # the mesh under --dp)
        from tpu_pillars.train.prefetch import device_prefetch

        batches = device_prefetch(batches, size=args.prefetch,
                                  device=batch_sharding)
    elif mesh is not None:
        from tpu_pillars.parallel import shard_train_batch

        batches = (shard_train_batch(b, mesh) for b in batches)

    if eval_fn is None and args.eval_every > 0 and not args.data:
        eval_fn = make_synthetic_eval_fn(config, num_scenes=args.eval_scenes,
                                         seed=args.seed + 100_000)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        state = jax.device_put(state, NamedSharding(mesh, PartitionSpec()))
        if eval_fn is not None:
            # the eval Detector runs single-device jits — hand it host
            # copies of the replicated state, not mesh-committed arrays
            eval_fn = (lambda st, _f=eval_fn: _f(jax.device_get(st)))

    from tpu_pillars.train.elastic import GracefulShutdown, Heartbeat, NaNGuard

    logger_ctx = JsonlLogger(f"{args.out}/train.jsonl", echo=True)
    if args.tensorboard:
        from tpu_pillars.utils.tensorboard import TeeLogger, TensorBoardWriter

        logger_ctx = TeeLogger(logger_ctx,
                               TensorBoardWriter(f"{args.out}/tb"))
    with logger_ctx as logger, \
            GracefulShutdown() as shutdown:
        logger.log("start", steps=args.steps, batch=args.batch,
                   resumed_at=start, backend=jax.default_backend(),
                   params=sum(x.size for x in jax.tree.leaves(state.params)))
        import jax.numpy as jnp

        per_shard = args.batch // args.dp if args.dp > 1 else args.batch
        if per_shard % args.accum:
            raise SystemExit(
                f"per-shard batch {per_shard} (--batch {args.batch}"
                + (f" / --dp {args.dp}" if args.dp > 1 else "")
                + f") must divide by --accum {args.accum}")
        step_kw = dict(
            compute_dtype=jnp.dtype(tcfg.compute_dtype),
            fused_frontend=False if args.no_fused_frontend else None,
            remat=args.remat,
            accum_steps=args.accum)
        if mesh is not None:
            from tpu_pillars.parallel import make_shardmap_train_step

            step_fn = make_shardmap_train_step(config, mesh, **step_kw)
        else:
            step_fn = jax.jit(make_train_step(config, **step_kw))
        from tpu_pillars.train.ema import maybe_tracker

        fit(state, batches, steps=max(0, args.steps - start), config=config,
            step_fn=step_fn, logger=logger, ckpt_path=ckpt_path,
            eval_fn=eval_fn, eval_every=args.eval_every or 1000,
            stop=shutdown,
            heartbeat=Heartbeat(f"{args.out}/heartbeat.json"),
            guard=NaNGuard(f"{args.out}/diverged.msgpack", config=config),
            ema=maybe_tracker(state.params, args.ema))


if __name__ == "__main__":
    main()
