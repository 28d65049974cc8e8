"""AOT deployment artifacts: the detector's two compiled stages serialized
to portable StableHLO via `jax.export`.

The reference's deployment story is "load the torch checkpoint in the same
Python codebase" (SURVEY.md section 3.1/5 — `torch.save`/`load` of a
state_dict). The TPU-native equivalent is stronger: `jax.export` captures
each jitted stage (model -> wire tensors, postprocess -> packed detections)
as a self-contained serialized StableHLO module with the WEIGHTS BAKED IN
as constants — a serving process needs only this artifact plus
`jax.export.deserialize`; none of the model-building Python (flax modules,
Pallas kernel sources, anchor generators) has to exist, match versions, or
retrace. Pallas kernels survive serialization as mosaic custom calls in
the TPU lowering; the CPU lowering records the XLA fallback paths because
the build-time dispatchers choose by backend at trace time.

Artifact layout (a directory):
    manifest.json   config fields + fingerprint, batch sizes, platforms,
                    jax/export calling-convention versions
    model_b{B}.bin  serialized Exported: (B, M, F) f32 points, (B,) i32
                    counts -> wire tensors
    post_b{B}.bin   serialized Exported: wire tensors -> (B, D, 10) packed
                    detections

The two-executable split is preserved deliberately — it is the measured
serving structure (docs/PERF.md "two-executable inference split").

Round trip is exact: the deserialized stages run the very same compiled
computation, and tests pin packed outputs bit-for-bit against the live
Detector on the same weights.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from tpu_pillars.config import ClassSpec, PillarsConfig

_MANIFEST = "manifest.json"
_FORMAT_VERSION = 1


def config_to_dict(config: PillarsConfig) -> dict:
    return dataclasses.asdict(config)


def config_from_dict(d: dict) -> PillarsConfig:
    d = dict(d)
    d["classes"] = tuple(ClassSpec(**c) for c in d["classes"])
    for k in ("rpn_channels", "rpn_layers", "anchor_yaws"):
        d[k] = tuple(d[k])
    return PillarsConfig(**d)


def export_inference(config: PillarsConfig, variables, path: str,
                     batch_sizes: Sequence[int] = (1,),
                     dtype=jnp.float32, use_pallas_pfn: bool = True,
                     fused_frontend: Optional[bool] = None,
                     nms_impl: str = "auto",
                     platforms: Optional[Sequence[str]] = None) -> dict:
    """Serialize the inference pipeline (weights baked in) to `path`.

    batch_sizes: one (model, postprocess) pair is exported per static batch
    size (XLA shapes are static; serving picks the artifact that fits).
    platforms: lowering platforms for jax.export (default: the current
    backend). Returns the manifest dict."""
    from tpu_pillars.detector import (
        build_model_fn_batched, build_postprocess_fn, pack_detections,
    )
    from tpu_pillars.train.checkpoint import config_fingerprint

    config.validate()
    model_b = build_model_fn_batched(config, dtype=dtype,
                                     use_pallas_pfn=use_pallas_pfn,
                                     fused_frontend=fused_frontend)
    post_fn = build_postprocess_fn(config, nms_impl=nms_impl)
    post_packed_b = jax.vmap(lambda o, bx, d: pack_detections(
        post_fn(o, bx, d)))

    M, F = config.max_points, config.num_input_features
    os.makedirs(path, exist_ok=True)
    plats = list(platforms) if platforms is not None else None
    stages: Dict[str, dict] = {}
    for B in batch_sizes:
        spec_pts = jax.ShapeDtypeStruct((B, M, F), jnp.float32)
        spec_n = jax.ShapeDtypeStruct((B,), jnp.int32)
        exp_m = jax_export.export(
            jax.jit(lambda pts, n: model_b(variables, pts, n)),
            platforms=plats)(spec_pts, spec_n)
        wire_specs = [jax.ShapeDtypeStruct(a.shape, a.dtype)
                      for a in exp_m.out_avals]
        exp_p = jax_export.export(jax.jit(post_packed_b),
                                  platforms=plats)(*wire_specs)
        mf, pf = f"model_b{B}.bin", f"post_b{B}.bin"
        with open(os.path.join(path, mf), "wb") as f:
            f.write(exp_m.serialize())
        with open(os.path.join(path, pf), "wb") as f:
            f.write(exp_p.serialize())
        stages[str(B)] = {
            "model": mf, "post": pf,
            "wire_shapes": [list(a.shape) for a in exp_m.out_avals],
            "packed_shape": list(exp_p.out_avals[0].shape),
        }

    manifest = {
        "format_version": _FORMAT_VERSION,
        "config": config_to_dict(config),
        "config_fingerprint": config_fingerprint(config).tobytes().hex(),
        "batch_sizes": [int(b) for b in batch_sizes],
        "platforms": plats or [jax.default_backend()],
        "jax_version": jax.__version__,
        "stages": stages,
    }
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ExportedDetector:
    """Serving shell around a deserialized artifact: pad -> stage 1 ->
    stage 2 -> packed detections / Box3D list. No model-building code runs;
    only the serialized StableHLO executes."""

    def __init__(self, path: str):
        with open(os.path.join(path, _MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest["format_version"] != _FORMAT_VERSION:
            raise ValueError(
                f"artifact format {self.manifest['format_version']} != "
                f"reader format {_FORMAT_VERSION}")
        self.config = config_from_dict(self.manifest["config"])
        self.batch_sizes = sorted(self.manifest["batch_sizes"])
        self._calls: Dict[int, tuple] = {}
        for b_str, entry in self.manifest["stages"].items():
            with open(os.path.join(path, entry["model"]), "rb") as f:
                exp_m = jax_export.deserialize(f.read())
            with open(os.path.join(path, entry["post"]), "rb") as f:
                exp_p = jax_export.deserialize(f.read())
            self._calls[int(b_str)] = (jax.jit(exp_m.call),
                                       jax.jit(exp_p.call))

    def predict_packed_batch(self, points, num_points):
        """(B, M, F) f32 + (B,) i32 -> (B, D, 10) packed detections; B must
        be one of the exported batch sizes."""
        B = points.shape[0]
        if B not in self._calls:
            raise ValueError(
                f"batch {B} not in exported sizes {self.batch_sizes}")
        model, post = self._calls[B]
        return post(*model(jnp.asarray(points, jnp.float32),
                           jnp.asarray(num_points, jnp.int32)))

    def pad_points(self, points: np.ndarray):
        """First-N pad/truncate to the static point budget (the documented
        overflow policy; range cropping stays bit-identical either way
        because out-of-range points can never bin)."""
        M = self.config.max_points
        F = self.config.num_input_features
        pts = np.asarray(points, np.float32).reshape(-1, F)[:M]
        n = pts.shape[0]
        if n < M:
            pts = np.concatenate(
                [pts, np.zeros((M - n, F), np.float32)], axis=0)
        return pts, np.int32(n)

    def predict(self, points: np.ndarray, token: str = "",
                lidar_to_global=None) -> List:
        from tpu_pillars.detector import packed_to_boxes

        if 1 not in self._calls:
            raise ValueError("artifact was not exported with batch size 1")
        pts, n = self.pad_points(points)
        packed = self.predict_packed_batch(pts[None], np.asarray([n]))
        return packed_to_boxes(np.asarray(packed)[0], self.config,
                               token=token, lidar_to_global=lidar_to_global)


def load_inference(path: str) -> ExportedDetector:
    return ExportedDetector(path)


_PRESETS = {
    "full": lambda: PillarsConfig(),
    "car_only": None,      # resolved lazily below (import cycle hygiene)
    "multisweep": None,
    "tiny": None,
}


def _preset(name: str) -> PillarsConfig:
    from tpu_pillars.config import (
        car_only_config, multisweep_config, tiny_config,
    )

    return {
        "full": PillarsConfig,
        "car_only": car_only_config,
        "multisweep": multisweep_config,
        "tiny": tiny_config,
    }[name]()


def main(argv=None) -> None:
    """CLI: checkpoint -> deployment artifact.

    python -m tpu_pillars.export --ckpt ck.msgpack --out art/ \
        [--preset full] [--batch-sizes 1,8] [--platforms cpu,tpu]
    """
    import argparse

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--preset", default="full", choices=sorted(_PRESETS))
    ap.add_argument("--batch-sizes", default="1")
    ap.add_argument("--platforms", default=None,
                    help="comma-separated jax.export lowering platforms "
                         "(default: current backend)")
    args = ap.parse_args(argv)

    from tpu_pillars.detector import Detector

    config = _preset(args.preset)
    det = Detector.from_checkpoint(config, args.ckpt)
    sizes = tuple(int(b) for b in args.batch_sizes.split(","))
    plats = args.platforms.split(",") if args.platforms else None
    manifest = export_inference(config, det.variables, args.out,
                                batch_sizes=sizes, platforms=plats)
    print(json.dumps({"out": args.out,
                      "batch_sizes": manifest["batch_sizes"],
                      "platforms": manifest["platforms"]}))


if __name__ == "__main__":
    main()
