"""Detector — the public inference API (SURVEY.md L5: THE public API is
``dataset sample -> List[Box3D]`` with class/score/yaw).

The whole points -> pillars -> BEV -> RPN -> decode -> NMS pipeline runs on
device per the BASELINE.json north-star: the only host<->device transfers
per frame are the padded point cloud in and one packed (max_detections, 10)
array out. Batched inference is natively batched (one sort, one scatter, one
NHWC conv batch — not vmap; see ops.voxelize.pillarize_batch).
"""

from __future__ import annotations


from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pillars.config import PillarsConfig
from tpu_pillars.geometry.boxes import Box3D
from tpu_pillars.geometry.transforms import Pose
from tpu_pillars.models.pointpillars import PointPillars
from tpu_pillars.ops.anchors import make_anchors
from tpu_pillars.ops.postprocess import Detections


def build_forward_fn(config: PillarsConfig, dtype=jnp.float32):
    """Returns f(variables, points (M, F), num_points) -> Detections.

    Pure function — compose with jit / vmap / shard_map as needed.

    TPU note: an `optimization_barrier` separates the conv model from the
    anchor-space postprocess. Without it XLA fuses the 720k-anchor gathers /
    top_k into the conv epilogue: compile time explodes (~9 min measured on
    v5e) for no runtime benefit. For latency-critical serving use
    Detector, which runs the two halves as separate executables (device-
    resident hand-off) — that combination measured ~600x faster steady-state
    than the monolithic program on v5e.
    """
    stage1 = build_model_fn(config, dtype=dtype)
    stage2 = build_postprocess_fn(config)

    def forward(variables, points, num_points) -> Detections:
        own, box_p, dir_p = jax.lax.optimization_barrier(
            stage1(variables, points, num_points)
        )
        return stage2(own, box_p, dir_p)

    return forward


def _wire_head(config: PillarsConfig, dtype=jnp.float32):
    """Serving head: the three 1x1 head convs as explicit matmuls emitting
    the wire layout directly — (own, box_p, dir_p) with own (..., A) in
    CANONICAL anchor order (a = hw * A_loc + a_loc) and box_p/dir_p
    (..., 7, A) / (..., 2, A) feature-major in the conv-natural PERMUTED
    order (a'' = a_loc * HW + hw), consumed by ops.postprocess.postprocess_w.

    Why (measured v5e, batch 8, full config): the jit-boundary handoff of
    (k, A) transposed head outputs costs 15.2 ms — the transposes move the
    full 9+7+2 channel tensors through a layout flip. Computing the head as
    matmuls on the ONCE-transposed 384-channel feature map instead emits
    box/dir in the target feature-major layout for free (the matmul's
    output-channel axis IS the feature axis), and pre-permuting the weight
    COLUMNS (k-major instead of a_loc-major) makes the reshape to
    (..., k, A'') a no-op relabel: total handoff overhead ~2.3 ms. Only the
    9-way own-class select needs canonical order, and that comes from a thin
    (384, A_loc) matmul on the untransposed map. Same math as
    models.head.SSDHead — tests pin the end boxes equal."""
    K = len(config.classes)
    A_loc = config.anchors_per_loc
    # own-class logit channel of anchor a_loc: the head conv emits channels
    # (a_loc major, k minor); the class of anchor a_loc is a_loc // 2
    # (2 yaws per class — ops.anchors layout)
    own_ch = jnp.asarray([al * K + al // 2 for al in range(A_loc)])

    def colperm(k_dim):
        # new column (k * A_loc + a_loc) <- old column (a_loc * k_dim + k)
        k = np.arange(k_dim)[:, None]
        al = np.arange(A_loc)[None, :]
        return jnp.asarray((al * k_dim + k).reshape(-1))

    pb, pd = colperm(7), colperm(2)

    def head(head_params, feat):
        lead = feat.shape[:-3]
        hf, wf, c = feat.shape[-3:]
        hw, a = hf * wf, hf * wf * A_loc
        cast = lambda t: t.astype(dtype)  # noqa: E731 — matches nn.Conv dtype
        p = head_params
        wc = p["cls"]["kernel"].reshape(c, A_loc * K)
        wb = p["box"]["kernel"].reshape(c, A_loc * 7)
        wd = p["dir"]["kernel"].reshape(c, A_loc * 2)
        f = feat.reshape(lead + (hw, c))
        own = (f @ cast(wc[:, own_ch]) + cast(p["cls"]["bias"][own_ch]))
        ft = jnp.swapaxes(f, -1, -2)  # (..., 384, HW): ONE transpose
        box_p = (jnp.einsum("kc,...kh->...ch", cast(wb[:, pb]), ft)
                 + cast(p["box"]["bias"][pb])[:, None])
        dir_p = (jnp.einsum("kc,...kh->...ch", cast(wd[:, pd]), ft)
                 + cast(p["dir"]["bias"][pd])[:, None])
        return (own.reshape(lead + (a,)).astype(jnp.float32),
                box_p.reshape(lead + (7, a)).astype(jnp.float32),
                dir_p.reshape(lead + (2, a)).astype(jnp.float32))

    return head


def _use_fused_frontend(config: PillarsConfig, use_pallas_pfn: bool,
                        fused_frontend):
    """Resolve the fused-front-end switch: None = auto (TPU only — the
    interpret-mode emit kernel is correct but slow on CPU), subject to the
    fused kernel's power-of-two points/pillar requirement."""
    n = config.max_points_per_pillar
    if fused_frontend is None:
        fused_frontend = use_pallas_pfn and jax.default_backend() == "tpu"
    return fused_frontend and (n & (n - 1)) == 0


def build_canvas_fn(config: PillarsConfig, dtype=jnp.float32,
                    use_pallas_pfn: bool = True,
                    fused_frontend: bool | None = None):
    """Front half of stage 1: f(variables, points (M, F), num_points) ->
    BEV canvas (H, W, C). Shared by build_model_fn and the pillar-axis
    sharded front end (parallel.spatial). Dispatch rules: see
    build_model_fn."""
    from tpu_pillars.models.pointpillars import PointPillars as _PP
    from tpu_pillars.ops.bev_pallas import (
        scatter_to_bev_auto, scatter_to_bev_auto_pid,
    )
    from tpu_pillars.ops.emit_pallas import pillarize_auto
    from tpu_pillars.ops.fused_pfn import pillarize_pfn_fused
    from tpu_pillars.ops.pfn_pallas import fold_bn, pfn_fused

    model = PointPillars(config, dtype=dtype)

    def canvas_fn(variables, points, num_points):
        if _use_fused_frontend(config, use_pallas_pfn, fused_frontend):
            p = variables["params"]["pfn"]
            bs = variables["batch_stats"]["pfn"]["bn"]
            w, b = fold_bn(p["linear"]["kernel"], p["bn"]["scale"],
                           p["bn"]["bias"], bs["mean"], bs["var"])
            feats, pid_per, pmask = pillarize_pfn_fused(
                points[None], num_points[None], w, b, config)
            return scatter_to_bev_auto_pid(feats, pid_per, pmask,
                                           config)[0]
        elif use_pallas_pfn:
            batch = pillarize_auto(points, num_points, config)
            p = variables["params"]["pfn"]
            bs = variables["batch_stats"]["pfn"]["bn"]
            w, b = fold_bn(p["linear"]["kernel"], p["bn"]["scale"],
                           p["bn"]["bias"], bs["mean"], bs["var"])
            pillar_feats = pfn_fused(batch.features, batch.mask, w, b)
            return scatter_to_bev_auto(pillar_feats, batch.coords,
                                       batch.pillar_mask, config)
        else:
            batch = pillarize_auto(points, num_points, config)
            return model.apply(variables, batch,
                               method=_PP.canvas_from_batch)

    return canvas_fn


def build_model_fn(config: PillarsConfig, dtype=jnp.float32,
                   use_pallas_pfn: bool = True,
                   fused_frontend: bool | None = None):
    """Stage 1: points -> (own, box_p, dir_p) wire tensors, f32 (the
    _wire_head layout; stage 2 is postprocess_w).

    Default TPU path (`fused_frontend` auto): the decoration-free fused
    front end (ops.fused_pfn) — sort, emit kernel, one fused
    decorate+PFN kernel on the flat table, ring BEV scatter; the decorated
    (P, N, 9) tensor never exists. With `use_pallas_pfn` but no fusion the
    PillarFeatureNet runs as the standalone Pallas kernel (ops.pfn_pallas)
    on the decorated pillars. Off-TPU backends default to the XLA
    pillarize + interpret-mode PFN kernel, so fidelity tests cover every
    piece on the CPU backend too.
    """
    from tpu_pillars.models.pointpillars import PointPillars as _PP

    model = PointPillars(config, dtype=dtype)
    wire_head = _wire_head(config, dtype=dtype)
    canvas_fn = build_canvas_fn(config, dtype=dtype,
                                use_pallas_pfn=use_pallas_pfn,
                                fused_frontend=fused_frontend)

    def run_model(variables, points, num_points):
        canvas = canvas_fn(variables, points, num_points)
        # wire handoff: own canonical (A,), box/dir feature-major permuted
        # (k, A'') straight out of the head matmuls (see _wire_head — the
        # transposed (k, A) handoff this replaces cost 15.2 ms at batch 8,
        # this one ~2.3 ms)
        feat = model.apply(variables, canvas,
                           method=_PP.features_from_canvas)
        return wire_head(variables["params"]["head"], feat)

    return run_model


def build_canvas_fn_batched(config: PillarsConfig, dtype=jnp.float32,
                            use_pallas_pfn: bool = True,
                            fused_frontend: bool | None = None):
    """Front half of the batched stage 1: f(variables, points (B, M, F),
    num_points (B,)) -> BEV canvas (B, H, W, C). Natively batched (one
    sort, one emit launch, one conv-free scatter). Dispatch rules: see
    build_model_fn."""
    from tpu_pillars.models.pointpillars import PointPillars as _PP
    from tpu_pillars.ops.bev_pallas import (
        scatter_to_bev_auto, scatter_to_bev_auto_pid,
    )
    from tpu_pillars.ops.emit_pallas import pillarize_batch_auto
    from tpu_pillars.ops.fused_pfn import pillarize_pfn_fused
    from tpu_pillars.ops.pfn_pallas import fold_bn, pfn_fused

    model = PointPillars(config, dtype=dtype)

    def canvas_fn(variables, points, num_points):
        if _use_fused_frontend(config, use_pallas_pfn, fused_frontend):
            p = variables["params"]["pfn"]
            bs = variables["batch_stats"]["pfn"]["bn"]
            w, b = fold_bn(p["linear"]["kernel"], p["bn"]["scale"],
                           p["bn"]["bias"], bs["mean"], bs["var"])
            feats, pid_per, pmask = pillarize_pfn_fused(
                points, num_points, w, b, config)
            return scatter_to_bev_auto_pid(feats, pid_per, pmask, config)
        elif use_pallas_pfn:
            batch = pillarize_batch_auto(points, num_points, config)
            B, P, N, D = batch.features.shape
            p = variables["params"]["pfn"]
            bs = variables["batch_stats"]["pfn"]["bn"]
            w, b = fold_bn(p["linear"]["kernel"], p["bn"]["scale"],
                           p["bn"]["bias"], bs["mean"], bs["var"])
            flat = pfn_fused(batch.features.reshape(B * P, N, D),
                             batch.mask.reshape(B * P, N), w, b)
            return scatter_to_bev_auto(flat.reshape(B, P, -1), batch.coords,
                                       batch.pillar_mask, config)
        else:
            batch = pillarize_batch_auto(points, num_points, config)
            return model.apply(variables, batch,
                               method=_PP.canvas_from_batch)

    return canvas_fn


def build_model_fn_batched(config: PillarsConfig, dtype=jnp.float32,
                           use_pallas_pfn: bool = True,
                           fused_frontend: bool | None = None):
    """Natively batched stage 1: (B, M, F) points -> wire tensors
    (B, A) / (B, 7, A) / (B, 2, A) — see build_model_fn / _wire_head.

    vmap-ing the single-sweep fn would also vmap the Pallas kernels (slow
    batching rule); instead the whole front end is natively batched: one
    sort, one emit launch, one fused-PFN launch (or one (B*P, N, D) PFN
    launch on the un-fused path), one NHWC conv batch. See build_model_fn
    for the fused-front-end dispatch rules.
    """
    from tpu_pillars.models.pointpillars import PointPillars as _PP

    model = PointPillars(config, dtype=dtype)
    wire_head = _wire_head(config, dtype=dtype)
    canvas_fn = build_canvas_fn_batched(config, dtype=dtype,
                                        use_pallas_pfn=use_pallas_pfn,
                                        fused_frontend=fused_frontend)

    def run_model(variables, points, num_points):
        canvas = canvas_fn(variables, points, num_points)
        # wire handoff (see build_model_fn / _wire_head)
        feat = model.apply(variables, canvas,
                           method=_PP.features_from_canvas)
        return wire_head(variables["params"]["head"], feat)

    return run_model


def build_postprocess_fn(config: PillarsConfig, nms_impl: str = "auto"):
    """Stage 2: wire tensors (own, box_p, dir_p) -> Detections (anchors
    closed over). Consumes the _wire_head stage-1 handoff; same math as
    ops.postprocess.postprocess (tests pin them equal).

    nms_impl: "auto" (default — block-gated Pallas overlap kernel on TPU,
    XLA fixpoint elsewhere; measured 2026-08-18: full batch-8 postprocess
    31.2 vs 34.4 ms, keep sets identical), or force "fixpoint"/"pallas"."""
    from tpu_pillars.ops.postprocess import postprocess_w, resolve_nms_impl

    resolve_nms_impl(nms_impl)                   # fail at build, not trace
    anchors, anchor_cls = make_anchors(config)
    anchors_j = jnp.asarray(anchors)
    anchor_cls_j = jnp.asarray(anchor_cls)

    def run_post(own, box_p, dir_p) -> Detections:
        return postprocess_w(own, box_p, dir_p,
                             anchors_j, anchor_cls_j, config,
                             nms_impl=nms_impl)

    return run_post


class Detector:
    """Host-facing wrapper: pads clouds to the static budget, runs the jitted
    pipeline, converts to Box3D (optionally into the global frame)."""

    def __init__(self, config: PillarsConfig, variables, dtype=jnp.float32,
                 use_pallas_pfn: bool = True, wire_dtype=jnp.float32,
                 fused_frontend: bool | None = None,
                 host_crop: bool = True,
                 wire_buckets: "Optional[tuple]" = None,
                 nms_impl: str = "auto"):
        """wire_dtype: dtype of the host->device point upload. Two 2-byte
        options halve the per-sweep transfer (the dominant serving cost on
        PCIe/tunnel links); both are opt-in because they break bit-for-boxes
        fidelity vs the f32 reference:
          * jnp.float16 — ~5 cm coordinate quantization at 100 m. Measured
            (r3, trained weights): large drift — the 5 cm shifts flip cell
            assignments near pillar edges. Prefer int16.
          * jnp.int16 — fixed-point with per-channel scales (coordinates at
            range/32767, ~3 mm at the 100 m config; intensity at 0.01; dt
            at 1/8192). ~16x finer coordinates than f16 at the same wire
            width. Measured r3 caveats: boxes still drift where quantized
            points rebin across cell borders (p99 ~0.5 m on a half-trained
            full-config model), and THIS environment's axon tunnel
            fast-paths f32 uploads — int16 measured 3x slower end-to-end
            here despite half the bytes. Intended for real PCIe/NVLink
            hosts; benchmark on your link before adopting.

        fused_frontend: None = auto (decoration-free fused front end on
        TPU, classic pillarize+PFN elsewhere); True/False forces it.

        host_crop: drop points outside the detection range on the host
        before upload (default on). EXACTLY mirrors the device validity
        predicate, so boxes are bit-identical — cropped points could never
        bin into the grid — while the upload shrinks to the in-range count
        (the transfer is the dominant single-sweep serving cost). The only
        semantic difference is strictly better truncation: the first-N
        budget now counts in-range points only.

        nms_impl: "auto" (default: Pallas block-gated NMS on TPU, XLA
        fixpoint elsewhere) or force "fixpoint"/"pallas" — see
        build_postprocess_fn.

        wire_buckets: optional ascending static upload sizes (last entry
        must be config.max_points), e.g. (16384, 65536, 131072). Each sweep
        pads to the smallest bucket that fits its (cropped) cloud; jit
        compiles one executable per bucket on first use. Smaller buckets
        cut both the upload AND the on-chip sort/emit work for sparse
        sweeps. None = single full-size shape (the default)."""
        from tpu_pillars.utils.truncation import TruncationStats

        config.validate()
        self.config = config
        self.variables = variables
        # overflow policy: pad_points keeps the FIRST max_points rows and
        # records any drop here (and warns once) — never silent truncation
        self.truncation = TruncationStats()
        self.wire_dtype = wire_dtype
        self.host_crop = host_crop
        if wire_buckets is not None:
            wire_buckets = tuple(sorted(int(b) for b in wire_buckets))
            if wire_buckets[-1] != config.max_points:
                raise ValueError(
                    f"wire_buckets must end at config.max_points="
                    f"{config.max_points}; got {wire_buckets}")
        self.wire_buckets = wire_buckets
        _wire_np = np.dtype(jnp.dtype(wire_dtype).name)
        self._wire_np = _wire_np
        _f_expect = config.num_input_features
        if _wire_np == np.int16:
            span = max(abs(config.x_min), abs(config.x_max),
                       abs(config.y_min), abs(config.y_max),
                       abs(config.z_min), abs(config.z_max))
            scales = np.full((_f_expect,), 0.01, np.float32)
            scales[:3] = span * 1.25 / 32767.0
            if config.num_sweeps > 1:
                scales[_f_expect - 1] = 1.0 / 8192.0
            self._wire_scales = scales
        else:
            self._wire_scales = None
        # two executables, device-resident hand-off (see build_forward_fn)
        base_model_fn = build_model_fn(config, dtype=dtype,
                                       use_pallas_pfn=use_pallas_pfn,
                                       fused_frontend=fused_frontend)
        base_model_fn_b = build_model_fn_batched(
            config, dtype=dtype, use_pallas_pfn=use_pallas_pfn,
            fused_frontend=fused_frontend)

        scales_j = (jnp.asarray(self._wire_scales)
                    if self._wire_scales is not None else None)

        def dequant(points):
            p = points.astype(jnp.float32)
            return p * scales_j if scales_j is not None else p

        def model_fn(variables, points, num_points):
            return base_model_fn(variables, dequant(points), num_points)

        def model_fn_b(variables, points, num_points):
            return base_model_fn_b(variables, dequant(points), num_points)

        post_fn = build_postprocess_fn(config, nms_impl=nms_impl)
        self._model = jax.jit(model_fn)
        self._post = jax.jit(post_fn)
        self._model_batch = jax.jit(model_fn_b)
        self._post_batch = jax.jit(jax.vmap(post_fn))

        # wire format: one (D, 10) array per sweep -> a single device-to-host
        # transfer [x, y, z, w, l, h, yaw, score, class, valid]
        def post_packed(own, box_p, dir_p):
            return pack_detections(post_fn(own, box_p, dir_p))

        self._post_packed = jax.jit(post_packed)
        self._post_packed_batch = jax.jit(jax.vmap(post_packed))

    def _forward(self, variables, points, num_points) -> Detections:
        return self._post(*self._model(variables, points, num_points))

    def _forward_batch(self, variables, points, num_points) -> Detections:
        return self._post_batch(*self._model_batch(variables, points,
                                                   num_points))

    # --- raw (device arrays, static shapes) ---

    def pad_points(self, points: np.ndarray):
        """Pad/crop to a static (M, F) upload shape. F is pinned by the
        config: num_raw_features raw channels plus the sweep-lag channel when
        multi-sweep is on. Extra input columns (e.g. the Lyft ring index) are
        dropped; missing ones are an error.

        With host_crop (default), out-of-range points are dropped first —
        bit-for-boxes safe (see __init__). M is config.max_points, or with
        wire_buckets the smallest bucket that fits. Clouds beyond the budget
        keep their FIRST max_points (in-range) rows; the drop is counted in
        self.truncation and warned (once per call site) — never silent."""
        cfg = self.config
        f_expect = cfg.num_input_features
        points = np.asarray(points, dtype=np.float32)
        points = points.reshape(-1, points.shape[-1] if points.size else f_expect)
        if points.shape[1] < f_expect:
            raise ValueError(
                f"points have {points.shape[1]} feature columns; config "
                f"needs {f_expect} (x, y, z, intensity"
                f"{', dt' if cfg.num_sweeps > 1 else ''})")
        if self.host_crop and len(points):
            # keep a strict SUPERSET of the device validity predicate: the
            # grid-derived upper bound plus one voxel of float margin (the
            # device's floor-binning is authoritative; anything in the
            # margin sliver is dropped on device exactly as before)
            x, y, z = points[:, 0], points[:, 1], points[:, 2]
            xh = cfg.x_min + (cfg.grid_w + 1) * cfg.voxel_x
            yh = cfg.y_min + (cfg.grid_h + 1) * cfg.voxel_y
            keep = ((x >= cfg.x_min) & (x < xh)
                    & (y >= cfg.y_min) & (y < yh)
                    & (z >= cfg.z_min) & (z <= cfg.z_max))
            points = points[keep]
        n = min(len(points), cfg.max_points)
        m = cfg.max_points
        if self.wire_buckets is not None:
            m = next(b for b in self.wire_buckets if b >= n)
        if self._wire_scales is not None:
            # int16 fixed-point wire: per-channel quantize; 32767 is the
            # pad sentinel (dequantizes out of the detection range)
            out = np.full((m, f_expect), 32767, dtype=np.int16)
            q = np.round(points[:n, :f_expect] / self._wire_scales)
            out[:n] = np.clip(q, -32767, 32767).astype(np.int16)
        else:
            # pad with a finite out-of-range sentinel (f16 max is ~65504)
            pad = 1e6 if self._wire_np.itemsize >= 4 else 3e4
            out = np.full((m, f_expect), pad, dtype=self._wire_np)
            out[:n] = points[:n, :f_expect]
        self.truncation.record(len(points), n, label="pad_points")
        return out, np.int32(n)

    def predict_raw(self, points: np.ndarray) -> Detections:
        padded, n = self.pad_points(points)
        return self._forward(self.variables, jnp.asarray(padded), n)

    def predict_raw_batch(self, points_batch, num_points) -> Detections:
        """points_batch (B, M, F) already padded; num_points (B,)."""
        return self._forward_batch(self.variables, points_batch, num_points)

    def predict_packed(self, points: np.ndarray):
        """One sweep -> device (D, 10) packed detections (single transfer)."""
        padded, n = self.pad_points(points)
        return self._post_packed(
            *self._model(self.variables, jnp.asarray(padded), n))

    def predict_packed_batch(self, points_batch, num_points):
        return self._post_packed_batch(
            *self._model_batch(self.variables, points_batch, num_points))

    # --- public API: points -> List[Box3D] ---

    def predict(self, points: np.ndarray, token: str = "",
                lidar_to_global: Optional[Pose] = None) -> List[Box3D]:
        packed = np.asarray(self.predict_packed(points))
        return packed_to_boxes(packed, self.config, token=token,
                               lidar_to_global=lidar_to_global)

    def predict_stream(self, clouds, depth: int = 3, threaded: bool = True):
        """Pipelined serving: yields List[Box3D] per input cloud, keeping up
        to `depth` sweeps in flight.

        threaded (default): a producer thread runs pad + upload + dispatch
        while the consumer thread pulls results, so the blocking host->device
        copy of frame k+1 overlaps the result download of frame k. On this
        environment's tunnel that turns the serial pad+upload+pull sum
        (~108 ms/sweep) into max(upload, pull) — measured 59 ms/sweep
        (bench.py prints both). threaded=False keeps the single-thread
        deque pipeline (upload still overlaps device compute via async
        dispatch, but not the result pulls)."""
        from collections import deque

        if threaded:
            from tpu_pillars.train.prefetch import prefetch

            for out in prefetch(map(self.predict_packed, clouds),
                                size=depth):
                yield packed_to_boxes(np.asarray(out), self.config)
            return
        pending: "deque" = deque()
        for points in clouds:
            pending.append(self.predict_packed(points))
            if len(pending) > depth:
                yield packed_to_boxes(np.asarray(pending.popleft()),
                                      self.config)
        while pending:
            yield packed_to_boxes(np.asarray(pending.popleft()), self.config)

    @classmethod
    def from_checkpoint(cls, config: PillarsConfig, path: str, **kw
                        ) -> "Detector":
        """Load inference variables from a train.checkpoint msgpack file.

        Uses jax.eval_shape to build the variable structure — no model
        compute or compilation happens before the first predict(). If the
        checkpoint recorded a config fingerprint, a mismatch against
        `config` fails fast with a clear error (same check as
        train.checkpoint.restore_checkpoint) instead of an opaque shape
        error deep inside flax deserialization."""
        from flax import serialization

        from tpu_pillars.models.pointpillars import PointPillars
        from tpu_pillars.ops.voxelize import PillarBatch
        from tpu_pillars.train.checkpoint import config_fingerprint

        model = PointPillars(config)
        dummy = PillarBatch(
            jnp.zeros((config.max_pillars, config.max_points_per_pillar,
                       config.num_decorated_features)),
            jnp.zeros((config.max_pillars, config.max_points_per_pillar), bool),
            jnp.zeros((config.max_pillars, 2), jnp.int32),
            jnp.zeros((config.max_pillars,), bool),
        )
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), dummy))
        template = jax.tree.map(
            lambda s: np.zeros(s.shape, s.dtype), shapes)
        with open(path, "rb") as f:
            data = f.read()
        # checkpoint payload: {step, params, batch_stats, opt_state}; only
        # the variables matter for inference — restore the raw msgpack tree
        # and bind just those subtrees against the eval_shape template
        raw = serialization.msgpack_restore(data)
        if "config_fp" in raw:
            want = config_fingerprint(config)
            got = np.asarray(raw["config_fp"], np.uint8)
            if not np.array_equal(want, got):
                raise ValueError(
                    f"checkpoint {path} was written for a different "
                    f"PillarsConfig (fingerprint {got.tobytes().hex()} != "
                    f"{want.tobytes().hex()}); refusing to restore")
        variables = {
            "params": serialization.from_state_dict(template["params"],
                                                    raw["params"]),
            "batch_stats": serialization.from_state_dict(
                template["batch_stats"], raw["batch_stats"]),
        }
        return cls(config, variables, **kw)

    @classmethod
    def from_torch(cls, config: PillarsConfig, state_dict_or_path, **kw
                   ) -> "Detector":
        """MIGRATION: build a Detector from a torch PointPillars state_dict
        in the reference layout (or a path to a torch.save file of one) —
        reference-trained weights serve here unchanged. Conversion is the
        bit-exact inverse mapping in reference_cpu.convert.torch_to_flax."""
        from tpu_pillars.reference_cpu.convert import torch_to_flax

        sd = state_dict_or_path
        if isinstance(sd, (str, bytes)):
            import torch

            sd = torch.load(sd, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):   # a whole nn.Module
            sd = sd.state_dict()
        return cls(config, torch_to_flax(sd, config), **kw)


def pack_detections(det: Detections):
    """Detections -> (D, 10) f32 [x,y,z,w,l,h,yaw,score,class,valid]."""
    return jnp.concatenate(
        [
            det.boxes,
            det.scores[:, None],
            det.class_ids.astype(jnp.float32)[:, None],
            det.valid.astype(jnp.float32)[:, None],
        ],
        axis=-1,
    )


def packed_to_boxes(packed: np.ndarray, config: PillarsConfig, token: str = "",
                    lidar_to_global: Optional[Pose] = None) -> List[Box3D]:
    names = config.class_names
    out: List[Box3D] = []
    for row in packed:
        if row[9] == 0.0:
            continue
        box = Box3D.from_array(row[:7], label=names[int(row[8])],
                               score=float(row[7]), token=token)
        if lidar_to_global is not None:
            box = box.transformed(lidar_to_global.rotation,
                                  lidar_to_global.translation)
        out.append(box)
    return out


def detections_to_boxes(det: Detections, config: PillarsConfig, token: str = "",
                        lidar_to_global: Optional[Pose] = None) -> List[Box3D]:
    names = config.class_names
    out: List[Box3D] = []
    for b, s, c, v in zip(det.boxes, det.scores, det.class_ids, det.valid):
        if not v:
            continue
        box = Box3D.from_array(np.asarray(b), label=names[int(c)],
                               score=float(s), token=token)
        if lidar_to_global is not None:
            box = box.transformed(lidar_to_global.rotation,
                                  lidar_to_global.translation)
        out.append(box)
    return out
