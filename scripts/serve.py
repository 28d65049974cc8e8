#!/usr/bin/env python
"""Minimal production-style inference server (stdlib-only; SURVEY.md 3.1:
`predict(sample) -> List[Box3D]` as a network surface).

    python scripts/serve.py --ckpt ckpt.msgpack [--full-size] [--port 8433]
                            [--batch-size B --max-wait-ms T]

Endpoints:
  GET  /healthz            -> {"status": "ok", "backend": ..., "sweeps": N}
  POST /predict            -> detections for ONE (pre-accumulated) cloud
       body: raw float32 little-endian (N, F) point buffer
             (F = config.num_input_features; header X-Point-Count: N),
             or JSON {"points": [[x, y, z, i], ...]}
       response: {"boxes": [{"center", "wlh", "yaw", "label", "score"}],
                  "num_boxes": K, "latency_ms": T, "batched": B}
  POST /sweep              -> STREAMING multi-sweep serving (requires a
       multi-sweep config, --num-sweeps K > 1): body is one RAW sweep
       (N, num_raw_features) in the same binary/JSON wire; headers
       X-Timestamp-Us (float), X-Pose-Rotation "w,x,y,z" and
       X-Pose-Translation "x,y,z" (lidar->global; identity if omitted),
       X-Stream-Id (default "default"). The server accumulates the last K
       sweeps per stream into the newest sweep's frame (data/stream.py,
       bit-exact vs the offline load_sweeps) and predicts on the
       accumulated cloud. Response adds "sweeps_buffered".

Two serving modes:

  * --batch-size 1 (default): single-threaded, requests served in arrival
    order — one TPU program stream, minimum latency, no coalescing.
  * --batch-size B > 1: DYNAMIC BATCHING. A threading HTTP front end
    enqueues requests; one dispatcher thread coalesces up to B concurrent
    sweeps (waiting at most --max-wait-ms for stragglers once the first
    arrives) into ONE `predict_packed_batch` call on a static batch-B
    executable, padding empty slots with sentinel clouds. The batch-B path
    amortizes per-dispatch overhead ~3x per sweep on the measured v5e
    serving numbers (batch-8 vs single, README perf table), at up to
    max-wait + one batch of extra latency. A lone request still runs the
    single-sweep executable — both are compiled before the bind.

The model executables are compiled at startup with warmup sweeps so the
first request pays no compile. For bulk offline throughput, skip HTTP and
use the library's `predict_stream` / `predict_packed_batch` directly.
"""

from __future__ import annotations

import argparse
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, HTTPServer, ThreadingHTTPServer


class DynamicBatcher:
    """Coalesce concurrent predict requests into static-batch device calls.

    submit() blocks the calling handler thread until its sweep's boxes are
    ready; one dispatcher thread owns the device (the chip is single-client
    — batching happens HERE, not by racing executables)."""

    class Overloaded(RuntimeError):
        """Queue full — surfaced as HTTP 503."""

    def __init__(self, det, config, batch_size: int, max_wait_ms: float,
                 max_queue: int | None = None, result_timeout_s: float = 300.0):
        self.det = det
        self.config = config
        self.batch = int(batch_size)
        self.wait = max_wait_ms / 1e3
        self.result_timeout = result_timeout_s
        # bounded: a wedged device call must turn into fast 503s, not an
        # unbounded pile of parked handler threads + request payloads
        self.q: "queue.Queue" = queue.Queue(max_queue or 8 * self.batch)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, pts):
        ev = threading.Event()
        slot: dict = {}
        try:
            self.q.put_nowait((pts, ev, slot))
        except queue.Full:
            raise self.Overloaded(
                f"request queue full ({self.q.maxsize}); server overloaded "
                f"or device wedged")
        if not ev.wait(timeout=self.result_timeout):
            slot["abandoned"] = True   # dispatcher will drop the result
            raise RuntimeError(
                f"no result within {self.result_timeout:.0f}s "
                f"(device call wedged?)")
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["boxes"], slot["batched"]

    def _collect(self):
        items = [self.q.get()]
        deadline = time.perf_counter() + self.wait
        while len(items) < self.batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                items.append(self.q.get(timeout=remaining))
            except queue.Empty:
                break
        return items

    def _run(self):
        import numpy as np

        from tpu_pillars.detector import packed_to_boxes

        while True:
            items = self._collect()
            try:
                if len(items) == 1:
                    results = [self.det.predict(items[0][0])]
                else:
                    padded = [self.det.pad_points(p) for p, _, _ in items]
                    # the batch executable is compiled ONCE at the full
                    # static shape; with --buckets, per-item pads may be
                    # bucket-sized — re-pad to max_points (f32 sentinel,
                    # the only wire this server speaks) so a sparse item
                    # never triggers a lazy device compile mid-serve
                    M = self.config.max_points

                    def full(p):
                        if p.shape[0] == M:
                            return p
                        out = np.full((M, p.shape[1]), 1e6, p.dtype)
                        out[: p.shape[0]] = p
                        return out

                    pts_b = np.stack([full(p) for p, _ in padded])
                    n_b = np.asarray([n for _, n in padded], np.int32)
                    b = len(items)
                    if b < self.batch:      # static batch shape: pad slots
                        empty = np.full(
                            (self.batch - b, *pts_b.shape[1:]), 1e6,
                            pts_b.dtype)
                        pts_b = np.concatenate([pts_b, empty])
                        n_b = np.concatenate(
                            [n_b, np.zeros(self.batch - b, np.int32)])
                    packed = np.asarray(self.det.predict_packed_batch(
                        pts_b, n_b))
                    results = [packed_to_boxes(packed[i], self.config)
                               for i in range(b)]
                for (_, ev, slot), boxes in zip(items, results):
                    if slot.get("abandoned"):
                        continue       # handler already timed out and left
                    slot["boxes"] = boxes
                    slot["batched"] = len(items)
                    ev.set()
            except Exception as e:  # noqa: BLE001 — surface to every waiter
                for _, ev, slot in items:
                    slot["error"] = str(e)
                    ev.set()


def make_handler(det, config, batcher=None):
    import numpy as np

    F = config.num_input_features
    stats = {"sweeps": 0}
    lock = threading.Lock()
    accumulators: dict = {}      # stream id -> SweepAccumulator
    acc_lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        server_version = "tpu-pillars/1.1"

        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet the per-request stderr line
            pass

        def do_GET(self):
            if self.path != "/healthz":
                return self._send(404, {"error": "unknown path"})
            import jax

            self._send(200, {"status": "ok",
                             "backend": jax.default_backend(),
                             "sweeps": stats["sweeps"]})

        def _read_points(self, width):
            length = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(length)
            ctype = self.headers.get("Content-Type", "")
            if ctype.startswith("application/json"):
                pts = np.asarray(json.loads(raw)["points"], np.float32)
            else:
                pts = np.frombuffer(raw, "<f4").reshape(-1, width).copy()
                want = self.headers.get("X-Point-Count")
                if want is not None and int(want) != len(pts):
                    raise ValueError(
                        f"X-Point-Count {want} != decoded {len(pts)}")
            if pts.ndim != 2 or pts.shape[1] != width:
                raise ValueError(f"points must be (N, {width}); "
                                 f"got {pts.shape}")
            return pts

        def do_POST(self):
            if self.path == "/sweep":
                return self._do_sweep()
            if self.path != "/predict":
                return self._send(404, {"error": "unknown path"})
            try:
                pts = self._read_points(F)
            except Exception as e:  # noqa: BLE001 — client error surface
                return self._send(400, {"error": str(e)})

            t0 = time.perf_counter()
            try:
                if batcher is not None:
                    boxes, batched = batcher.submit(pts)
                else:
                    boxes, batched = det.predict(pts), 1
            except DynamicBatcher.Overloaded as e:
                return self._send(503, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — server error surface
                return self._send(500, {"error": str(e)})
            with lock:
                stats["sweeps"] += 1
            self._send(200, self._boxes_payload(boxes, t0, batched))

        def _boxes_payload(self, boxes, t0, batched, **extra):
            return {
                "boxes": [{
                    "center": [float(v) for v in b.center],
                    "wlh": [float(v) for v in b.wlh],
                    "yaw": float(b.yaw),
                    "label": b.label,
                    "score": float(b.score),
                } for b in boxes],
                "num_boxes": len(boxes),
                "latency_ms": round((time.perf_counter() - t0) * 1e3, 2),
                "batched": batched,
                **extra,
            }

        def _do_sweep(self):
            from tpu_pillars.data.stream import SweepAccumulator
            from tpu_pillars.geometry.transforms import Pose

            if config.num_sweeps <= 1:
                return self._send(400, {
                    "error": "/sweep needs a multi-sweep config "
                             "(serve with --num-sweeps K > 1)"})
            try:
                pts = self._read_points(config.num_raw_features)
                t_us = float(self.headers.get("X-Timestamp-Us", 0.0))
                rot = self.headers.get("X-Pose-Rotation")
                tra = self.headers.get("X-Pose-Translation")
                pose = Pose.identity()
                if rot or tra:
                    pose = Pose(
                        np.asarray([float(v) for v in
                                    (rot or "1,0,0,0").split(",")]),
                        np.asarray([float(v) for v in
                                    (tra or "0,0,0").split(",")]))
                stream = self.headers.get("X-Stream-Id", "default")
            except Exception as e:  # noqa: BLE001 — client error surface
                return self._send(400, {"error": str(e)})

            with acc_lock:
                acc = accumulators.setdefault(
                    stream, SweepAccumulator(config.num_sweeps))
                cloud = acc.push(pts, pose, t_us)
                buffered = len(acc)

            t0 = time.perf_counter()
            try:
                if batcher is not None:
                    boxes, batched = batcher.submit(cloud)
                else:
                    boxes, batched = det.predict(cloud), 1
            except DynamicBatcher.Overloaded as e:
                return self._send(503, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — server error surface
                return self._send(500, {"error": str(e)})
            with lock:
                stats["sweeps"] += 1
            self._send(200, self._boxes_payload(
                boxes, t0, batched, sweeps_buffered=buffered))

    return Handler


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--port", type=int, default=8433)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--full-size", action="store_true")
    p.add_argument("--num-sweeps", type=int, default=0,
                   help="override config.num_sweeps (K > 1 enables the "
                        "/sweep streaming endpoint; the checkpoint must "
                        "match the resulting config)")
    p.add_argument("--platform", choices=("auto", "cpu"), default="auto")
    p.add_argument("--batch-size", type=int, default=1,
                   help="dynamic-batching window: >1 coalesces concurrent "
                        "requests into one static batch-B device call")
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="max straggler wait once the first request of a "
                        "batch arrived")
    p.add_argument("--buckets", type=str, default=None,
                   help="bucketed upload shapes for the single-sweep path "
                        "(smaller h2d copies for sparse clouds; boxes "
                        "bit-equal by test): 'grid' = a 16384-spaced grid "
                        "up to max_points, or a comma list ending at "
                        "max_points. EVERY bucket's single-sweep "
                        "executable is compiled+warmed before bind "
                        "(startup cost scales with the list — ~1 min per "
                        "bucket at full size on TPU). Batched calls "
                        "always re-pad to the full buffer.")
    args = p.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from tpu_pillars.config import PillarsConfig, tiny_config
    from tpu_pillars.detector import Detector

    config = PillarsConfig() if args.full_size else tiny_config()
    if args.num_sweeps > 1:
        import dataclasses

        config = dataclasses.replace(config, num_sweeps=args.num_sweeps)
    wire_buckets = None
    if args.buckets:
        if args.buckets == "grid":
            step = 16384
            wire_buckets = tuple(range(step, config.max_points, step)) \
                + (config.max_points,)
        else:
            wire_buckets = tuple(int(x) for x in args.buckets.split(","))
    det = Detector.from_checkpoint(config, args.ckpt,
                                   wire_buckets=wire_buckets)

    # compile + warm before accepting traffic (full-size: ~1 min on TPU;
    # with --buckets, once per bucket — no lazy compile after bind)
    F = config.num_input_features
    warm = np.zeros((32, F), np.float32)
    det.predict(warm)
    if wire_buckets is not None:
        prev = 0
        for b in det.wire_buckets:
            # prev+1 in-range points (the origin is in range) land in
            # bucket b exactly
            det.predict(np.zeros((prev + 1, F), np.float32))
            prev = b
    batcher = None
    if args.batch_size > 1:
        wp, wn = det.pad_points(warm)
        np.asarray(det.predict_packed_batch(
            np.repeat(wp[None], args.batch_size, 0),
            np.full((args.batch_size,), int(wn), np.int32)))
        batcher = DynamicBatcher(det, config, args.batch_size,
                                 args.max_wait_ms)

    server_cls = ThreadingHTTPServer if batcher is not None else HTTPServer
    server = server_cls((args.host, args.port),
                        make_handler(det, config, batcher))
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          f"(backend: {jax.default_backend()}, "
          f"batch={args.batch_size})", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
