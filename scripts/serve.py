#!/usr/bin/env python
"""Minimal production-style inference server (stdlib-only; SURVEY.md 3.1:
`predict(sample) -> List[Box3D]` as a network surface).

    python scripts/serve.py --ckpt ckpt.msgpack [--full-size] [--port 8433]

Endpoints:
  GET  /healthz            -> {"status": "ok", "backend": ..., "sweeps": N}
  POST /predict            -> detections for ONE sweep
       body: raw float32 little-endian (N, F) point buffer
             (F = config.num_input_features; header X-Point-Count: N),
             or JSON {"points": [[x, y, z, i], ...]}
       response: {"boxes": [{"center", "wlh", "yaw", "label", "score"}],
                  "num_boxes": K, "latency_ms": T}

Single-threaded on purpose: one TPU program stream, requests are served in
arrival order (the chip is the bottleneck, not the accept loop); the model
executable is compiled once at startup with a warmup sweep so the first
request pays no compile. For throughput-oriented clients, batch sweeps
client-side and use the library's `predict_stream` / `predict_packed_batch`
directly — HTTP-per-sweep is a latency surface, not a throughput one.
"""

from __future__ import annotations

import argparse
import json
import time
from http.server import BaseHTTPRequestHandler, HTTPServer


def make_handler(det, config):
    import numpy as np

    F = config.num_input_features
    stats = {"sweeps": 0}

    class Handler(BaseHTTPRequestHandler):
        server_version = "tpu-pillars/1.0"

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

        def do_POST(self):
            if self.path != "/predict":
                return self._send(404, {"error": "unknown path"})
            try:
                length = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(length)
                ctype = self.headers.get("Content-Type", "")
                if ctype.startswith("application/json"):
                    pts = np.asarray(json.loads(raw)["points"], np.float32)
                else:
                    pts = np.frombuffer(raw, "<f4").reshape(-1, F).copy()
                    want = self.headers.get("X-Point-Count")
                    if want is not None and int(want) != len(pts):
                        raise ValueError(
                            f"X-Point-Count {want} != decoded {len(pts)}")
                if pts.ndim != 2 or pts.shape[1] != F:
                    raise ValueError(f"points must be (N, {F}); "
                                     f"got {pts.shape}")
            except Exception as e:  # noqa: BLE001 — client error surface
                return self._send(400, {"error": str(e)})

            t0 = time.perf_counter()
            boxes = det.predict(pts)
            dt = (time.perf_counter() - t0) * 1e3
            stats["sweeps"] += 1
            self._send(200, {
                "boxes": [{
                    "center": [float(v) for v in b.center],
                    "wlh": [float(v) for v in b.wlh],
                    "yaw": float(b.yaw),
                    "label": b.label,
                    "score": float(b.score),
                } for b in boxes],
                "num_boxes": len(boxes),
                "latency_ms": round(dt, 2),
            })

    return Handler


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--port", type=int, default=8433)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--full-size", action="store_true")
    p.add_argument("--platform", choices=("auto", "cpu"), default="auto")
    args = p.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from tpu_pillars.config import PillarsConfig, tiny_config
    from tpu_pillars.detector import Detector

    config = PillarsConfig() if args.full_size else tiny_config()
    det = Detector.from_checkpoint(config, args.ckpt)

    # compile + warm before accepting traffic (full-size: ~1 min on TPU)
    warm = np.zeros((32, config.num_input_features), np.float32)
    det.predict(warm)

    server = HTTPServer((args.host, args.port), make_handler(det, config))
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          f"(backend: {jax.default_backend()})", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
