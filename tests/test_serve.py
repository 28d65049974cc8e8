"""HTTP inference server (scripts/serve.py): subprocess startup, healthz,
binary and JSON predict round-trips, client-error surface."""

import json
import os
import subprocess
import sys
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from tpu_pillars.config import tiny_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = tiny_config()


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from tpu_pillars.train import TrainConfig, create_train_state
    from tpu_pillars.train.checkpoint import save_checkpoint

    out = tmp_path_factory.mktemp("serve")
    ckpt = str(out / "ck.msgpack")
    state = create_train_state(CFG, TrainConfig(batch_size=1, max_gt_boxes=4,
                                                total_steps=10))
    save_checkpoint(ckpt, state, config=CFG)

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "serve.py"),
         "--ckpt", ckpt, "--port", "0", "--platform", "cpu"],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)
    # the server prints its bound address once the model is compiled+warm
    line = proc.stdout.readline()
    assert "serving on http://" in line, (line, proc.stderr.read()[-2000:])
    url = line.split()[2]
    yield url
    proc.terminate()
    proc.wait(timeout=30)


def _post(url, data, headers):
    req = urllib.request.Request(url + "/predict", data=data,
                                 headers=headers, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=60) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok"


def test_predict_binary_and_json(server, rng):
    n = 500
    pts = np.zeros((n, CFG.num_input_features), np.float32)
    pts[:, 0] = rng.uniform(CFG.x_min, CFG.x_max, n)
    pts[:, 1] = rng.uniform(CFG.y_min, CFG.y_max, n)
    pts[:, 2] = rng.uniform(CFG.z_min, CFG.z_max, n)
    pts[:, 3] = rng.uniform(0, 1, n)

    out_bin = _post(server, pts.tobytes(),
                    {"Content-Type": "application/octet-stream",
                     "X-Point-Count": str(n)})
    assert out_bin["num_boxes"] == len(out_bin["boxes"])
    for b in out_bin["boxes"][:5]:
        assert len(b["center"]) == 3 and len(b["wlh"]) == 3
        assert np.isfinite(b["score"])

    out_json = _post(server, json.dumps(
        {"points": pts.tolist()}).encode(),
        {"Content-Type": "application/json"})
    # identical sweep over either wire -> identical detections
    assert out_json["num_boxes"] == out_bin["num_boxes"]
    for a, b in zip(out_json["boxes"], out_bin["boxes"]):
        np.testing.assert_allclose(a["center"], b["center"], atol=1e-6)


def test_predict_bad_width_is_400(server):
    bad = np.zeros((10, CFG.num_input_features + 2), np.float32)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server, json.dumps({"points": bad.tolist()}).encode(),
              {"Content-Type": "application/json"})
    assert ei.value.code == 400


@pytest.fixture(scope="module")
def server_batched(tmp_path_factory):
    """serve.py with dynamic batching (--batch-size 3, generous straggler
    window so the 1-core CI host still coalesces)."""
    from tpu_pillars.train import TrainConfig, create_train_state
    from tpu_pillars.train.checkpoint import save_checkpoint

    out = tmp_path_factory.mktemp("serve_b")
    ckpt = str(out / "ck.msgpack")
    state = create_train_state(CFG, TrainConfig(batch_size=1, max_gt_boxes=4,
                                                total_steps=10))
    save_checkpoint(ckpt, state, config=CFG)

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "serve.py"),
         "--ckpt", ckpt, "--port", "0", "--platform", "cpu",
         "--batch-size", "3", "--max-wait-ms", "2000"],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)
    line = proc.stdout.readline()
    assert "serving on http://" in line, (line, proc.stderr.read()[-2000:])
    url = line.split()[2]
    yield url
    proc.terminate()
    proc.wait(timeout=30)


@pytest.fixture(scope="module")
def server_multisweep(tmp_path_factory):
    """serve.py with a 3-sweep streaming config (/sweep endpoint)."""
    import dataclasses

    from tpu_pillars.train import TrainConfig, create_train_state
    from tpu_pillars.train.checkpoint import save_checkpoint

    cfg = dataclasses.replace(CFG, num_sweeps=3)
    out = tmp_path_factory.mktemp("serve_ms")
    ckpt = str(out / "ck.msgpack")
    state = create_train_state(cfg, TrainConfig(batch_size=1, max_gt_boxes=4,
                                                total_steps=10))
    save_checkpoint(ckpt, state, config=cfg)

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "serve.py"),
         "--ckpt", ckpt, "--port", "0", "--platform", "cpu",
         "--num-sweeps", "3"],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)
    line = proc.stdout.readline()
    assert "serving on http://" in line, (line, proc.stderr.read()[-2000:])
    yield line.split()[2], ckpt, cfg
    proc.terminate()
    proc.wait(timeout=30)


def test_sweep_streaming_endpoint(server_multisweep, rng):
    """/sweep accumulates per stream and matches a local detector fed the
    locally-accumulated cloud (identity poses)."""
    url, ckpt, cfg = server_multisweep
    from tpu_pillars.data.stream import SweepAccumulator
    from tpu_pillars.detector import Detector
    from tpu_pillars.geometry.transforms import Pose

    det = Detector.from_checkpoint(cfg, ckpt)
    acc = SweepAccumulator(3)
    F = cfg.num_raw_features
    last_resp = cloud = None
    for k in range(3):
        n = 300
        pts = np.zeros((n, F), np.float32)
        pts[:, 0] = rng.uniform(cfg.x_min, cfg.x_max, n)
        pts[:, 1] = rng.uniform(cfg.y_min, cfg.y_max, n)
        pts[:, 2] = rng.uniform(cfg.z_min, cfg.z_max, n)
        pts[:, 3] = rng.uniform(0, 1, n)
        t_us = k * 1e5
        req = urllib.request.Request(
            url + "/sweep", data=pts.tobytes(),
            headers={"Content-Type": "application/octet-stream",
                     "X-Point-Count": str(n),
                     "X-Timestamp-Us": str(t_us)}, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            last_resp = json.loads(r.read())
        assert last_resp["sweeps_buffered"] == k + 1
        cloud = acc.push(pts, Pose.identity(), t_us)

    want = det.predict(cloud)
    assert last_resp["num_boxes"] == len(want)
    for a, b in zip(last_resp["boxes"], want):
        np.testing.assert_allclose(a["center"], b.center, atol=1e-5)
        assert a["label"] == b.label


def test_sweep_on_single_sweep_config_is_400(server):
    req = urllib.request.Request(
        server + "/sweep", data=b"", method="POST",
        headers={"Content-Type": "application/octet-stream"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 400


def test_dynamic_batching_coalesces_and_matches(server_batched, rng):
    import threading

    n = 400
    pts = np.zeros((n, CFG.num_input_features), np.float32)
    pts[:, 0] = rng.uniform(CFG.x_min, CFG.x_max, n)
    pts[:, 1] = rng.uniform(CFG.y_min, CFG.y_max, n)
    pts[:, 2] = rng.uniform(CFG.z_min, CFG.z_max, n)
    pts[:, 3] = rng.uniform(0, 1, n)
    body = json.dumps({"points": pts.tolist()}).encode()
    hdr = {"Content-Type": "application/json"}

    # a lone request takes the single-sweep executable
    solo = _post(server_batched, body, hdr)
    assert solo["batched"] == 1

    results = [None] * 3

    def fire(i):
        results[i] = _post(server_batched, body, hdr)

    threads = [threading.Thread(target=fire, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert all(r is not None for r in results)
    # the concurrent burst coalesced into one device call...
    assert max(r["batched"] for r in results) >= 2
    # ...and every response carries the same boxes as the solo run. The
    # batch executable reassociates float sums, so a score sitting within
    # ulps of a threshold could legitimately flip one detection in or out
    # across XLA versions — allow a count slack of 1 and compare the
    # shared prefix with tolerance instead of demanding bit equality.
    for r in results:
        assert abs(r["num_boxes"] - solo["num_boxes"]) <= 1
        m = min(r["num_boxes"], solo["num_boxes"])
        for a, b in zip(r["boxes"][:m], solo["boxes"][:m]):
            np.testing.assert_allclose(a["center"], b["center"],
                                       rtol=1e-4, atol=1e-4)
            assert a["label"] == b["label"]


@pytest.fixture(scope="module")
def server_bucketed(tmp_path_factory):
    """serve.py with bucketed upload shapes AND dynamic batching: solo
    requests ride the smallest fitting bucket, bursts re-pad to the full
    buffer for the one warmed batch executable."""
    from tpu_pillars.train import TrainConfig, create_train_state
    from tpu_pillars.train.checkpoint import save_checkpoint

    out = tmp_path_factory.mktemp("serve_buck")
    ckpt = str(out / "ck.msgpack")
    state = create_train_state(CFG, TrainConfig(batch_size=1, max_gt_boxes=4,
                                                total_steps=10))
    save_checkpoint(ckpt, state, config=CFG)

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "serve.py"),
         "--ckpt", ckpt, "--port", "0", "--platform", "cpu",
         "--batch-size", "3", "--max-wait-ms", "2000",
         "--buckets", f"512,1024,{CFG.max_points}"],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)
    line = proc.stdout.readline()
    assert "serving on http://" in line, (line, proc.stderr.read()[-2000:])
    yield line.split()[2]
    proc.terminate()
    proc.wait(timeout=30)


def test_bucketed_server_matches_plain(server, server_bucketed, rng):
    import threading

    # both fixtures save the same deterministic init checkpoint, so the
    # plain server is the oracle for the bucketed one
    n = 400                      # -> the 512 bucket
    pts = np.zeros((n, CFG.num_input_features), np.float32)
    pts[:, 0] = rng.uniform(CFG.x_min, CFG.x_max, n)
    pts[:, 1] = rng.uniform(CFG.y_min, CFG.y_max, n)
    pts[:, 2] = rng.uniform(CFG.z_min, CFG.z_max, n)
    pts[:, 3] = rng.uniform(0, 1, n)
    body = json.dumps({"points": pts.tolist()}).encode()
    hdr = {"Content-Type": "application/json"}

    want = _post(server, body, hdr)

    # solo request: single-sweep executable at the 512 bucket — identical
    # boxes (padding rows are the only difference)
    solo = _post(server_bucketed, body, hdr)
    assert solo["batched"] == 1
    assert solo["num_boxes"] == want["num_boxes"]
    for a, b in zip(solo["boxes"], want["boxes"]):
        np.testing.assert_allclose(a["center"], b["center"], atol=1e-6)
        assert a["label"] == b["label"]

    # concurrent burst: bucket-sized pads re-padded to the full buffer for
    # the batch executable — no lazy compile, same boxes (batch float
    # reassociation slack as in the batching test)
    results = [None] * 3

    def fire(i):
        results[i] = _post(server_bucketed, body, hdr)

    threads = [threading.Thread(target=fire, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r is not None for r in results)
    assert max(r["batched"] for r in results) >= 2
    for r in results:
        assert abs(r["num_boxes"] - want["num_boxes"]) <= 1
        m = min(r["num_boxes"], want["num_boxes"])
        for a, b in zip(r["boxes"][:m], want["boxes"][:m]):
            np.testing.assert_allclose(a["center"], b["center"],
                                       rtol=1e-4, atol=1e-4)
            assert a["label"] == b["label"]
