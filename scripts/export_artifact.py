#!/usr/bin/env python
"""Export the round's trained inference artifact into the repo
(VERDICT r4 next-round #3: every prior trained checkpoint lived in /tmp and
died with the session, leaving the fidelity gates keyed to random-init
actuals and the TTA evidence unreproducible).

Host-side only (no device touch): picks the better of raw vs EMA weights by
the training log's FINAL held-out synthetic mAP, strips optimizer state via
train.checkpoint.export_inference_checkpoint (raw) or copies the loop's
.ema export (already stripped), and records provenance next to the file.

Usage: python scripts/export_artifact.py --run /tmp/r5train \
           [--out artifacts/pointpillars_synth4k.msgpack]
"""
import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run", default="/tmp/r5train")
    p.add_argument("--out", default=os.path.join(
        REPO, "artifacts", "pointpillars_synth4k.msgpack"))
    args = p.parse_args()

    log_path = os.path.join(args.run, "train.log")
    evals = []
    start = None
    with open(log_path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            rec = json.loads(line)
            if rec.get("event") == "eval":
                evals.append(rec)
            elif rec.get("event") == "start":
                start = rec
    if not evals:
        sys.exit(f"no eval events in {log_path}")
    final = evals[-1]
    m_raw, m_ema = final.get("mAP", 0.0), final.get("mAP_ema", -1.0)
    use_ema = m_ema >= m_raw
    print(f"final eval (step {final['step']}): mAP raw {m_raw:.4f} / "
          f"ema {m_ema:.4f} -> exporting {'EMA' if use_ema else 'RAW'}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    if use_ema:
        shutil.copyfile(os.path.join(args.run, "ckpt.msgpack.ema"), args.out)
    else:
        from tpu_pillars.config import PillarsConfig
        from tpu_pillars.train.checkpoint import export_inference_checkpoint

        export_inference_checkpoint(
            args.out, os.path.join(args.run, "ckpt.msgpack"),
            config=PillarsConfig())
    size = os.path.getsize(args.out)

    prov = os.path.join(os.path.dirname(args.out), "PROVENANCE.md")
    with open(prov, "w") as f:
        f.write(f"""# artifacts/{os.path.basename(args.out)}

Trained inference checkpoint (params + batch_stats + config fingerprint,
no optimizer state) for the full-size `PillarsConfig()` operating point.

- produced by: `python -m tpu_pillars.train.loop --full-size --steps
  {start['steps'] if start else '?'} --batch {start['batch'] if start else '?'}
  --ema 0.999 --eval-every 1000 --eval-scenes 16 --seed 0` on the v5e chip
  (seed-deterministic synthetic training stream; the 1500-step twin of this
  run reproduced its mAP curve bit-for-bit in round 3)
- weights: {'EMA (decay 0.999, warmup-corrected)' if use_ema else 'raw'}
  — picked by final held-out synthetic mAP: raw {m_raw:.4f} vs EMA {m_ema:.4f}
- final eval: step {final['step']}, held-out synthetic scenes
- size: {size / 1e6:.1f} MB
- loads via `Detector.from_checkpoint(PillarsConfig(), path)` and
  `evaluation/cli.py --ckpt`; bench.py picks it up automatically (same
  weights on the CPU-reference and TPU paths)
- consumed by: tests/test_fused_fidelity.py::test_fused_box_drift_trained_artifact
  (serving-fidelity gates keyed to this artifact's on-chip actuals),
  bench.py "map_synth_heldout" contract field, scripts/probe_tta_gain.py
- SYNTHETIC-DATA caveat: trained and evaluated on the in-repo synthetic
  scene generator; real-Lyft weights are environment-blocked (no dataset).
""")
    print(f"wrote {args.out} ({size / 1e6:.1f} MB) + {prov}")


if __name__ == "__main__":
    main()
