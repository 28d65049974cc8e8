#!/usr/bin/env python
"""Measure the mAP delta between the two unpinnable protocol rules
(docs/MAP_PROTOCOL.md rows 6-7) on randomized crowded scenes.

Pure NumPy (no jax import) — safe to run next to a TPU process.

Row 6: match_rule mask_argmax (this repo's default) vs argmax_check
(VOC/rafaelpadilla lineage, probably the SDK). Divergence requires >=2
same-class GTs overlapping one prediction above threshold, so the generator
clusters GTs tightly.

Row 7: tie_order stable vs reversed (maximal tie deviation) vs numpy
(the SDK's literal introsort) with score quantization forcing exact ties.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from tpu_pillars.evaluation.map_eval import lyft_map  # noqa: E402
from tests.test_map_eval_alt import (  # noqa: E402
    CLASSES, _crowded_scenario,
)


def main() -> None:
    print("row 6: match_rule delta (crowded scenes, full threshold sweep)")
    deltas = []
    for seed in range(30, 36):
        rng = np.random.default_rng(seed)
        gts, preds = _crowded_scenario(rng)
        m_mask, _ = lyft_map(gts, preds, CLASSES)
        m_chk, _ = lyft_map(gts, preds, CLASSES, match_rule="argmax_check")
        deltas.append(m_mask - m_chk)
        print(f"  seed {seed}: gts={len(gts)} preds={len(preds)} "
              f"mask_argmax={m_mask:.4f} argmax_check={m_chk:.4f} "
              f"delta={m_mask - m_chk:+.4f}")
    print(f"  => max {max(deltas):.4f}, mean {np.mean(deltas):.4f} "
          f"(one-sided: mask_argmax >= argmax_check always)")

    print("row 7: tie_order delta (crowded scenes w/ quantized scores)")
    tdeltas = []
    for seed in range(40, 46):
        rng = np.random.default_rng(seed)
        gts, preds = _crowded_scenario(rng)
        m_st, _ = lyft_map(gts, preds, CLASSES, tie_order="stable")
        m_np, _ = lyft_map(gts, preds, CLASSES, tie_order="numpy")
        m_rev, _ = lyft_map(gts, preds, CLASSES, tie_order="reversed")
        tdeltas.append(max(abs(m_st - m_rev), abs(m_st - m_np)))
        print(f"  seed {seed}: stable={m_st:.4f} numpy={m_np:.4f} "
              f"reversed={m_rev:.4f} max|delta|={tdeltas[-1]:.4f}")
    print(f"  => max {max(tdeltas):.4f}, mean {np.mean(tdeltas):.4f}")


if __name__ == "__main__":
    main()
