#!/usr/bin/env python
"""FLOPs/params counter (parity with ``tools/analysis_tools/get_flops.py``
+ the detector's ``forward_dummy`` hook): uses jax's cost analysis on the
compiled forward for exact XLA FLOPs."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

if os.environ.get("SM3DET_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?",
                   default="configs/sm3det_convnext_t.py")
    p.add_argument("--shape", type=int, nargs=2, default=[800, 800])
    args = p.parse_args()

    import jax
    import numpy as np
    from sm3det_tpu.utils.config import Config
    from sm3det_tpu.models.detectors.trisource import TriSourceDetector
    from sm3det_tpu.train.train_state import init_trisource

    cfg = Config.fromfile(args.config)
    model_cfg = cfg.model.to_dict()
    model_cfg.pop("type", None)
    model_cfg["backbone"].pop("pretrained", None)
    model_cfg["backbone"]["moe_block_inds"] = tuple(
        tuple(x) for x in model_cfg["backbone"]["moe_block_inds"])
    model = TriSourceDetector(cfg=model_cfg)

    h, w = args.shape
    rng = np.random.RandomState(0)
    g = 8
    batch = {
        "sar": {"img": rng.rand(1, h, w, 3).astype(np.float32),
                "gt_bboxes": np.zeros((1, g, 4), np.float32),
                "gt_labels": np.zeros((1, g), np.int32),
                "gt_mask": np.ones((1, g), bool)},
        "rgb": {"img": rng.rand(1, h, w, 3).astype(np.float32),
                "gt_obbs": np.zeros((1, g, 5), np.float32),
                "gt_labels": np.zeros((1, g), np.int32),
                "gt_mask": np.ones((1, g), bool)},
        "ifr": {"img": rng.rand(1, h, w, 3).astype(np.float32),
                "gt_obbs": np.zeros((1, g, 5), np.float32),
                "gt_labels": np.zeros((1, g), np.int32),
                "gt_mask": np.ones((1, g), bool)},
    }
    params = init_trisource(jax.random.PRNGKey(0), model, batch,
                            source_ratio=(1, 1, 1))
    n_params = sum(x.size for x in jax.tree.leaves(params))

    # forward_dummy contract: rgb rpn+roi fwd, ifr rpn+roi fwd, sar head
    def forward(v, img):
        out = []
        for m in ("simple_test_rgb", "simple_test_ifr",
                  "simple_test_sar"):
            out.append(model.apply(v, img, (h, w), method=m))
        return out

    lowered = jax.jit(forward).lower({"params": params},
                                     batch["rgb"]["img"])
    try:
        cost = lowered.compile().cost_analysis()
        flops = cost.get("flops", float("nan"))
    except Exception:
        flops = float("nan")
    print(f"Params: {n_params / 1e6:.2f} M")
    print(f"FLOPs (XLA, all 3 branches @ {h}x{w}): {flops / 1e9:.1f} G")


if __name__ == "__main__":
    main()
