#!/usr/bin/env python
"""Inference FPS benchmark (parity with
``tools/analysis_tools/benchmark.py``): times the flagship model's
per-modality inference; supports --subdataset and iteration count.
lax.scan-batched like bench.py so tunnel dispatch doesn't dominate."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

if os.environ.get("SM3DET_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?",
                   default="configs/sm3det_convnext_t.py")
    p.add_argument("--subdataset", default="rgb",
                   choices=["sar", "rgb", "ifr"])
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--img-size", type=int, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from sm3det_tpu.utils.config import Config
    from sm3det_tpu.models.detectors.trisource import TriSourceDetector
    from sm3det_tpu.train.train_state import init_trisource

    cfg = Config.fromfile(args.config)
    img = args.img_size or cfg.img_size
    model_cfg = cfg.model.to_dict()
    model_cfg.pop("type", None)
    model_cfg["backbone"].pop("pretrained", None)
    model_cfg["backbone"]["moe_block_inds"] = tuple(
        tuple(x) for x in model_cfg["backbone"]["moe_block_inds"])
    model = TriSourceDetector(cfg=model_cfg)

    rng = np.random.RandomState(0)
    g = 8
    batch = {
        "sar": {"img": rng.rand(1, img, img, 3).astype(np.float32),
                "gt_bboxes": np.zeros((1, g, 4), np.float32),
                "gt_labels": np.zeros((1, g), np.int32),
                "gt_mask": np.ones((1, g), bool)},
        "rgb": {"img": rng.rand(1, img, img, 3).astype(np.float32),
                "gt_obbs": np.zeros((1, g, 5), np.float32),
                "gt_labels": np.zeros((1, g), np.int32),
                "gt_mask": np.ones((1, g), bool)},
        "ifr": {"img": rng.rand(1, img, img, 3).astype(np.float32),
                "gt_obbs": np.zeros((1, g, 5), np.float32),
                "gt_labels": np.zeros((1, g), np.int32),
                "gt_mask": np.ones((1, g), bool)},
    }
    params = init_trisource(jax.random.PRNGKey(0), model, batch,
                            source_ratio=(1, 1, 1))
    method = {"sar": "simple_test_sar", "rgb": "simple_test_rgb",
              "ifr": "simple_test_ifr"}[args.subdataset]
    imgs = jax.device_put(
        rng.rand(args.iters, 1, img, img, 3).astype(np.float32))

    @jax.jit
    def run(v, xs):
        def step(c, x):
            d, l, valid = model.apply(v, x, (img, img), method=method)
            return c + jnp.sum(d) + jnp.sum(valid), None
        s, _ = jax.lax.scan(step, jnp.zeros(()), xs)
        return s

    v = {"params": params}
    print("compiling...", file=sys.stderr)
    float(run(v, imgs))
    t0 = time.perf_counter()
    float(run(v, imgs))
    dt = time.perf_counter() - t0
    print(f"{args.subdataset}: {args.iters} imgs in {dt:.3f}s = "
          f"{args.iters / dt:.2f} FPS ({img}x{img})")


if __name__ == "__main__":
    main()
