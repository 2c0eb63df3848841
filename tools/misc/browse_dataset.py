#!/usr/bin/env python
"""Pipeline debugging: run the data pipeline on a few samples and dump
images with box overlays (parity with ``tools/misc/browse_dataset.py``)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def draw_boxes(img, polys):
    """Paint polygon outlines (nearest-pixel) into an RGB uint8 image."""
    import numpy as np
    img = img.copy()
    h, w = img.shape[:2]
    for poly in polys:
        pts = poly.reshape(4, 2)
        for i in range(4):
            x0, y0 = pts[i]
            x1, y1 = pts[(i + 1) % 4]
            n = int(max(abs(x1 - x0), abs(y1 - y0), 1)) * 2
            xs = np.linspace(x0, x1, n).astype(int).clip(0, w - 1)
            ys = np.linspace(y0, y1, n).astype(int).clip(0, h - 1)
            img[ys, xs] = (255, 0, 0)
    return img


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out-dir", default="work_dirs/browse")
    p.add_argument("--num", type=int, default=4)
    p.add_argument("--img-size", type=int, default=256)
    args = p.parse_args()

    import numpy as np
    from sm3det_tpu.data.datasets import SyntheticDetDataset
    from sm3det_tpu.data.loader import PipelineCfg, run_pipeline
    from sm3det_tpu.ops.box_convert import obb2poly_np

    ds = SyntheticDetDataset(n=args.num, img_size=args.img_size,
                             box_type="obb", seed=0)
    pipe = PipelineCfg(img_size=args.img_size, rotate_ratio=0.5)
    rng = np.random.RandomState(0)
    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(len(ds)):
        raw = ds.get_raw(i)
        s = run_pipeline(rng, raw, pipe, train=True)
        # un-normalize for display
        img = (s["img"] * np.array([58.395, 57.12, 57.375]) +
               np.array([123.675, 116.28, 103.53])).clip(0, 255)
        img = img.astype(np.uint8)
        n = int(s["gt_mask"].sum())
        polys = obb2poly_np(s["gt_obbs"][:n], "le90")
        out = draw_boxes(img, polys)
        path = os.path.join(args.out_dir, f"sample_{i}.png")
        try:
            from PIL import Image
            Image.fromarray(out).save(path)
        except ImportError:
            np.save(path.replace(".png", ".npy"), out)
        print(f"{path}: {n} boxes")


if __name__ == "__main__":
    main()
