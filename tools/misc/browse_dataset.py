#!/usr/bin/env python
"""Pipeline debugging: run the data pipeline on a few samples and dump
images with box overlays (parity with ``tools/misc/browse_dataset.py``)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


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
    from sm3det_tpu.utils.image import (imdenormalize, imdraw_polygons,
                                        imwrite)

    ds = SyntheticDetDataset(n=args.num, img_size=args.img_size,
                             box_type="obb", seed=0)
    pipe = PipelineCfg(img_size=args.img_size, rotate_ratio=0.5)
    rng = np.random.RandomState(0)
    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(len(ds)):
        raw = ds.get_raw(i)
        s = run_pipeline(rng, raw, pipe, train=True)
        img = imdenormalize(s["img"], np.array([123.675, 116.28, 103.53]),
                            np.array([58.395, 57.12, 57.375]),
                            to_bgr=False).clip(0, 255).astype(np.uint8)
        n = int(s["gt_mask"].sum())
        polys = obb2poly_np(s["gt_obbs"][:n], "le90")
        out = imdraw_polygons(img, polys)
        path = os.path.join(args.out_dir, f"sample_{i}.png")
        imwrite(out, path, channel_order="rgb")
        print(f"{path}: {n} boxes")


if __name__ == "__main__":
    main()
