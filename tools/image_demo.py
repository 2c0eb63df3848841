#!/usr/bin/env python
"""Single-image demo (parity: tools/image_demo.py): run one modality's
inference on an image file and save a visualization."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("SM3DET_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("img")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?")
    p.add_argument("--subdataset", default="rgb",
                   choices=["sar", "rgb", "ifr"])
    p.add_argument("--out-file", default="demo_out.png")
    p.add_argument("--score-thr", type=float, default=0.3)
    args = p.parse_args()

    import jax
    import numpy as np
    from sm3det_tpu.utils.config import Config
    from sm3det_tpu.data.datasets import _imread
    from sm3det_tpu.data.loader import PipelineCfg, run_pipeline
    from sm3det_tpu.models.detectors.trisource import TriSourceDetector
    from sm3det_tpu.train.train_state import init_trisource
    from sm3det_tpu.utils.visualization import (imshow_det_bboxes,
                                                imshow_det_rbboxes)

    cfg = Config.fromfile(args.config)
    model_cfg = cfg.model.to_dict()
    model_cfg.pop("type", None)
    model_cfg["backbone"].pop("pretrained", None)
    model_cfg["backbone"]["moe_block_inds"] = tuple(
        tuple(x) for x in model_cfg["backbone"]["moe_block_inds"])
    model = TriSourceDetector(cfg=model_cfg)

    s = cfg.img_size
    g = 8
    img0 = _imread(args.img)
    pipe = PipelineCfg(img_size=s, version=cfg.angle_version)
    sample = run_pipeline(
        np.random.RandomState(0),
        dict(img=img0, obbs=np.zeros((0, 5), np.float32),
             labels=np.zeros((0,), np.int32)), pipe, train=False)
    x = sample["img"][None]
    dummy = {m: {"img": x,
                 ("gt_bboxes" if m == "sar" else "gt_obbs"):
                     np.zeros((1, g, 4 if m == "sar" else 5), np.float32),
                 "gt_labels": np.zeros((1, g), np.int32),
                 "gt_mask": np.ones((1, g), bool)}
             for m in ("sar", "rgb", "ifr")}
    params = init_trisource(jax.random.PRNGKey(0), model, dummy,
                            source_ratio=(1, 1, 1))
    if args.checkpoint:
        import orbax.checkpoint as ocp
        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.checkpoint))
        params = restored.get("params", restored)

    method = {"sar": "simple_test_sar", "rgb": "simple_test_rgb",
              "ifr": "simple_test_ifr"}[args.subdataset]
    dets, labels, valid = jax.device_get(jax.jit(
        lambda v, xx: model.apply(v, xx, (s, s), method=method))(
            {"params": params}, x))
    d, l, v = dets[0][valid[0]], labels[0][valid[0]], valid[0]
    disp = (sample["img"] * np.array([58.395, 57.12, 57.375]) +
            np.array([123.675, 116.28, 103.53])).clip(0, 255)
    if args.subdataset == "sar":
        imshow_det_bboxes(disp.astype(np.uint8),
                          np.concatenate([d[:, :4], d[:, 4:5]], -1), l,
                          score_thr=args.score_thr,
                          out_file=args.out_file)
    else:
        imshow_det_rbboxes(disp.astype(np.uint8), d[:, :6], l,
                           score_thr=args.score_thr,
                           version=cfg.angle_version,
                           out_file=args.out_file)
    print(f"{len(d)} detections -> {args.out_file}")


if __name__ == "__main__":
    main()
