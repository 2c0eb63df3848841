#!/usr/bin/env python
"""Evaluation CLI (parity with ``tools/test.py``: config, checkpoint,
--eval mAP / bbox, per-modality routing via --subdataset)."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("SM3DET_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")


def parse_args():
    p = argparse.ArgumentParser(description="Test a detector")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?")
    p.add_argument("--subdataset", default="rgb",
                   choices=["sar", "rgb", "ifr"])
    p.add_argument("--eval", default="mAP")
    p.add_argument("--format-only", action="store_true",
                   help="write DOTA Task1 submission instead of eval")
    p.add_argument("--submission-dir", default="work_dirs/submission")
    p.add_argument("--num-images", type=int, default=32)
    p.add_argument("--synthetic-data", action="store_true")
    p.add_argument("--cfg-options", nargs="+", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    from sm3det_tpu.utils.config import Config
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(Config.parse_cli_options(args.cfg_options))

    import jax
    import numpy as np
    from sm3det_tpu.core.evaluation.eval_map import eval_rbbox_map
    from sm3det_tpu.data.datasets import SyntheticDetDataset
    from sm3det_tpu.data.loader import PipelineCfg, run_pipeline
    from sm3det_tpu.models.detectors.trisource import TriSourceDetector
    from sm3det_tpu.train.checkpoint import load_checkpoint
    from sm3det_tpu.train.train_state import init_trisource

    model_cfg = cfg.model.to_dict()
    model_cfg.pop("type", None)
    model_cfg["backbone"].pop("pretrained", None)
    model_cfg["backbone"]["moe_block_inds"] = tuple(
        tuple(x) for x in model_cfg["backbone"]["moe_block_inds"])
    model = TriSourceDetector(cfg=model_cfg)

    sub = args.subdataset
    box_type = "hbb" if sub == "sar" else "obb"
    ds = SyntheticDetDataset(
        n=args.num_images, img_size=cfg.img_size,
        num_classes=cfg.num_classes, box_type=box_type, seed=7)

    pipe = PipelineCfg(img_size=cfg.img_size, version=cfg.angle_version)
    rng = np.random.RandomState(0)

    # init / load params
    sample = run_pipeline(rng, ds.get_raw(0), pipe, train=False)
    img = sample["img"][None]
    dummy_batch = {
        "sar": {"img": img, "gt_bboxes": np.zeros((1, 8, 4), np.float32),
                "gt_labels": np.zeros((1, 8), np.int32),
                "gt_mask": np.ones((1, 8), bool)},
        "rgb": {"img": img, "gt_obbs": np.zeros((1, 8, 5), np.float32),
                "gt_labels": np.zeros((1, 8), np.int32),
                "gt_mask": np.ones((1, 8), bool)},
        "ifr": {"img": img, "gt_obbs": np.zeros((1, 8, 5), np.float32),
                "gt_labels": np.zeros((1, 8), np.int32),
                "gt_mask": np.ones((1, 8), bool)},
    }
    params = init_trisource(jax.random.PRNGKey(0), model, dummy_batch,
                            source_ratio=(1, 1, 1))
    if args.checkpoint:
        from sm3det_tpu.train.train_state import TrainState
        # restore params-only
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(args.checkpoint))
        params = restored["params"] if "params" in restored else restored
        print(f"loaded {args.checkpoint}")

    method = {"sar": "simple_test_sar", "rgb": "simple_test_rgb",
              "ifr": "simple_test_ifr"}[sub]
    test_fn = jax.jit(lambda v, x: model.apply(
        v, x, (cfg.img_size, cfg.img_size), method=method))

    det_results, annotations = [], []
    t0 = time.perf_counter()
    nc = cfg.num_classes
    for i in range(len(ds)):
        raw = ds.get_raw(i)
        s = run_pipeline(rng, raw, pipe, train=False)
        dets, labels, valid = jax.device_get(
            test_fn({"params": params}, s["img"][None]))
        dets, labels, valid = dets[0], labels[0], valid[0]
        per_class = []
        bd = 4 if sub == "sar" else 5
        for c in range(nc):
            sel = valid & (labels == c)
            if sub == "sar":
                arr = np.concatenate(
                    [dets[sel][:, :4], dets[sel][:, 4:5]], -1)
            else:
                arr = dets[sel][:, :6]
            per_class.append(arr)
        det_results.append(per_class)
        key = "hbbs" if sub == "sar" else "obbs"
        annotations.append(dict(bboxes=raw[key], labels=raw["labels"]))
    dt = time.perf_counter() - t0
    print(f"inference: {len(ds)} images in {dt:.1f}s "
          f"({len(ds) / dt:.2f} img/s)")

    if args.format_only and sub != "sar":
        # DOTA Task1 submission path (dota.py:243-323 parity):
        # patch-id merge + per-class txt + zip
        from sm3det_tpu.core.patch.split_merge import (
            merge_det_by_patch_ids, write_dota_submission)
        patch_ids = [str(i) for i in range(len(det_results))]
        merged = merge_det_by_patch_ids(
            patch_ids, det_results, nc)
        class_names = [f"class_{c}" for c in range(nc)]
        zip_path = write_dota_submission(
            merged, class_names, args.submission_dir,
            version=cfg.angle_version)
        print(f"submission written: {zip_path}")
        return

    res = eval_rbbox_map(det_results, annotations,
                         box_dim=4 if sub == "sar" else 5)
    print(res)


if __name__ == "__main__":
    main()
