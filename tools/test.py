#!/usr/bin/env python
"""Evaluation CLI (parity with reference ``tools/test.py:120-264``:
config, checkpoint, --eval mAP, --format-only DOTA Task1 submission,
per-modality routing via --subdataset).

Real-data path: datasets are built from the config (like tools/train.py);
inference runs BATCHED through one jitted graph; detections are rescaled
back to original image coordinates (the reference's ``rescale=True``);
--format-only groups by real patch ids (``__scale__x___y`` names) via
``merge_det_by_patch_ids`` and writes Task1_<cls>.txt per real CLASSES
(``mmrotate/datasets/dota.py:243-323``).
"""

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
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--num-images", type=int, default=None,
                   help="cap evaluated images (default: full set)")
    p.add_argument("--synthetic-data", action="store_true")
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="inference compute policy (bf16 matches bench.py; "
                        "convergence-parity evidence in docs/PERF.md)")
    p.add_argument("--out", help="dump raw results + eval json here")
    p.add_argument("--tta", action="store_true",
                   help="test-time augmentation driven by cfg.tta "
                        "(scales + flip_directions; reference "
                        "MultiScaleFlipAug -> aug_test)")
    p.add_argument("--cfg-options", nargs="+", default=[])
    return p.parse_args()


def build_dataset(cfg, sub: str, synthetic: bool, min_n: int = 64):
    """Build the eval dataset for one modality from config (mirrors
    tools/train.py build_datasets; falls back to synthetic fixtures when
    paths are absent). ``min_n`` sizes the synthetic fallback so
    --num-images N can demonstrate eval at scale (SURVEY hard part 6)."""
    from sm3det_tpu.data.datasets import (CocoDetDataset, DOTADataset,
                                          SyntheticDetDataset)
    # prefer the test/val split when configured (reference cfg.data.test)
    section = cfg.data
    for split in ("test", "val"):
        if cfg.data.get(split) is not None and \
                cfg.data[split].get(sub) is not None:
            section = cfg.data[split]
            break
    dcfg = section[sub].to_dict()
    dcfg.pop("max_gt", None)
    dtype = dcfg.pop("type")
    paths_exist = all(os.path.exists(v) for k, v in dcfg.items()
                      if isinstance(v, str) and "/" in v)
    if synthetic or not paths_exist:
        return SyntheticDetDataset(
            n=max(64, min_n), img_size=cfg.img_size,
            num_classes=cfg.num_classes,
            box_type="hbb" if sub == "sar" else "obb", seed=7)
    if dtype == "CocoDetDataset":
        return CocoDetDataset(**dcfg)
    return DOTADataset(**dcfg, version=cfg.angle_version)


def main():
    args = parse_args()
    from sm3det_tpu.utils.config import Config
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(Config.parse_cli_options(args.cfg_options))

    import jax
    import numpy as np
    from sm3det_tpu.apis.eval_loop import (make_uint8_test_fn,
                                           preprocess_uint8, stream_eval)
    from sm3det_tpu.core.evaluation.eval_map import eval_rbbox_map
    from sm3det_tpu.data.loader import PipelineCfg
    from sm3det_tpu.models.detectors.trisource import TriSourceDetector
    from sm3det_tpu.train.train_state import init_trisource

    model_cfg = cfg.model.to_dict()
    model_cfg.pop("type", None)
    model_cfg["backbone"].pop("pretrained", None)
    model_cfg["backbone"]["moe_block_inds"] = tuple(
        tuple(x) for x in model_cfg["backbone"]["moe_block_inds"])
    model_init = TriSourceDetector(cfg=model_cfg)
    if args.compute_dtype != "float32":
        model_cfg = dict(model_cfg, compute_dtype=args.compute_dtype)
    model = TriSourceDetector(cfg=model_cfg)

    sub = args.subdataset
    ds = build_dataset(cfg, sub, args.synthetic_data,
                       min_n=args.num_images or 64)
    classes = list(getattr(ds, "CLASSES", ())) or [
        f"class_{c}" for c in range(cfg.num_classes)]
    nc = cfg.num_classes
    pipe = PipelineCfg(img_size=cfg.img_size, version=cfg.angle_version)
    S = cfg.img_size

    # init / load params
    g0 = 8
    img0, _ = preprocess_uint8(ds.get_raw(0), S, pipe.mean)
    dummy = np.zeros((1, S, S, 3), np.float32)
    dummy_batch = {
        "sar": {"img": dummy, "gt_bboxes": np.zeros((1, g0, 4), np.float32),
                "gt_labels": np.zeros((1, g0), np.int32),
                "gt_mask": np.ones((1, g0), bool)},
        "rgb": {"img": dummy, "gt_obbs": np.zeros((1, g0, 5), np.float32),
                "gt_labels": np.zeros((1, g0), np.int32),
                "gt_mask": np.ones((1, g0), bool)},
        "ifr": {"img": dummy, "gt_obbs": np.zeros((1, g0, 5), np.float32),
                "gt_labels": np.zeros((1, g0), np.int32),
                "gt_mask": np.ones((1, g0), bool)},
    }
    params = init_trisource(jax.random.PRNGKey(0), model_init, dummy_batch,
                            source_ratio=(1, 1, 1))
    if args.checkpoint:
        from sm3det_tpu.train.checkpoint import load_params
        params = load_params(args.checkpoint, params)
        print(f"loaded {args.checkpoint}")

    method = {"sar": "simple_test_sar", "rgb": "simple_test_rgb",
              "ifr": "simple_test_ifr"}[sub]
    method_kwargs = None
    if args.tta:
        # cfg.tta mirrors MultiScaleFlipAug: scales (relative factors)
        # x [identity + each flip direction]
        tta = cfg.get("tta")
        scales = tuple(tta.get("scales", (1.0,))) if tta else (1.0,)
        flips = tuple(tta.get("flip_directions", ("horizontal",))) \
            if tta else ("horizontal",)
        method = "aug_test"
        method_kwargs = dict(subdataset=sub, scales=scales,
                             flip_directions=(None,) + flips)
        print(f"TTA: {method_kwargs}")
    bs = max(args.batch_size, 1)
    test_fn = make_uint8_test_fn(model, method, S, pipe.mean, pipe.std,
                                 method_kwargs=method_kwargs)

    n_total = len(ds) if args.num_images is None \
        else min(args.num_images, len(ds))
    variables = {"params": params}

    # compile outside the timed window (the reference's benchmark.py
    # also excludes warmup iterations from its FPS measurement)
    warm = np.zeros((bs, S, S, 3), np.uint8)
    # value fetch, not block_until_ready: only fetches force remote
    # execution through the axon tunnel (see CLAUDE.md gotchas)
    jax.device_get(test_fn(variables, warm)[2])
    t0 = time.perf_counter()

    def progress(done, n):
        if done % (bs * 8) < bs or done >= n:
            print(f"  [{done}/{n}] "
                  f"{done / (time.perf_counter() - t0):.1f} img/s",
                  flush=True)

    det_results, annotations, img_ids = stream_eval(
        test_fn, variables, ds, S, pipe.mean,
        num_classes=nc, box_dim=4 if sub == "sar" else 5,
        gt_key="hbbs" if sub == "sar" else "obbs",
        batch_size=bs, indices=range(n_total), progress=progress)
    dt = time.perf_counter() - t0
    print(f"inference: {n_total} images in {dt:.1f}s "
          f"({n_total / dt:.2f} img/s, batch={bs})", flush=True)

    if args.format_only and sub == "sar":
        # COCO-json results (mmdet CocoDataset.format_results /
        # _det2json: one record per det with xywh bbox, score,
        # category_id, image_id) — the SAR submission format
        from sm3det_tpu.utils import fileio
        records = []
        for img_id, per_class in zip(img_ids, det_results):
            for c, dets in enumerate(per_class):
                for d in dets:
                    x1, y1, x2, y2, s = (float(v) for v in d[:5])
                    records.append(dict(
                        image_id=int(img_id) if str(img_id).isdigit()
                        else img_id,
                        bbox=[x1, y1, x2 - x1, y2 - y1],
                        score=s, category_id=c))
        os.makedirs(args.submission_dir, exist_ok=True)
        out_json = os.path.join(args.submission_dir, "results.bbox.json")
        fileio.dump(records, out_json, file_format="json")
        print(f"COCO results written: {out_json} "
              f"({len(records)} detections)")
        return

    if args.format_only and sub != "sar":
        # DOTA Task1 submission (dota.py:243-323): real patch ids carry
        # the '__scale__x___y' suffix; merge translates + NMS-merges per
        # base image, then per-class txt + zip with real class names
        from sm3det_tpu.core.patch.split_merge import (
            merge_det_by_patch_ids, write_dota_submission)
        merged = merge_det_by_patch_ids(img_ids, det_results, nc)
        zip_path = write_dota_submission(
            merged, classes[:nc], args.submission_dir,
            version=cfg.angle_version)
        print(f"submission written: {zip_path} "
              f"({len(merged)} merged images)")
        return

    ev = cfg.get("evaluation")
    # metric routing mirrors the reference config contract
    # (main_SM3Det.py:286-288): SAR -> CocoDataset.evaluate('bbox')
    # == pycocotools COCO protocol; RGB/IFR -> VOC-style 'mAP'
    metric = (ev.get("metric") if ev is not None else None) or (
        "bbox" if sub == "sar" else "mAP")
    if metric == "bbox":
        from sm3det_tpu.core.evaluation.coco_eval import coco_eval_bbox
        res = coco_eval_bbox(
            det_results, annotations,
            classwise=bool(ev.get("classwise", True)) if ev else True,
            class_names=classes)
    else:
        scale_ranges = ev.get("scale_ranges") if ev is not None else None
        res = eval_rbbox_map(det_results, annotations,
                             box_dim=4 if sub == "sar" else 5,
                             scale_ranges=scale_ranges)
    print(res)
    if args.out:
        from sm3det_tpu.utils import fileio
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        fileio.dump({"eval": {k: (float(v) if isinstance(
                                  v, (int, float, np.floating)) else v)
                              for k, v in res.items()
                              if np.isscalar(v)},
                     "num_images": n_total,
                     "img_per_s": n_total / dt},
                    args.out, file_format="json")
        print(f"eval dumped to {args.out}")


if __name__ == "__main__":
    main()
