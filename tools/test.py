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
    from sm3det_tpu.core.evaluation.eval_map import eval_rbbox_map
    from sm3det_tpu.data import transforms as T
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

    def preprocess(raw):
        """Eval host pipeline: keep-ratio resize + pad only, staying
        uint8 — normalization runs IN-GRAPH on device (4x less
        host->device traffic and no per-image host normalize; this host
        has one core, so host work is the eval throughput ceiling).
        Returns (img (S,S,3) uint8, scale) so dets can be mapped back
        to original coords (reference rescale=True)."""
        img = raw["img"]
        h, w = img.shape[:2]
        scale = min(S / h, S / w)
        img, _, _, _ = T.resize(img, (S, S), None, None, keep_ratio=True)
        if img.dtype != np.uint8:
            # bilinear resize promotes to float32; cast back so the host
            # pipeline stays uint8 end-to-end (one jit signature, 4x less
            # host->device traffic)
            img = np.clip(np.rint(img), 0, 255).astype(np.uint8)
        if img.shape[:2] != (S, S):
            # pad with mean-valued pixels (BGR layout, so after the
            # in-graph BGR->RGB permute + normalize the band is ~0 —
            # matching the train pipeline's normalize-then-zero-pad order,
            # reference Normalize->Pad)
            out = np.empty((S, S) + img.shape[2:], np.uint8)
            out[...] = np.rint(np.asarray(pipe.mean)[::-1]).astype(np.uint8)
            out[:img.shape[0], :img.shape[1]] = img
            img = out
        return np.ascontiguousarray(img), scale

    # init / load params
    g0 = 8
    img0, _ = preprocess(ds.get_raw(0))
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
    bs = max(args.batch_size, 1)
    # in-graph normalization: uint8 -> f32, BGR->RGB via gather (a
    # ::-1 reverse inside big graphs crashes libtpu's fusion emitter),
    # then (x - mean) / std — mirrors T.normalize(to_rgb=True)
    import jax.numpy as jnp
    mean_d = jnp.asarray(pipe.mean, jnp.float32)
    inv_std_d = jnp.asarray(1.0 / np.asarray(pipe.std, np.float32))
    chan_perm = jnp.asarray([2, 1, 0])

    def _fwd(v, x_u8):
        xf = x_u8.astype(jnp.float32)
        xf = jnp.take(xf, chan_perm, axis=-1)
        xf = (xf - mean_d) * inv_std_d
        return model.apply(v, xf, (S, S), method=method)

    test_fn = jax.jit(_fwd)

    n_total = len(ds) if args.num_images is None \
        else min(args.num_images, len(ds))
    det_results, annotations, img_ids = [], [], []
    variables = {"params": params}

    # compile outside the timed window (the reference's benchmark.py
    # also excludes warmup iterations from its FPS measurement)
    warm = np.zeros((bs, S, S, 3), np.uint8)
    # value fetch, not block_until_ready: only fetches force remote
    # execution through the axon tunnel (see CLAUDE.md gotchas)
    jax.device_get(test_fn(variables, warm)[2])
    t0 = time.perf_counter()

    # producer thread + pool: host pipeline overlaps device inference
    # (the reference's multi-worker eval DataLoader)
    import queue
    import threading
    from concurrent.futures import ThreadPoolExecutor
    bq: "queue.Queue" = queue.Queue(maxsize=2)

    producer_exc: list = []

    def producer():
        # always enqueue the sentinel, even on error — otherwise a data
        # error in this daemon thread would leave the consumer blocked on
        # bq.get() forever; the exception is re-raised in the main thread
        try:
            with ThreadPoolExecutor(4) as pool:
                for start in range(0, n_total, bs):
                    idxs = list(range(start, min(start + bs, n_total)))
                    raws = list(pool.map(ds.get_raw, idxs))
                    pre = list(pool.map(preprocess, raws))
                    imgs = np.stack([p[0] for p in pre])
                    if len(idxs) < bs:  # pad the tail batch (static shapes)
                        imgs = np.concatenate(
                            [imgs, np.repeat(imgs[-1:], bs - len(idxs), 0)])
                    bq.put((raws, pre, imgs))
        except BaseException as e:          # noqa: BLE001
            producer_exc.append(e)
        finally:
            bq.put(None)

    threading.Thread(target=producer, daemon=True).start()
    done = 0
    ncol = 5 if sub == "sar" else 6

    def consume(pending):
        """device_get one finished batch and postprocess on host."""
        nonlocal done
        raws, pre, fut = pending
        dets_b, labels_b, valid_b = jax.device_get(fut)
        done += len(raws)
        if done % (bs * 8) < bs or done >= n_total:
            print(f"  [{done}/{n_total}] "
                  f"{done / (time.perf_counter() - t0):.1f} img/s",
                  flush=True)
        for j, (raw, (_, scale)) in enumerate(zip(raws, pre)):
            # compact to valid rows ONCE, then split the small array by
            # class (26 masks over max_det slots per image was the host
            # postprocess hot spot on this 1-core machine)
            v = np.asarray(valid_b[j])
            dets = np.asarray(dets_b[j])[v, :ncol].astype(
                np.float32, copy=True)
            labels = np.asarray(labels_b[j])[v]
            dets[:, :4] /= scale                 # back to original coords
            det_results.append([dets[labels == c] for c in range(nc)])
            key = "hbbs" if sub == "sar" else "obbs"
            ann = dict(bboxes=raw[key], labels=raw["labels"])
            if raw.get(key + "_ignore") is not None:
                # difficult gts -> ignore semantics (tpfp_default,
                # reference eval_map.py:14-126)
                ann["bboxes_ignore"] = raw[key + "_ignore"]
                ann["labels_ignore"] = raw["labels_ignore"]
            annotations.append(ann)
            img_ids.append(str(raw.get("img_id", len(img_ids))))

    # one-deep dispatch pipeline: batch k computes on device while
    # batch k-1's results are fetched + postprocessed on host
    pending = None
    while True:
        item = bq.get()
        if item is not None:
            raws, pre, imgs = item
            fut = test_fn(variables, imgs)       # async dispatch
        if pending is not None:
            consume(pending)
        if item is None:
            break
        pending = (raws, pre, fut)
    if producer_exc:
        raise producer_exc[0]
    dt = time.perf_counter() - t0
    print(f"inference: {n_total} images in {dt:.1f}s "
          f"({n_total / dt:.2f} img/s, batch={bs})", flush=True)

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
    scale_ranges = ev.get("scale_ranges") if ev is not None else None
    res = eval_rbbox_map(det_results, annotations,
                         box_dim=4 if sub == "sar" else 5,
                         scale_ranges=scale_ranges)
    print(res)
    if args.out:
        from sm3det_tpu.utils import fileio
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        fileio.dump({"eval": {k: float(v) if np.isscalar(v) else v
                              for k, v in res.items()
                              if np.isscalar(v)},
                     "num_images": n_total,
                     "img_per_s": n_total / dt},
                    args.out, file_format="json")
        print(f"eval dumped to {args.out}")


if __name__ == "__main__":
    main()
