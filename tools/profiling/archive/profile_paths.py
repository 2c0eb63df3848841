#!/usr/bin/env python
"""Per-stage timing of the flagship inference paths on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from sm3det_tpu.models.detectors.trisource import (
    DEFAULT_MODEL_CFG, TriSourceDetector, make_rpn_anchor_generator,
    make_rpn_coder, make_sar_anchor_generator, make_rcnn_coder)
from sm3det_tpu.models.dense_heads.gfl_head import gfl_get_bboxes
from sm3det_tpu.models.dense_heads.oriented_rpn_head import rpn_get_proposals
from sm3det_tpu.models.roi_heads.oriented_roi_head import (
    extract_rotated_roi_feats, roi_head_get_bboxes)
from sm3det_tpu.train.train_state import init_trisource

IMG = 800


def t(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt * 1000:9.1f} ms", flush=True)
    return out


def main():
    import copy
    cfg = copy.deepcopy(DEFAULT_MODEL_CFG)
    model = TriSourceDetector(cfg=cfg)
    rng = np.random.RandomState(0)
    g = 16
    batch = {
        "sar": {"img": rng.rand(2, IMG, IMG, 3).astype(np.float32),
                "gt_bboxes": np.zeros((2, g, 4), np.float32),
                "gt_labels": np.zeros((2, g), np.int32),
                "gt_mask": np.ones((2, g), bool)},
        "rgb": {"img": rng.rand(1, IMG, IMG, 3).astype(np.float32),
                "gt_obbs": np.zeros((1, g, 5), np.float32),
                "gt_labels": np.zeros((1, g), np.int32),
                "gt_mask": np.ones((1, g), bool)},
        "ifr": {"img": rng.rand(1, IMG, IMG, 3).astype(np.float32),
                "gt_obbs": np.zeros((1, g, 5), np.float32),
                "gt_labels": np.zeros((1, g), np.int32),
                "gt_mask": np.ones((1, g), bool)},
    }
    params = init_trisource(jax.random.PRNGKey(0), model, batch)
    v = {"params": params}
    img1 = batch["rgb"]["img"]

    # backbone fwd (1 img)
    bb = jax.jit(lambda v, x: model.apply(
        v, x, False, method=lambda m, x, tr: m.backbone(x, train=tr)))
    feats, _ = t("backbone (1x800x800)", bb, v, img1)

    neck = jax.jit(lambda v, f: model.apply(
        v, f, method=lambda m, f: m._neck_rcnn(list(f))))
    x = t("neck rcnn mode", neck, v, feats)

    rpn_fwd = jax.jit(lambda v, f: model.apply(
        v, f, method=lambda m, f: m.rgb_rpn_head(f)))
    rpn_out = t("rpn conv fwd", rpn_fwd, v, x)

    rpn_gen = make_rpn_anchor_generator()
    rpn_coder = make_rpn_coder("le90")
    props_fn = jax.jit(lambda c, r: rpn_get_proposals(
        c, r, rpn_gen, rpn_coder, None, nms_pre=2000, max_per_img=2000,
        iou_thr=0.8))
    props = t("rpn proposals (topk+decode+NMS)", props_fn, *rpn_out)

    proposals, scores, valid = props
    rois6 = jnp.concatenate(
        [jnp.zeros((2000, 1)), proposals[0]], axis=-1)
    roi_fn = jax.jit(lambda f, r: extract_rotated_roi_feats(list(f), r))
    rf = t("roi_align_rotated 2000 rois x4lvl", roi_fn, x, rois6)

    head_fn = jax.jit(lambda v, rf: model.apply(
        v, rf, method=lambda m, rf: m.rgb_roi_head(rf)))
    ho = t("rcnn bbox head fwd (2000)", head_fn, v, rf)

    rcnn_coder = make_rcnn_coder("le90")
    nms_fn = jax.jit(lambda cl, rp, pr, pv: roi_head_get_bboxes(
        cl, rp, pr, pv, rcnn_coder, 26, img_shape=(IMG, IMG)))
    t("rcnn decode+multiclass rotated NMS", nms_fn,
      ho[0], ho[1], proposals[0], valid[0])

    # SAR side
    sar_imgs = batch["sar"]["img"]
    bb2, _ = bb(v, sar_imgs)
    neck_sar = jax.jit(lambda v, f: model.apply(
        v, f, method=lambda m, f: m._neck_sar(list(f))))
    sx = t("neck sar mode (2 img)", neck_sar, v, bb2)
    gfl_fwd = jax.jit(lambda v, f: model.apply(
        v, f, method=lambda m, f: m.sar_bbox_head(f)))
    go = t("gfl head fwd (2 img)", gfl_fwd, v, sx)
    sar_gen = make_sar_anchor_generator()
    gfl_dec = jax.jit(lambda c, b: gfl_get_bboxes(
        c, b, sar_gen, 26, (IMG, IMG)))
    t("gfl decode+NMS (2 img)", gfl_dec, *go)


if __name__ == "__main__":
    main()
