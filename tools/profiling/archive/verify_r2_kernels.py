#!/usr/bin/env python
"""Verify pass (round 2 kernel work): drive the changed public surfaces
jitted on the REAL TPU and check outputs against references.

1. nms_rotated (Pallas IoU + blocked greedy keep) == python greedy ref.
2. fused RoIAlignRotated: constant feature map -> pooled == constant;
   grad partition of unity (sum|dFeat| == n_rois*out*out*C for interior
   boxes) through the custom VJP.
3. full RGB inference path (backbone->RPN->fused align->RCNN->NMS) runs
   finite with valid detections.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def log(m):
    print(m, flush=True)


def check_nms():
    from sm3det_tpu.ops import box_iou_rotated, nms_rotated

    rng = np.random.RandomState(7)
    n = 500   # above the 256 block => blocked scan path
    boxes = np.stack([
        rng.uniform(0, 400, n), rng.uniform(0, 400, n),
        rng.uniform(10, 80, n), rng.uniform(10, 80, n),
        rng.uniform(-1.5, 1.5, n)], -1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)

    fn = jax.jit(lambda b, s: nms_rotated(b, s, 0.3, n))
    dets, idx, valid = fn(boxes, scores)
    got = np.asarray(idx)[np.asarray(valid)].tolist()

    iou = np.asarray(jax.jit(box_iou_rotated)(boxes, boxes))
    order = np.argsort(-scores)
    keep, suppressed = [], np.zeros(n, bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > 0.3
    match = got == keep
    log(f"1. nms_rotated on TPU vs python greedy: {len(got)} kept, "
        f"exact match = {match}")
    assert match


def check_roi_align():
    from sm3det_tpu.models.roi_heads.oriented_roi_head import \
        extract_rotated_roi_feats

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.RandomState(0)
    feats = [jnp.full((1, 200 // (2 ** i), 200 // (2 ** i), 128), 3.5,
                      jnp.float32) for i in range(4)]
    n = 64
    rois = jnp.asarray(np.stack([
        np.zeros(n), rng.uniform(150, 650, n), rng.uniform(150, 650, n),
        rng.uniform(20, 100, n), rng.uniform(20, 100, n),
        rng.uniform(-1.5, 1.5, n)], -1).astype(np.float32))

    pooled = jax.jit(extract_rotated_roi_feats)(feats, rois)
    pooled = np.asarray(pooled)
    const_err = np.abs(pooled - 3.5).max()
    log(f"2a. fused align constant map -> pooled==3.5: max err "
        f"{const_err:.2e}")
    assert const_err < 2e-2, const_err   # bf16-grade tolerance (f32 here)

    def total(fs):
        return jnp.sum(extract_rotated_roi_feats(list(fs), rois))

    grads = jax.jit(jax.grad(total))(tuple(feats))
    gsum = sum(float(jnp.sum(g)) for g in grads)
    expect = n * 7 * 7 * 128
    log(f"2b. grad partition of unity: sum(dFeat) = {gsum:.1f} "
        f"(expect {expect})")
    assert abs(gsum - expect) / expect < 1e-3


def check_rgb_path():
    import copy
    from sm3det_tpu.models.detectors.trisource import (DEFAULT_MODEL_CFG,
                                                       TriSourceDetector)
    from sm3det_tpu.train.train_state import init_trisource

    cfg = copy.deepcopy(DEFAULT_MODEL_CFG)
    cfg["compute_dtype"] = "bfloat16"
    model = TriSourceDetector(cfg=cfg)
    rng = np.random.RandomState(0)
    img = 800
    g = 16
    batch = {"sar": {"img": rng.rand(2, img, img, 3).astype(np.float32),
                     "gt_bboxes": np.zeros((2, g, 4), np.float32),
                     "gt_labels": np.zeros((2, g), np.int32),
                     "gt_mask": np.ones((2, g), bool)},
             "rgb": {"img": rng.rand(1, img, img, 3).astype(np.float32),
                     "gt_obbs": np.zeros((1, g, 5), np.float32),
                     "gt_labels": np.zeros((1, g), np.int32),
                     "gt_mask": np.ones((1, g), bool)},
             "ifr": {"img": rng.rand(1, img, img, 3).astype(np.float32),
                     "gt_obbs": np.zeros((1, g, 5), np.float32),
                     "gt_labels": np.zeros((1, g), np.int32),
                     "gt_mask": np.ones((1, g), bool)}}
    model_init = TriSourceDetector(cfg=copy.deepcopy(DEFAULT_MODEL_CFG))
    params = init_trisource(jax.random.PRNGKey(0), model_init, batch)
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16)
        if p.dtype == jnp.float32 else p, params)
    v = {"params": params}
    fn = jax.jit(lambda v, x: model.apply(v, x, (img, img),
                                          method="simple_test_rgb"))
    dets, labels, valid = fn(v, batch["rgb"]["img"])
    d = np.asarray(dets)
    nval = int(np.asarray(valid).sum())
    log(f"3. RGB full path (fused align in production): dets finite = "
        f"{bool(np.isfinite(d).all())}, {nval} valid detections")
    assert np.isfinite(d).all()
    assert nval > 0


if __name__ == "__main__":
    log(f"backend: {jax.default_backend()}")
    check_nms()
    check_roi_align()
    check_rgb_path()
    log("VERIFY OK")
