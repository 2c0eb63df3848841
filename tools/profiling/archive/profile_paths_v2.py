#!/usr/bin/env python
"""Device-true stage decomposition of the flagship bench paths
(in-jit fori_loop timing, tools/ptime.py). Stages nest, so deltas give
per-stage cost:

  feat       = backbone + neck
  rpn        = feat + RPN head + proposal decode/NMS
  full rgb   = rpn + RoI align + RCNN head + rotated multiclass NMS
  full sar   = feat + GFL head + decode/NMS
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import copy

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from ptime import device_time  # noqa: E402

IMG = 800


def log(m):
    print(m, flush=True)


def main():
    from sm3det_tpu.models.detectors.trisource import (
        DEFAULT_MODEL_CFG, TriSourceDetector, make_rpn_anchor_generator,
        make_rpn_coder)
    from sm3det_tpu.models.dense_heads.oriented_rpn_head import \
        rpn_get_proposals
    from sm3det_tpu.train.train_state import init_trisource

    cfg = copy.deepcopy(DEFAULT_MODEL_CFG)
    model_init = TriSourceDetector(cfg=cfg)
    cfg16 = copy.deepcopy(cfg)
    cfg16["compute_dtype"] = "bfloat16"
    model = TriSourceDetector(cfg=cfg16)

    rng = np.random.RandomState(0)
    g = 16

    def mk(n):
        return {"img": rng.rand(n, IMG, IMG, 3).astype(np.float32),
                "gt_obbs": np.zeros((n, g, 5), np.float32),
                "gt_bboxes": np.zeros((n, g, 4), np.float32),
                "gt_labels": np.zeros((n, g), np.int32),
                "gt_mask": np.ones((n, g), bool)}

    batch = {"sar": {k: v for k, v in mk(2).items() if k != "gt_obbs"},
             "rgb": {k: v for k, v in mk(1).items() if k != "gt_bboxes"},
             "ifr": {k: v for k, v in mk(1).items() if k != "gt_bboxes"}}
    params = init_trisource(jax.random.PRNGKey(0), model_init, batch)
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16)
        if p.dtype == jnp.float32 else p, params)
    v = {"params": params}

    def feat_rcnn(m, x, did):
        ids = jnp.full((x.shape[0],), did, jnp.int32)
        feats, _ = m.backbone(m._cast_in(x), train=False,
                              dataset_ids=ids)
        return m._neck_rcnn(list(feats))

    def feat_sar(m, x):
        ids = jnp.zeros((x.shape[0],), jnp.int32)
        feats, _ = m.backbone(m._cast_in(x), train=False,
                              dataset_ids=ids)
        return m._neck_sar(list(feats))

    def rpn_stage(m, x, did):
        c = m.cfg
        xs = feat_rcnn(m, x, did)
        rpn_head = m.rgb_rpn_head if did == 1 else m.ifr_rpn_head
        rpn_cls, rpn_reg = rpn_head(xs)
        rpn_cls = [s.astype(jnp.float32) for s in rpn_cls]
        rpn_reg = [p.astype(jnp.float32) for p in rpn_reg]
        gen = make_rpn_anchor_generator(tuple(c["rgb"]["rpn_strides"]))
        coder = make_rpn_coder(c["angle_version"])
        return rpn_get_proposals(
            rpn_cls, rpn_reg, gen, coder, img_shape=(IMG, IMG),
            nms_pre=c["rgb"]["rpn_nms_pre"],
            max_per_img=c["rgb"]["rpn_max"],
            iou_thr=c["rgb"]["rpn_nms_iou"])

    x2 = jnp.asarray(rng.rand(2, IMG, IMG, 3).astype(np.float32))
    x1 = jnp.asarray(rng.rand(1, IMG, IMG, 3).astype(np.float32))

    runs = [
        ("feat 2img (backbone+neck)",
         lambda vv, x: model.apply(vv, x, 0, method=feat_rcnn), x2),
        ("feat 1img (backbone+neck)",
         lambda vv, x: model.apply(vv, x, 1, method=feat_rcnn), x1),
        ("sar full 2img",
         lambda vv, x: model.apply(vv, x, (IMG, IMG),
                                   method="simple_test_sar"), x2),
        ("rgb rpn-stage 1img",
         lambda vv, x: model.apply(vv, x, 1, method=rpn_stage), x1),
        ("rgb full 1img",
         lambda vv, x: model.apply(vv, x, (IMG, IMG),
                                   method="simple_test_rgb"), x1),
    ]

    # params must be an ARGUMENT (a closed-over tree is inlined into the
    # compile payload -> tunnel HTTP 413); perturb the image input only
    def perturb(a, eps):
        return (a[0], a[1] + eps * 1e-9)

    for name, fn, x in runs:
        dt = device_time(fn, (v, x), iters=8, perturb=perturb)
        log(f"{name:34s} {dt:8.2f} ms")


if __name__ == "__main__":
    main()
