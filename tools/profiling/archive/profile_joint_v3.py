#!/usr/bin/env python
"""Device-true stage decomposition of the JOINT inference path at bench
shapes (4 images [2 SAR:1 RGB:1 IR], 800^2, bf16): nested prefixes of
simple_test_joint, so consecutive deltas give per-stage cost."""
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
    from sm3det_tpu.models.dense_heads.gfl_head import gfl_get_bboxes
    from sm3det_tpu.models.dense_heads.oriented_rpn_head import \
        rpn_get_proposals
    from sm3det_tpu.models.detectors.trisource import (
        DEFAULT_MODEL_CFG, TriSourceDetector, make_rpn_anchor_generator,
        make_rpn_coder, make_sar_anchor_generator)
    from sm3det_tpu.models.roi_heads.oriented_roi_head import \
        extract_rotated_roi_feats
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

    import ast
    n_sar, n_rgb, n_ifr = ast.literal_eval(
        os.environ.get('SM3DET_COMP', '(2, 1, 1)'))
    ids = jnp.asarray([0] * n_sar + [1] * n_rgb + [2] * n_ifr,
                      jnp.int32)

    def backbone_only(m, imgs):
        feats, _ = m.backbone(m._cast_in(imgs), train=False,
                              dataset_ids=ids)
        return feats

    def with_necks(m, imgs):
        feats = backbone_only(m, imgs)
        sar_x = m._neck_sar([f[:n_sar] for f in feats])
        x = m._neck_rcnn([f[n_sar:] for f in feats])
        return sar_x, x

    def with_heads(m, imgs):
        sar_x, x = with_necks(m, imgs)
        cls_scores, bbox_preds = m.sar_bbox_head(sar_x)
        x_rgb = [f[:n_rgb] for f in x]
        x_ifr = [f[n_rgb:] for f in x]
        rgb_cls, rgb_reg = m.rgb_rpn_head(x_rgb)
        ifr_cls, ifr_reg = m.ifr_rpn_head(x_ifr)
        rpn_cls = [jnp.concatenate([a, b], 0).astype(jnp.float32)
                   for a, b in zip(rgb_cls, ifr_cls)]
        rpn_reg = [jnp.concatenate([a, b], 0).astype(jnp.float32)
                   for a, b in zip(rgb_reg, ifr_reg)]
        return cls_scores, bbox_preds, rpn_cls, rpn_reg, x

    def with_decode(m, imgs):
        c = m.cfg
        cls_scores, bbox_preds, rpn_cls, rpn_reg, x = with_heads(
            m, imgs)
        gen = make_sar_anchor_generator(tuple(c["sar"]["strides"]))
        sar_out = gfl_get_bboxes(
            [s.astype(jnp.float32) for s in cls_scores],
            [p.astype(jnp.float32) for p in bbox_preds],
            gen, c["num_classes"], (IMG, IMG),
            reg_max=c["sar"]["reg_max"],
            strides=tuple(c["sar"]["strides"]),
            nms_pre=c["sar"]["nms_pre"],
            score_thr=c["sar"]["score_thr"],
            iou_thr=c["sar"]["nms_iou"],
            max_per_img=c["sar"]["max_per_img"])
        proposals, p_scores, p_valid = rpn_get_proposals(
            rpn_cls, rpn_reg,
            make_rpn_anchor_generator(tuple(c["rgb"]["rpn_strides"])),
            make_rpn_coder(c["angle_version"]), img_shape=(IMG, IMG),
            nms_pre=c["rgb"]["rpn_nms_pre"],
            max_per_img=c["rgb"]["rpn_max"],
            iou_thr=c["rgb"]["rpn_nms_iou"])
        return sar_out, proposals, p_valid, x

    def with_align(m, imgs):
        sar_out, proposals, p_valid, x = with_decode(m, imgs)
        bsz, s = proposals.shape[:2]
        batch_idx = jnp.repeat(
            jnp.arange(bsz, dtype=jnp.float32), s)[:, None]
        rois6 = jnp.concatenate(
            [batch_idx, proposals.reshape(-1, 5)], axis=-1)
        roi_feats = extract_rotated_roi_feats(x, rois6)
        return sar_out, proposals, p_valid, roi_feats

    def with_roiheads(m, imgs):
        sar_out, proposals, p_valid, roi_feats = with_align(m, imgs)
        s = proposals.shape[1]
        rgb_logits, rgb_rp = m.rgb_roi_head(roi_feats[:n_rgb * s])
        ifr_logits, ifr_rp = m.ifr_roi_head(roi_feats[n_rgb * s:])
        return sar_out, proposals, p_valid, rgb_logits, rgb_rp, \
            ifr_logits, ifr_rp

    def full(m, imgs):
        return m.simple_test_joint(
            imgs[:n_sar], imgs[n_sar:n_sar + n_rgb],
            imgs[n_sar + n_rgb:], (IMG, IMG))

    x4 = jnp.asarray(rng.rand(n_sar + n_rgb + n_ifr, IMG, IMG, 3).astype(np.float32))

    def perturb(a, eps):
        return (a[0], a[1] + eps * 1e-9)

    last = 0.0
    for name, fn in [
            ("backbone only (4img)", backbone_only),
            ("+ necks", with_necks),
            ("+ GFL/RPN head convs", with_heads),
            ("+ decode+NMS (gfl+rpn)", with_decode),
            ("+ RoI align", with_align),
            ("+ RoI heads", with_roiheads),
            ("full simple_test_joint", full)]:
        dt = device_time(
            lambda vv, xx, f=fn: model.apply(vv, xx, method=f),
            (v, x4), iters=8, perturb=perturb)
        log(f"{name:28s} {dt:8.2f} ms   (delta {dt - last:+7.2f})")
        last = dt


if __name__ == "__main__":
    main()
