"""RepPoints dense-head variants: RotatedRepPoints / SAMRepPoints /
G-RepPoints (KLD).

Parity targets:
- ``mmrotate/models/dense_heads/rotated_reppoints_head.py:20`` — same
  tower as OrientedRepPoints (3 stacked convs, init/refine point offsets,
  ``min_area_polygons`` box conversion ``:210``); init assignment
  ConvexAssigner, refine MaxConvexIoUAssigner, ConvexGIoU box losses
  (``configs/rotated_reppoints/..._oc.py:47-61``).
- ``sam_reppoints_head.py:20`` — refine assignment swaps to SASAssigner
  (scale-aware top-k inside gt), init loss BCConvexGIoULoss
  (``configs/sasm_reppoints/..._oc.py``).
- G-RepPoints (``configs/g_reppoints/..._le135.py``): both box losses are
  KLDRepPointsLoss (Gaussian-fit KL), assigner ATSSKldAssigner.

TPU re-design: one loss function with a ``variant`` switch; all
assignments are dense masked ops on padded gts (static shapes); the
convex-GIoU gradient comes from autodiff through our rotating-calipers
``min_area_polygons`` instead of the reference's hand-written CUDA grad
(``convex_giou_loss.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.bbox.assigners import convex_assign, sas_assign
from ...ops.box_convert import obb2poly
from ...ops.geometry_extras import convex_giou
from ..losses import (kld_reppoints_loss, sigmoid_focal_loss,
                      spatial_border_loss)
from .oriented_reppoints_head import OrientedRepPointsHead, points_to_obbs


class RotatedRepPointsHead(OrientedRepPointsHead):
    """Tower is identical to OrientedRepPointsHead
    (``rotated_reppoints_head.py:156`` builds the same 3-conv cls/reg
    towers + init/refine offset convs); only the target/loss recipe
    differs — see ``reppoints_variant_loss``."""


class SAMRepPointsHead(OrientedRepPointsHead):
    """SAM (scale-adaptive margin) variant; tower identical
    (``sam_reppoints_head.py:154``)."""


def reppoints_variant_loss(cls_scores, init_offsets, refine_offsets,
                           gt_obbs, gt_labels, gt_mask, num_classes: int,
                           strides=(8, 16, 32, 64, 128), version="le90",
                           variant: str = "rotated",
                           spatial_border: bool = False):
    """Loss for the RepPoints variants.

    variant:
      'rotated' — ConvexGIoU init(0.375)+refine(1.0), MaxConvexIoU refine
                  assignment (rotated_reppoints configs)
      'sam'     — same box losses, SASAssigner refine assignment
                  (sasm_reppoints config; BCConvexGIoU ~ ConvexGIoU with
                  border-correction, approximated by ConvexGIoU here)
      'kld'     — KLDRepPointsLoss on both stages (g_reppoints config)
    """
    centers_l, stride_l = [], []
    for lvl, s in enumerate(cls_scores):
        h, w = s.shape[1:3]
        ys = (jnp.arange(h) + 0.5) * strides[lvl]
        xs = (jnp.arange(w) + 0.5) * strides[lvl]
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        centers_l.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
        stride_l.append(jnp.full((h * w,), strides[lvl], jnp.float32))
    centers = jnp.concatenate(centers_l)
    stride_vec = jnp.concatenate(stride_l)

    nc = num_classes
    p2 = init_offsets[0].shape[-1]
    flat_cls = jnp.concatenate(
        [s.reshape(s.shape[0], -1, nc) for s in cls_scores], 1)
    flat_init = jnp.concatenate(
        [o.reshape(o.shape[0], -1, p2) for o in init_offsets], 1)
    flat_refine = jnp.concatenate(
        [o.reshape(o.shape[0], -1, p2) for o in refine_offsets], 1)

    def box_loss(pts, gt_polys, pos_w):
        if variant == "kld":
            return kld_reppoints_loss(pts, gt_polys, weight=pos_w,
                                      avg_factor=1.0)
        giou = convex_giou(pts, gt_polys)
        return jnp.sum((1.0 - giou) * pos_w)

    def single(cls_s, init_o, refine_o, gts, labels, mask):
        gt_polys = obb2poly(gts, version)                    # (G, 8)
        _, init_pts = points_to_obbs(init_o, centers, stride_vec, version)
        _, refine_pts = points_to_obbs(refine_o, centers, stride_vec,
                                       version)

        # init assignment: nearest center inside gt (ConvexAssigner is a
        # center/point assigner with pos_num=1)
        cx, cy, w, h, th = (gts[:, i] for i in range(5))
        cos_t, sin_t = jnp.cos(th), jnp.sin(th)
        dx = centers[:, 0][:, None] - cx[None]
        dy = centers[:, 1][:, None] - cy[None]
        fx = cos_t[None] * dx + sin_t[None] * dy
        fy = -sin_t[None] * dx + cos_t[None] * dy
        inside = (jnp.abs(fx) < w[None] / 2) & \
                 (jnp.abs(fy) < h[None] / 2) & mask[None]
        d2 = jnp.where(inside, dx * dx + dy * dy, jnp.inf)
        init_gt = jnp.argmin(d2, axis=1)
        init_pos = jnp.isfinite(jnp.min(d2, axis=1))
        init_w = init_pos.astype(jnp.float32)
        l_init = box_loss(init_pts, gt_polys[init_gt], init_w)

        # refine assignment per variant
        if variant == "sam":
            assigned = sas_assign(centers, stride_vec, gts, mask, topk=9)
        else:
            assigned = convex_assign(
                jax.lax.stop_gradient(init_pts), gt_polys, mask,
                pos_iou_thr=0.5 if variant == "rotated" else 0.4,
                neg_iou_thr=0.4)
        pos = assigned > 0
        gt_idx = jnp.clip(assigned - 1, 0)
        pos_w = pos.astype(jnp.float32)
        cls_t = jnp.where(pos, labels[gt_idx], nc)
        l_cls = sigmoid_focal_loss(
            cls_s, cls_t, weight=jnp.ones(cls_s.shape[0]), avg_factor=1.0)
        l_refine = box_loss(refine_pts, gt_polys[gt_idx], pos_w)

        l_sp_init = l_sp_refine = jnp.zeros(())
        if spatial_border:
            l_sp_init = spatial_border_loss(
                init_pts, gt_polys[init_gt], init_w)
            l_sp_refine = spatial_border_loss(
                refine_pts, gt_polys[gt_idx], pos_w)
        return (l_cls, l_init, l_refine, l_sp_init, l_sp_refine,
                jnp.sum(pos), jnp.sum(init_pos))

    (l_cls, l_init, l_refine, l_spi, l_spr, n_pos, n_init) = jax.vmap(
        single)(flat_cls, flat_init, flat_refine, gt_obbs, gt_labels,
                gt_mask)
    t_pos = jnp.maximum(jnp.sum(n_pos).astype(jnp.float32), 1.0)
    t_init = jnp.maximum(jnp.sum(n_init).astype(jnp.float32), 1.0)
    out = {"loss_cls": jnp.sum(l_cls) / t_pos,
           "loss_pts_init": 0.375 * jnp.sum(l_init) / t_init,
           "loss_pts_refine": jnp.sum(l_refine) / t_pos}
    if spatial_border:
        # reference weights: 0.05 init / 0.1 refine (oriented_reppoints
        # config :49-50); spatial losses are already per-out-point means
        out["loss_spatial_init"] = 0.05 * jnp.mean(l_spi)
        out["loss_spatial_refine"] = 0.1 * jnp.mean(l_spr)
    return out
