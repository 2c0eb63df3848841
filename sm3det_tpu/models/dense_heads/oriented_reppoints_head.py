"""Oriented RepPoints head (compact TPU re-design).

Parity target: ``mmrotate/models/dense_heads/oriented_reppoints_head.py:49``
— per-point prediction of a 9-point set (init + refine stages); oriented
boxes come from ``min_area_polygons`` over the point set; localization
losses use convex GIoU (``convex_giou`` CUDA grad in the reference — here
autodiff through our rotating-calipers op) plus a spatial-border/chamfer
term. Assignment: points-in-gt for init (SASAssigner contract simplified
to center-in-gt + nearest), MaxIoU on converted boxes for refine.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.geometry_extras import (chamfer_distance, min_area_polygons)
from ...ops.box_convert import poly2obb
from ...ops.rotated_iou import box_iou_rotated_chunked
from ...core.bbox.assigners import max_iou_assign
from ..losses import sigmoid_focal_loss, rotated_iou_loss


class OrientedRepPointsHead(nn.Module):
    num_classes: int = 15
    feat_channels: int = 256
    num_points: int = 9
    stacked_convs: int = 3
    gn_groups: int = 32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        """Returns per-level (cls (B,H,W,C), init_offsets (B,H,W,2P),
        refine_offsets (B,H,W,2P))."""
        cls_convs = [(nn.Conv(self.feat_channels, (3, 3), padding=1,
                              use_bias=False, name=f"cls_conv{i}"),
                      nn.GroupNorm(num_groups=self.gn_groups,
                                   name=f"cls_gn{i}"))
                     for i in range(self.stacked_convs)]
        reg_convs = [(nn.Conv(self.feat_channels, (3, 3), padding=1,
                              use_bias=False, name=f"reg_conv{i}"),
                      nn.GroupNorm(num_groups=self.gn_groups,
                                   name=f"reg_gn{i}"))
                     for i in range(self.stacked_convs)]
        p2 = 2 * self.num_points
        cls_out = nn.Conv(self.num_classes, (3, 3), padding=1,
                          bias_init=nn.initializers.constant(
                              float(-np.log((1 - 0.01) / 0.01))),
                          name="reppoints_cls")
        init_out = nn.Conv(p2, (3, 3), padding=1, name="reppoints_init")
        refine_out = nn.Conv(p2, (3, 3), padding=1,
                             name="reppoints_refine")
        outs = []
        for x in feats:
            cf, rf = x, x
            for conv, gn in cls_convs:
                cf = nn.relu(gn(conv(cf)))
            for conv, gn in reg_convs:
                rf = nn.relu(gn(conv(rf)))
            init_off = init_out(rf)
            refine_off = refine_out(rf) + jax.lax.stop_gradient(init_off)
            outs.append((cls_out(cf), init_off, refine_off))
        return tuple(zip(*outs))


def points_to_obbs(offsets, centers, stride, version="le90"):
    """offsets (N, 2P) around centers (N, 2) -> min-area OBBs (N, 5).

    ``stride``: (N,) per-point stride scaling the offsets."""
    n = offsets.shape[0]
    p = offsets.reshape(n, -1, 2) * stride.reshape(n, 1, 1) \
        + centers[:, None, :]
    polys = min_area_polygons(p)
    return poly2obb(polys, version), p


def reppoints_loss(cls_scores, init_offsets, refine_offsets,
                   gt_obbs, gt_labels, gt_mask, num_classes: int,
                   strides=(8, 16, 32, 64, 128), version="le90"):
    """Init stage: center-in-gt assignment, rotated-IoU loss on converted
    boxes. Refine stage: MaxIoU assignment on init boxes + IoU loss +
    chamfer regularizer. Classification: focal on refine assignment."""
    centers_l = []
    for lvl, s in enumerate(cls_scores):
        h, w = s.shape[1:3]
        ys = (jnp.arange(h) + 0.5) * strides[lvl]
        xs = (jnp.arange(w) + 0.5) * strides[lvl]
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        centers_l.append(
            jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    centers = jnp.concatenate(centers_l)
    stride_vec = jnp.concatenate([
        jnp.full((c.shape[0],), strides[i], jnp.float32)
        for i, c in enumerate(centers_l)])

    nc = num_classes
    p2 = init_offsets[0].shape[-1]
    flat_cls = jnp.concatenate(
        [s.reshape(s.shape[0], -1, nc) for s in cls_scores], 1)
    flat_init = jnp.concatenate(
        [o.reshape(o.shape[0], -1, p2) for o in init_offsets], 1)
    flat_refine = jnp.concatenate(
        [o.reshape(o.shape[0], -1, p2) for o in refine_offsets], 1)

    def single(cls_s, init_o, refine_o, gts, labels, mask):
        init_obbs, init_pts = points_to_obbs(
            init_o, centers, stride_vec, version)
        refine_obbs, refine_pts = points_to_obbs(
            refine_o, centers, stride_vec, version)

        # init assignment: center inside gt (rotated) — nearest gt center
        cx, cy, w, h, th = (gts[:, i] for i in range(5))
        cos_t, sin_t = jnp.cos(th), jnp.sin(th)
        dx = centers[:, 0][:, None] - cx[None]
        dy = centers[:, 1][:, None] - cy[None]
        fx = cos_t[None] * dx + sin_t[None] * dy
        fy = -sin_t[None] * dx + cos_t[None] * dy
        inside = (jnp.abs(fx) < w[None] / 2) & \
                 (jnp.abs(fy) < h[None] / 2) & mask[None]
        d2 = dx * dx + dy * dy
        d2 = jnp.where(inside, d2, jnp.inf)
        init_gt = jnp.argmin(d2, axis=1)
        init_pos = jnp.isfinite(jnp.min(d2, axis=1))
        # linear mode: the bounded analog of the reference's
        # ConvexGIoULoss (oriented_reppoints config :47-48); the
        # function default is 'log' per rotated_iou_loss.py:82
        l_init = rotated_iou_loss(
            init_obbs, gts[init_gt], mode="linear",
            weight=init_pos.astype(jnp.float32), avg_factor=1.0)

        # refine assignment: MaxIoU between init boxes and gts
        ious = box_iou_rotated_chunked(
            jax.lax.stop_gradient(init_obbs), gts)
        ious = jnp.where(mask[None, :], ious, -1.0)
        assigned = max_iou_assign(ious, mask, pos_iou_thr=0.5,
                                  neg_iou_thr=0.4, min_pos_iou=0.0,
                                  match_low_quality=True)
        pos = assigned > 0
        gt_idx = jnp.clip(assigned - 1, 0)
        cls_t = jnp.where(pos, labels[gt_idx], nc)
        l_cls = sigmoid_focal_loss(
            cls_s, cls_t, weight=jnp.ones(cls_s.shape[0]),
            avg_factor=1.0)
        l_refine = rotated_iou_loss(
            refine_obbs, gts[gt_idx], mode="linear",
            weight=pos.astype(jnp.float32), avg_factor=1.0)
        return l_cls, l_init, l_refine, jnp.sum(pos), \
            jnp.sum(init_pos)

    l_cls, l_init, l_refine, n_pos, n_init = jax.vmap(single)(
        flat_cls, flat_init, flat_refine, gt_obbs, gt_labels, gt_mask)
    t_pos = jnp.maximum(jnp.sum(n_pos).astype(jnp.float32), 1.0)
    t_init = jnp.maximum(jnp.sum(n_init).astype(jnp.float32), 1.0)
    return {"loss_cls": jnp.sum(l_cls) / t_pos,
            "loss_pts_init": 0.375 * jnp.sum(l_init) / t_init,
            "loss_pts_refine": jnp.sum(l_refine) / t_pos}
