"""Rotated FCOS head (``mmrotate/models/dense_heads/rotated_fcos_head.py``
parity): anchor-free per-point prediction of (l, t, r, b) distances +
angle + centerness; center-sampling assignment by FPN regression ranges.

Includes ``DistanceAnglePointCoder``
(``mmrotate/core/bbox/coder/distance_angle_point_coder.py``): point +
distances + angle <-> OBB.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.box_convert import norm_angle
from ...ops.nms import multiclass_nms_rotated
from ..layers import Scale
from ..losses import (rotated_iou_loss, sigmoid_cross_entropy,
                      sigmoid_focal_loss)

INF = 1e8
REGRESS_RANGES = ((-1, 64), (64, 128), (128, 256), (256, 512),
                  (512, INF))


class DistanceAnglePointCoder:
    def __init__(self, angle_version: str = "le90"):
        self.version = angle_version

    def decode(self, points, pred):
        """points (..., 2) + pred (..., 5)=(l, t, r, b, theta) -> OBB."""
        l, t, r, b, theta = (pred[..., i] for i in range(5))
        cos_a, sin_a = jnp.cos(theta), jnp.sin(theta)
        dw = (r - l) / 2.0
        dh = (b - t) / 2.0
        cx = points[..., 0] + cos_a * dw - sin_a * dh
        cy = points[..., 1] + sin_a * dw + cos_a * dh
        return jnp.stack(
            [cx, cy, l + r, t + b, norm_angle(theta, self.version)], -1)

    def encode(self, points, obbs):
        """OBB -> (l, t, r, b, theta) relative to rotated frame."""
        cx, cy, w, h, theta = (obbs[..., i] for i in range(5))
        cos_a, sin_a = jnp.cos(theta), jnp.sin(theta)
        dx = points[..., 0] - cx
        dy = points[..., 1] - cy
        # rotate offset into the box frame
        fx = cos_a * dx + sin_a * dy
        fy = -sin_a * dx + cos_a * dy
        left = w / 2 + fx
        top = h / 2 + fy
        right = w / 2 - fx
        bottom = h / 2 - fy
        return jnp.stack([left, top, right, bottom, theta], -1)


class RotatedFCOSHead(nn.Module):
    num_classes: int = 15
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    gn_groups: int = 32

    @nn.compact
    def __call__(self, feats):
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
        cls_out = nn.Conv(self.num_classes, (3, 3), padding=1,
                          bias_init=nn.initializers.constant(
                              float(-np.log((1 - 0.01) / 0.01))),
                          name="fcos_cls")
        reg_out = nn.Conv(4, (3, 3), padding=1, name="fcos_reg")
        angle_out = nn.Conv(1, (3, 3), padding=1, name="fcos_angle")
        ctr_out = nn.Conv(1, (3, 3), padding=1, name="fcos_centerness")
        scales = [Scale(1.0, name=f"scale{i}")
                  for i in range(len(self.strides))]
        # reference DOTA config (rotated_fcos_r50_fpn_1x_dota_le90.py:36-41):
        # centerness_on_reg=True, scale_angle=True (one shared Scale)
        scale_angle = Scale(1.0, name="scale_angle")
        cls_scores, bbox_preds, angle_preds, centernesses = [], [], [], []
        for lvl, x in enumerate(feats):
            cf, rf = x, x
            for conv, gn in cls_convs:
                cf = nn.relu(gn(conv(cf)))
            for conv, gn in reg_convs:
                rf = nn.relu(gn(conv(rf)))
            cls_scores.append(cls_out(cf))
            bbox_preds.append(
                nn.relu(scales[lvl](reg_out(rf))) * self.strides[lvl])
            angle_preds.append(scale_angle(angle_out(rf)))
            centernesses.append(ctr_out(rf))
        return cls_scores, bbox_preds, angle_preds, centernesses


def fcos_loss(cls_scores, bbox_preds, angle_preds, centernesses,
              gt_obbs, gt_labels, gt_mask, num_classes: int,
              strides=(8, 16, 32, 64, 128), version="le90",
              center_sample_radius: float = 1.5):
    """FCOS assignment: a point is positive for a gt if it falls inside
    the gt's (rotated) center region and the max regression distance is
    within the level's range; min-area gt wins ties."""
    coder = DistanceAnglePointCoder(version)
    points_l, stride_vec = [], []
    for lvl, s in enumerate(cls_scores):
        h, w = s.shape[1:3]
        ys = (jnp.arange(h) + 0.5) * strides[lvl]
        xs = (jnp.arange(w) + 0.5) * strides[lvl]
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        points_l.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
        stride_vec.append(jnp.full((h * w,), strides[lvl], jnp.float32))
    points = jnp.concatenate(points_l)              # (P, 2)
    stride_vec = jnp.concatenate(stride_vec)
    ranges_lo = jnp.concatenate([
        jnp.full((p.shape[0],), REGRESS_RANGES[i][0], jnp.float32)
        for i, p in enumerate(points_l)])
    ranges_hi = jnp.concatenate([
        jnp.full((p.shape[0],), REGRESS_RANGES[i][1], jnp.float32)
        for i, p in enumerate(points_l)])

    nc = num_classes
    flat_cls = jnp.concatenate(
        [s.reshape(s.shape[0], -1, nc) for s in cls_scores], 1)
    flat_reg = jnp.concatenate(
        [p.reshape(p.shape[0], -1, 4) for p in bbox_preds], 1)
    flat_ang = jnp.concatenate(
        [a.reshape(a.shape[0], -1, 1) for a in angle_preds], 1)
    flat_ctr = jnp.concatenate(
        [c.reshape(c.shape[0], -1) for c in centernesses], 1)

    def single(cls_s, reg_s, ang_s, ctr_s, gts, labels, mask):
        g = gts.shape[0]
        # offsets in each gt's frame
        cx, cy, w, h, th = (gts[:, i] for i in range(5))
        cos_t, sin_t = jnp.cos(th), jnp.sin(th)
        dx = points[:, 0][:, None] - cx[None]
        dy = points[:, 1][:, None] - cy[None]
        fx = cos_t[None] * dx + sin_t[None] * dy     # (P, G)
        fy = -sin_t[None] * dx + cos_t[None] * dy
        left = w[None] / 2 + fx
        right = w[None] / 2 - fx
        top = h[None] / 2 + fy
        bottom = h[None] / 2 - fy
        inside = (left > 0) & (right > 0) & (top > 0) & (bottom > 0)
        # center sampling
        rad = center_sample_radius * stride_vec[:, None]
        in_center = (jnp.abs(fx) < rad) & (jnp.abs(fy) < rad)
        max_dist = jnp.maximum(jnp.maximum(left, right),
                               jnp.maximum(top, bottom))
        in_range = (max_dist >= ranges_lo[:, None]) & \
                   (max_dist <= ranges_hi[:, None])
        pos_matrix = inside & in_center & in_range & mask[None]
        areas = jnp.where(pos_matrix, (w * h)[None], INF)
        min_area = jnp.min(areas, axis=1)
        gt_idx = jnp.argmin(areas, axis=1)
        pos = min_area < INF
        cls_target = jnp.where(pos, labels[gt_idx], nc)

        l_cls = sigmoid_focal_loss(cls_s, cls_target,
                                   weight=jnp.ones_like(min_area),
                                   avg_factor=1.0)
        tgt = gts[gt_idx]
        dist_t = coder.encode(points, tgt)           # (P, 5)
        pred5 = jnp.concatenate([reg_s, ang_s], -1)
        pred_obb = coder.decode(points, pred5)
        # centerness target
        lr_min = jnp.minimum(dist_t[:, 0], dist_t[:, 2])
        lr_max = jnp.maximum(dist_t[:, 0], dist_t[:, 2])
        tb_min = jnp.minimum(dist_t[:, 1], dist_t[:, 3])
        tb_max = jnp.maximum(dist_t[:, 1], dist_t[:, 3])
        ctr_t = jnp.sqrt(jnp.clip(
            (lr_min / jnp.maximum(lr_max, 1e-6)) *
            (tb_min / jnp.maximum(tb_max, 1e-6)), 0, 1))
        # reference weights the IoU loss by the centerness target and
        # normalizes by the centerness sum (rotated_fcos_head.py:275-295
        # ``centerness_denorm``), NOT by num_pos
        ctr_w = jnp.where(pos, ctr_t, 0.0)
        l_box = rotated_iou_loss(pred_obb, tgt, weight=ctr_w,
                                 avg_factor=1.0)
        l_ctr = sigmoid_cross_entropy(
            ctr_s, ctr_t, weight=pos.astype(jnp.float32), avg_factor=1.0)
        return l_cls, l_box, l_ctr, jnp.sum(pos), jnp.sum(ctr_w)

    l_cls, l_box, l_ctr, n_pos, ctr_sum = jax.vmap(single)(
        flat_cls, flat_reg, flat_ang, flat_ctr, gt_obbs, gt_labels,
        gt_mask)
    total = jnp.maximum(jnp.sum(n_pos).astype(jnp.float32), 1.0)
    denorm = jnp.maximum(jax.lax.stop_gradient(jnp.sum(ctr_sum)), 1e-6)
    return {"loss_cls": jnp.sum(l_cls) / total,
            "loss_bbox": jnp.sum(l_box) / denorm,
            "loss_centerness": jnp.sum(l_ctr) / total}


class CSLRotatedFCOSHead(RotatedFCOSHead):
    """CSL-FCOS variant (``csl_rotated_fcos_head.py`` parity,
    separate_angle=True): the scalar angle regressor is replaced by a
    circular-smooth-label classifier conv; the box loss decouples into a
    horizontal IoU loss on the (l, t, r, b) distances plus a BCE on the
    CSL bins — decode takes the argmax bin."""

    omega: int = 1
    angle_version: str = "le90"

    @nn.compact
    def __call__(self, feats):
        from ...core.bbox.angle_coder import CSLCoder
        coding_len = CSLCoder(self.angle_version,
                              omega=self.omega).coding_len
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
        cls_out = nn.Conv(self.num_classes, (3, 3), padding=1,
                          bias_init=nn.initializers.constant(
                              float(-np.log((1 - 0.01) / 0.01))),
                          name="fcos_cls")
        reg_out = nn.Conv(4, (3, 3), padding=1, name="fcos_reg")
        angle_out = nn.Conv(coding_len, (3, 3), padding=1,
                            name="fcos_angle_cls")
        ctr_out = nn.Conv(1, (3, 3), padding=1, name="fcos_centerness")
        scales = [Scale(1.0, name=f"scale{i}")
                  for i in range(len(self.strides))]
        cls_scores, bbox_preds, angle_clses, centernesses = [], [], [], []
        for lvl, x in enumerate(feats):
            cf, rf = x, x
            for conv, gn in cls_convs:
                cf = nn.relu(gn(conv(cf)))
            for conv, gn in reg_convs:
                rf = nn.relu(gn(conv(rf)))
            cls_scores.append(cls_out(cf))
            bbox_preds.append(
                nn.relu(scales[lvl](reg_out(rf))) * self.strides[lvl])
            # CSL config: scale_angle=False, centerness_on_reg=True
            # (rotated_fcos_csl_gaussian_r50_fpn_1x_dota_le90.py:11-13)
            angle_clses.append(angle_out(rf))
            centernesses.append(ctr_out(rf))
        return cls_scores, bbox_preds, angle_clses, centernesses


def csl_fcos_loss(cls_scores, bbox_preds, angle_clses, centernesses,
                  gt_obbs, gt_labels, gt_mask, num_classes: int,
                  strides=(8, 16, 32, 64, 128), version="le90",
                  omega: int = 1, center_sample_radius: float = 1.5):
    """CSL-FCOS loss (``csl_rotated_fcos_head.py`` separate_angle path):
    FCOS center-sampling assignment; horizontal IoU loss on the decoded
    (l, t, r, b) distances; CSL BCE on the angle bins."""
    from ...core.bbox.angle_coder import CSLCoder
    from .rotated_retina_head import csl_angle_loss
    from ...ops.nms import bbox_overlaps

    acoder = CSLCoder(version, omega=omega)
    coder = DistanceAnglePointCoder(version)
    points_l, stride_vec = [], []
    for lvl, s in enumerate(cls_scores):
        h, w = s.shape[1:3]
        ys = (jnp.arange(h) + 0.5) * strides[lvl]
        xs = (jnp.arange(w) + 0.5) * strides[lvl]
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        points_l.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
        stride_vec.append(jnp.full((h * w,), strides[lvl], jnp.float32))
    points = jnp.concatenate(points_l)
    stride_vec = jnp.concatenate(stride_vec)
    ranges_lo = jnp.concatenate([
        jnp.full((p.shape[0],), REGRESS_RANGES[i][0], jnp.float32)
        for i, p in enumerate(points_l)])
    ranges_hi = jnp.concatenate([
        jnp.full((p.shape[0],), REGRESS_RANGES[i][1], jnp.float32)
        for i, p in enumerate(points_l)])

    nc = num_classes
    cl = acoder.coding_len
    flat_cls = jnp.concatenate(
        [s.reshape(s.shape[0], -1, nc) for s in cls_scores], 1)
    flat_reg = jnp.concatenate(
        [p.reshape(p.shape[0], -1, 4) for p in bbox_preds], 1)
    flat_ang = jnp.concatenate(
        [a.reshape(a.shape[0], -1, cl) for a in angle_clses], 1)
    flat_ctr = jnp.concatenate(
        [c.reshape(c.shape[0], -1) for c in centernesses], 1)

    def single(cls_s, reg_s, ang_s, ctr_s, gts, labels, mask):
        cx, cy, w, h, th = (gts[:, i] for i in range(5))
        cos_t, sin_t = jnp.cos(th), jnp.sin(th)
        dx = points[:, 0][:, None] - cx[None]
        dy = points[:, 1][:, None] - cy[None]
        fx = cos_t[None] * dx + sin_t[None] * dy
        fy = -sin_t[None] * dx + cos_t[None] * dy
        left = w[None] / 2 + fx
        right = w[None] / 2 - fx
        top = h[None] / 2 + fy
        bottom = h[None] / 2 - fy
        inside = (left > 0) & (right > 0) & (top > 0) & (bottom > 0)
        rad = center_sample_radius * stride_vec[:, None]
        in_center = (jnp.abs(fx) < rad) & (jnp.abs(fy) < rad)
        max_dist = jnp.maximum(jnp.maximum(left, right),
                               jnp.maximum(top, bottom))
        in_range = (max_dist >= ranges_lo[:, None]) & \
                   (max_dist <= ranges_hi[:, None])
        pos_matrix = inside & in_center & in_range & mask[None]
        areas = jnp.where(pos_matrix, (w * h)[None], INF)
        min_area = jnp.min(areas, axis=1)
        gt_idx = jnp.argmin(areas, axis=1)
        pos = min_area < INF
        posf = pos.astype(jnp.float32)
        cls_target = jnp.where(pos, labels[gt_idx], nc)

        l_cls = sigmoid_focal_loss(cls_s, cls_target,
                                   weight=jnp.ones_like(min_area),
                                   avg_factor=1.0)
        tgt = gts[gt_idx]
        dist_t = coder.encode(points, tgt)
        lr_min = jnp.minimum(dist_t[:, 0], dist_t[:, 2])
        lr_max = jnp.maximum(dist_t[:, 0], dist_t[:, 2])
        tb_min = jnp.minimum(dist_t[:, 1], dist_t[:, 3])
        tb_max = jnp.maximum(dist_t[:, 1], dist_t[:, 3])
        ctr_t = jnp.sqrt(jnp.clip(
            (lr_min / jnp.maximum(lr_max, 1e-6)) *
            (tb_min / jnp.maximum(tb_max, 1e-6)), 0, 1))
        ctr_w = jnp.where(pos, ctr_t, 0.0)
        # horizontal IoU on (l, t, r, b) boxes around each point;
        # centerness-weighted with centerness_denorm, like the non-sep
        # path (csl_rotated_fcos_head.py:145-167)
        def to_hbb(d):
            return jnp.stack([points[:, 0] - d[:, 0],
                              points[:, 1] - d[:, 1],
                              points[:, 0] + d[:, 2],
                              points[:, 1] + d[:, 3]], -1)
        iou = bbox_overlaps(to_hbb(reg_s), to_hbb(dist_t[:, :4]),
                            aligned=True)
        l_box = jnp.sum(-jnp.log(jnp.clip(iou, 1e-6, 1.0)) * ctr_w)
        l_ang = csl_angle_loss(ang_s, tgt[:, 4], posf, acoder,
                               avg_factor=1.0)
        l_ctr = sigmoid_cross_entropy(
            ctr_s, ctr_t, weight=posf, avg_factor=1.0)
        return l_cls, l_box, l_ang, l_ctr, jnp.sum(pos), jnp.sum(ctr_w)

    l_cls, l_box, l_ang, l_ctr, n_pos, ctr_sum = jax.vmap(single)(
        flat_cls, flat_reg, flat_ang, flat_ctr, gt_obbs, gt_labels,
        gt_mask)
    total = jnp.maximum(jnp.sum(n_pos).astype(jnp.float32), 1.0)
    denorm = jnp.maximum(jax.lax.stop_gradient(jnp.sum(ctr_sum)), 1e-6)
    return {"loss_cls": jnp.sum(l_cls) / total,
            "loss_bbox": jnp.sum(l_box) / denorm,
            "loss_angle": jnp.sum(l_ang) / total,
            "loss_centerness": jnp.sum(l_ctr) / total}
