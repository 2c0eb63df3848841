"""Rotated RetinaNet head (+ anchor-based rotated dense-head toolkit).

Parity targets: ``mmrotate/models/dense_heads/rotated_retina_head.py:11``
and its base ``rotated_anchor_head.py:19`` — rotated anchors
``(cx, cy, w, h, 0)``, 4 stacked convs per tower, A=9 anchors/cell
(3 scales x 3 ratios), focal-loss classification, L1 on
``DeltaXYWHAOBBoxCoder`` deltas, MaxIoU assignment on rotated IoU.

Static-shape re-design as elsewhere: padded gts + masks; fixed test-time
top-k + static multiclass rotated NMS.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
import numpy as np

from ...core.anchor import RotatedAnchorGenerator
from ...core.bbox.assigners import max_iou_assign
from ...core.bbox.coders import DeltaXYWHAOBBoxCoder
from ...ops.nms import _topk_scores, multiclass_nms_rotated
from ...ops.rotated_iou import box_iou_rotated_chunked
from ..losses import sigmoid_focal_loss, smooth_l1_loss


class RotatedRetinaHead(nn.Module):
    num_classes: int = 15
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    num_anchors: int = 9

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        cls_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        cls_out = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                          padding=1,
                          bias_init=nn.initializers.constant(
                              float(-np.log((1 - 0.01) / 0.01))),
                          name="retina_cls")
        reg_out = nn.Conv(self.num_anchors * 5, (3, 3), padding=1,
                          name="retina_reg")
        cls_scores, bbox_preds = [], []
        for x in feats:
            cf, rf = x, x
            for conv in cls_convs:
                cf = nn.relu(conv(cf))
            for conv in reg_convs:
                rf = nn.relu(conv(rf))
            cls_scores.append(cls_out(cf))
            bbox_preds.append(reg_out(rf))
        return cls_scores, bbox_preds


class CSLRetinaHead(nn.Module):
    """CSL variant (``csl_rotated_retina_head.py`` parity): the reg branch
    predicts 4 box params; the angle is CLASSIFIED into circular-smooth-
    label bins (separate conv) — decode takes the argmax bin."""

    num_classes: int = 15
    feat_channels: int = 256
    stacked_convs: int = 4
    num_anchors: int = 9
    omega: int = 1
    angle_version: str = "le90"

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        from ...core.bbox.angle_coder import CSLCoder
        coding_len = CSLCoder(self.angle_version,
                              omega=self.omega).coding_len
        cls_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        cls_out = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                          padding=1,
                          bias_init=nn.initializers.constant(
                              float(-np.log((1 - 0.01) / 0.01))),
                          name="retina_cls")
        reg_out = nn.Conv(self.num_anchors * 4, (3, 3), padding=1,
                          name="retina_reg")
        angle_out = nn.Conv(self.num_anchors * coding_len, (3, 3),
                            padding=1, name="retina_angle_cls")
        cls_scores, bbox_preds, angle_clses = [], [], []
        for x in feats:
            cf, rf = x, x
            for conv in cls_convs:
                cf = nn.relu(conv(cf))
            for conv in reg_convs:
                rf = nn.relu(conv(rf))
            cls_scores.append(cls_out(cf))
            bbox_preds.append(reg_out(rf))
            angle_clses.append(angle_out(rf))
        return cls_scores, bbox_preds, angle_clses


def csl_angle_loss(angle_cls, angle_targets, pos_weight, coder,
                   avg_factor=1.0, gamma=2.0, alpha=0.25):
    """Smooth focal loss between CSL logits and the circular smooth
    labels (``csl_rotated_retina_head.py:165``: SmoothFocalLoss on the
    coder-encoded soft targets, weight = (N, 1) positive mask, reduced as
    sum-over-all-elements / avg_factor)."""
    from ..losses import smooth_focal_loss
    smooth = coder.encode(angle_targets)
    return smooth_focal_loss(
        angle_cls, smooth, gamma=gamma, alpha=alpha,
        weight=pos_weight[..., None], avg_factor=avg_factor)


def make_retina_anchor_generator(strides=(8, 16, 32, 64, 128)):
    """octave_base_scale=4, scales_per_octave=3, ratios [.5,1,2]
    (mmrotate rotated_retinanet config defaults)."""
    return RotatedAnchorGenerator(
        strides=strides, ratios=[0.5, 1.0, 2.0],
        octave_base_scale=4, scales_per_octave=3)


def make_retina_coder(version="le90"):
    """Retina-family delta coder: target_stds ALL 1.0
    (``rotated_retinanet_obb_r50_fpn_1x_dota_le90.py:40-47``) — unlike
    the RCNN coder's (0.1, 0.1, 0.2, 0.2, 0.1)."""
    return DeltaXYWHAOBBoxCoder(
        angle_range=version, target_means=(0.,) * 5,
        target_stds=(1., 1., 1., 1., 1.), edge_swap=True, proj_xy=True)


def retina_loss(cls_scores, bbox_preds, gt_obbs, gt_labels, gt_mask,
                anchor_generator, coder: DeltaXYWHAOBBoxCoder,
                num_classes: int, pos_iou_thr=0.5, neg_iou_thr=0.4,
                min_pos_iou=0.0, beta=0.11, norm_ctx=None,
                reg_loss: str = "smooth_l1"):
    """Focal + regression loss over all anchors (``rotated_anchor_head``).

    ``reg_loss`` selects the box loss family used across the zoo configs:
    'smooth_l1' (deltas), or decoded-box losses 'gwd' / 'kld'
    (``gaussian_dist_loss.py``), 'kfiou' (``kf_iou_loss.py``),
    'riou' (``rotated_iou_loss.py``).
    """
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    anchors = jnp.concatenate(
        anchor_generator.grid_anchors(featmap_sizes), axis=0)  # (A, 5)
    na = anchors.shape[0]

    flat_cls = jnp.concatenate(
        [s.reshape(s.shape[0], -1, num_classes) for s in cls_scores],
        axis=1)
    flat_reg = jnp.concatenate(
        [p.reshape(p.shape[0], -1, 5) for p in bbox_preds], axis=1)

    def single_image(cls_s, reg_s, gts, labels, mask):
        ious = box_iou_rotated_chunked(anchors, gts)
        ious = jnp.where(mask[None, :], ious, -1.0)
        assigned = max_iou_assign(
            ious, mask, pos_iou_thr=pos_iou_thr, neg_iou_thr=neg_iou_thr,
            min_pos_iou=min_pos_iou, match_low_quality=True)
        pos = assigned > 0
        neg = assigned == 0
        gt_idx = jnp.clip(assigned - 1, 0)
        cls_target = jnp.where(pos, labels[gt_idx], num_classes)
        l_cls = sigmoid_focal_loss(
            cls_s, cls_target,
            weight=(pos | neg).astype(jnp.float32), avg_factor=1.0)
        pos_w = pos.astype(jnp.float32)
        if reg_loss in ("smooth_l1", "l1"):
            # 'l1' = reference L1Loss (rotated_retinanet config :54);
            # 'smooth_l1' beta=0.11 = R3Det/S2ANet s1 (r3det config :53)
            targets = coder.encode(anchors, gts[gt_idx])
            if reg_loss == "l1":
                from ..losses import l1_loss
                l_reg = l1_loss(
                    reg_s, targets,
                    weight=pos[:, None].astype(jnp.float32),
                    avg_factor=1.0)
            else:
                l_reg = smooth_l1_loss(
                    reg_s, targets, beta=beta,
                    weight=pos[:, None].astype(jnp.float32),
                    avg_factor=1.0)
        else:
            from ..losses import gwd_loss, kfiou_loss, kld_loss, \
                rotated_iou_loss
            decoded = coder.decode(anchors, reg_s)
            target_obbs = gts[gt_idx]
            if reg_loss == "gwd":
                l_reg = gwd_loss(decoded, target_obbs, weight=pos_w,
                                 avg_factor=1.0)
            elif reg_loss == "kld":
                l_reg = kld_loss(decoded, target_obbs, weight=pos_w,
                                 avg_factor=1.0)
            elif reg_loss == "kfiou":
                targets = coder.encode(anchors, target_obbs)
                l_reg = kfiou_loss(reg_s, targets, decoded, target_obbs,
                                   weight=pos_w, avg_factor=1.0)
            elif reg_loss == "riou":
                l_reg = rotated_iou_loss(decoded, target_obbs,
                                         weight=pos_w, avg_factor=1.0)
            else:
                raise ValueError(reg_loss)
        return l_cls, l_reg, jnp.sum(pos)

    l_cls, l_reg, n_pos = jax.vmap(single_image)(
        flat_cls, flat_reg, gt_obbs, gt_labels, gt_mask)
    total = jnp.sum(n_pos).astype(jnp.float32)
    if norm_ctx is not None:
        total = norm_ctx(total)
    total = jnp.maximum(total, 1.0)
    return {"loss_cls": jnp.sum(l_cls) / total,
            "loss_bbox": jnp.sum(l_reg) / total}


def retina_get_bboxes(cls_scores, bbox_preds, anchor_generator,
                      coder: DeltaXYWHAOBBoxCoder, num_classes: int,
                      img_shape, nms_pre=2000, score_thr=0.05,
                      iou_thr=0.1, max_per_img=2000):
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    anchors_l = anchor_generator.grid_anchors(featmap_sizes)

    def single_image(cls_list, reg_list):
        cand_boxes, cand_scores = [], []
        for lvl, (cls_s, reg_s) in enumerate(zip(cls_list, reg_list)):
            scores = jax.nn.sigmoid(cls_s.reshape(-1, num_classes))
            deltas = reg_s.reshape(-1, 5)
            k = min(nms_pre, scores.shape[0])
            _, top_idx = _topk_scores(jnp.max(scores, -1), k)
            obbs = coder.decode(anchors_l[lvl][top_idx], deltas[top_idx])
            cand_boxes.append(obbs)
            cand_scores.append(scores[top_idx])
        boxes = jnp.concatenate(cand_boxes, 0)
        scores = jnp.concatenate(cand_scores, 0)
        pad = jnp.zeros((scores.shape[0], 1), scores.dtype)
        return multiclass_nms_rotated(
            boxes, jnp.concatenate([scores, pad], -1),
            score_thr=score_thr, iou_thr=iou_thr, max_num=max_per_img,
            pre_nms=min(2000, scores.shape[0]))

    b = cls_scores[0].shape[0]
    cls_list = [s.reshape(b, -1, num_classes) for s in cls_scores]
    reg_list = [p.reshape(b, -1, 5) for p in bbox_preds]
    return jax.vmap(single_image)(cls_list, reg_list)
