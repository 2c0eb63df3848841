"""GFL head (Generalized Focal Loss), TPU-native.

Capability parity with mmdet's ``GFLHead`` as configured by
``configs/SM3Det/SM3Det_convnext_t.py:28-47`` (sar branch): 4 stacked
GN+ReLU convs per tower, single anchor per cell (ratio 1.0, octave scale 8),
``reg_max=16`` discrete distance distribution with Integral projection,
QFL (beta=2) + DFL (w=0.25) + GIoU (w=2) losses, ATSS assignment (topk=9).

Static-shape re-design: ground truths arrive padded ``(G, 4)`` + mask;
assignment/sampling/losses are fully masked; test-time decoding keeps
top-``nms_pre`` per level and runs the static multiclass NMS.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.anchor import AnchorGenerator
from ...core.bbox.assigners import atss_assign
from ...core.bbox.coders import DistancePointBBoxCoder
from ...ops.nms import _topk_scores, bbox_overlaps, multiclass_nms
from ..layers import Scale
from ..losses import distribution_focal_loss, giou_loss, quality_focal_loss


class GFLHead(nn.Module):
    num_classes: int = 26
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    reg_max: int = 16
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    gn_groups: int = 32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        """feats: list of (B, H, W, C) -> (cls_scores, bbox_preds) lists.

        cls_scores[l]: (B, H, W, num_classes); bbox_preds[l]:
        (B, H, W, 4*(reg_max+1)).
        """
        cls_convs = [
            (nn.Conv(self.feat_channels, (3, 3), padding=1,
                     use_bias=False, name=f"cls_conv{i}"),
             nn.GroupNorm(num_groups=self.gn_groups, name=f"cls_gn{i}"))
            for i in range(self.stacked_convs)]
        reg_convs = [
            (nn.Conv(self.feat_channels, (3, 3), padding=1,
                     use_bias=False, name=f"reg_conv{i}"),
             nn.GroupNorm(num_groups=self.gn_groups, name=f"reg_gn{i}"))
            for i in range(self.stacked_convs)]
        gfl_cls = nn.Conv(
            self.num_classes, (3, 3), padding=1,
            bias_init=nn.initializers.constant(
                float(-np.log((1 - 0.01) / 0.01))),
            name="gfl_cls")
        gfl_reg = nn.Conv(4 * (self.reg_max + 1), (3, 3), padding=1,
                          name="gfl_reg")
        scales = [Scale(1.0, name=f"scale{i}")
                  for i in range(len(self.strides))]

        cls_scores, bbox_preds = [], []
        for lvl, x in enumerate(feats):
            cls_feat, reg_feat = x, x
            for conv, gn in cls_convs:
                cls_feat = nn.relu(gn(conv(cls_feat)))
            for conv, gn in reg_convs:
                reg_feat = nn.relu(gn(conv(reg_feat)))
            cls_scores.append(gfl_cls(cls_feat))
            bbox_preds.append(scales[lvl](gfl_reg(reg_feat)))
        return cls_scores, bbox_preds


def integral(reg_logits, reg_max: int):
    """Distribution -> scalar distances (mmdet ``Integral``)."""
    p = jax.nn.softmax(
        reg_logits.reshape(reg_logits.shape[:-1] + (4, reg_max + 1)),
        axis=-1)
    proj = jnp.arange(reg_max + 1, dtype=p.dtype)
    return jnp.sum(p * proj, axis=-1)            # (..., 4)


def _flatten_level(x, channels):
    b = x.shape[0]
    return x.reshape(b, -1, channels)


def gfl_loss(cls_scores, bbox_preds, gt_bboxes, gt_labels, gt_mask,
             anchor_generator: AnchorGenerator, num_classes: int,
             reg_max: int = 16, strides: Sequence[int] = (8, 16, 32, 64, 128),
             atss_topk: int = 9, loss_weights=(1.0, 2.0, 0.25),
             norm_ctx=None):
    """GFL training loss over a batch.

    Args:
        cls_scores/bbox_preds: per-level (B, H, W, C) head outputs.
        gt_bboxes: (B, G, 4) xyxy padded.
        gt_labels: (B, G) int.
        gt_mask: (B, G) bool.
        norm_ctx: optional callable summing a scalar across data-parallel
            replicas (psum) for the cross-device avg factors.

    Returns:
        dict(loss_cls, loss_bbox, loss_dfl).
    """
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    anchors_l = anchor_generator.grid_anchors(featmap_sizes)  # per level
    num_level = [a.shape[0] for a in anchors_l]
    anchors = jnp.concatenate(anchors_l, axis=0)              # (A, 4)
    centers = jnp.stack([
        (anchors[:, 0] + anchors[:, 2]) / 2,
        (anchors[:, 1] + anchors[:, 3]) / 2], axis=-1)        # (A, 2)
    stride_per_anchor = jnp.concatenate([
        jnp.full((n,), s, jnp.float32)
        for n, s in zip(num_level, strides)])

    flat_cls = jnp.concatenate(
        [_flatten_level(s, num_classes) for s in cls_scores], axis=1)
    flat_reg = jnp.concatenate(
        [_flatten_level(p, 4 * (reg_max + 1)) for p in bbox_preds], axis=1)

    def single_image(cls_s, reg_s, gts, labels, mask):
        ious = bbox_overlaps(anchors, gts)                    # (A, G)
        assigned, _ = atss_assign(
            ious, centers, gts, mask, num_level, topk=atss_topk)
        pos = assigned > 0
        gt_idx = jnp.clip(assigned - 1, 0)
        anchor_labels = jnp.where(pos, labels[gt_idx], num_classes)
        target_boxes = gts[gt_idx]                            # (A, 4)

        dist = integral(reg_s, reg_max)                       # (A, 4)
        centers_s = centers / stride_per_anchor[:, None]
        decoded = DistancePointBBoxCoder().decode(centers_s, dist)
        target_s = target_boxes / stride_per_anchor[:, None]

        # quality score = IoU(pred, target) at positives
        q = bbox_overlaps(
            jax.lax.stop_gradient(decoded), target_s, aligned=True)
        q = jnp.where(pos, q, 0.0)

        # weight = max sigmoid cls prob at positives
        w = jnp.max(jax.nn.sigmoid(
            jax.lax.stop_gradient(cls_s)), axis=-1)
        w = jnp.where(pos, w, 0.0)

        # losses (unreduced sums)
        l_cls = quality_focal_loss(
            cls_s, anchor_labels, q, beta=2.0,
            weight=jnp.ones_like(w), avg_factor=1.0)
        l_box = giou_loss(decoded, target_s, weight=w, avg_factor=1.0)
        corner_targets = DistancePointBBoxCoder().encode(
            centers_s, target_s, max_dis=reg_max, eps=0.1)    # (A, 4)
        l_dfl = distribution_focal_loss(
            reg_s.reshape(-1, reg_max + 1),
            corner_targets.reshape(-1),
            weight=jnp.repeat(w, 4) / 4.0, avg_factor=1.0)
        return l_cls, l_box, l_dfl, jnp.sum(pos), jnp.sum(w)

    l_cls, l_box, l_dfl, n_pos, w_sum = jax.vmap(single_image)(
        flat_cls, flat_reg, gt_bboxes, gt_labels, gt_mask)
    total_pos = jnp.sum(n_pos).astype(jnp.float32)
    total_w = jnp.sum(w_sum)
    if norm_ctx is not None:
        total_pos = norm_ctx(total_pos)
        total_w = norm_ctx(total_w)
    total_pos = jnp.maximum(total_pos, 1.0)
    total_w = jnp.maximum(total_w, 1e-4)
    return {
        "loss_cls": loss_weights[0] * jnp.sum(l_cls) / total_pos,
        "loss_bbox": loss_weights[1] * jnp.sum(l_box) / total_w,
        "loss_dfl": loss_weights[2] * jnp.sum(l_dfl) / total_w,
    }


def gfl_get_bboxes(cls_scores, bbox_preds,
                   anchor_generator: AnchorGenerator, num_classes: int,
                   img_shape, reg_max: int = 16,
                   strides: Sequence[int] = (8, 16, 32, 64, 128),
                   nms_pre: int = 1000, score_thr: float = 0.05,
                   iou_thr: float = 0.6, max_per_img: int = 100):
    """Static test-time decode + NMS (mmdet GFLHead.get_bboxes semantics).

    Returns per-image (dets (max_per_img, 5) xyxy+score, labels, valid).
    """
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    anchors_l = anchor_generator.grid_anchors(featmap_sizes)

    def single_image(cls_list, reg_list):
        cand_boxes, cand_scores = [], []
        for lvl, (cls_s, reg_s) in enumerate(zip(cls_list, reg_list)):
            a = anchors_l[lvl]
            scores = jax.nn.sigmoid(
                cls_s.reshape(-1, num_classes))               # (A, C)
            dist = integral(
                reg_s.reshape(-1, 4 * (reg_max + 1)), reg_max) \
                * strides[lvl]
            centers = jnp.stack([
                (a[:, 0] + a[:, 2]) / 2, (a[:, 1] + a[:, 3]) / 2], -1)
            boxes = DistancePointBBoxCoder().decode(
                centers, dist, max_shape=img_shape)           # (A, 4)
            k = min(nms_pre, scores.shape[0])
            top_vals, top_idx = _topk_scores(jnp.max(scores, -1), k)
            cand_boxes.append(boxes[top_idx])
            cand_scores.append(scores[top_idx])
        boxes = jnp.concatenate(cand_boxes, 0)
        scores = jnp.concatenate(cand_scores, 0)
        pad = jnp.zeros((scores.shape[0], 1), scores.dtype)   # bg column
        return multiclass_nms(
            boxes, jnp.concatenate([scores, pad], -1),
            score_thr=score_thr, iou_thr=iou_thr, max_num=max_per_img)

    b = cls_scores[0].shape[0]
    per_level_cls = [s.reshape(b, -1, num_classes) for s in cls_scores]
    per_level_reg = [p.reshape(b, -1, 4 * (reg_max + 1)) for p in bbox_preds]
    return jax.vmap(single_image)(per_level_cls, per_level_reg)
