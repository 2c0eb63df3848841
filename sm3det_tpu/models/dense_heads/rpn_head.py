"""Horizontal RPN head (mmdet ``RPNHead`` parity) for the H2 TriSource
variants (``trisource_H2stage_*_detector.py`` — SAR gets a Faster R-CNN
branch). Same static-shape toolkit as the oriented RPN.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.bbox.assigners import max_iou_assign
from ...core.bbox.coders import DeltaXYWHBBoxCoder
from ...core.bbox.samplers import random_sample
from ...ops.nms import _topk_scores, bbox_overlaps, nms
from ..losses import sigmoid_cross_entropy, smooth_l1_loss


class RPNHead(nn.Module):
    in_channels: int = 256
    feat_channels: int = 256
    num_anchors: int = 3

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        conv = nn.Conv(self.feat_channels, (3, 3), padding=1,
                       name="rpn_conv")
        cls_conv = nn.Conv(self.num_anchors, (1, 1), name="rpn_cls")
        reg_conv = nn.Conv(self.num_anchors * 4, (1, 1), name="rpn_reg")
        cls_out, reg_out = [], []
        for x in feats:
            t = nn.relu(conv(x))
            cls_out.append(cls_conv(t))
            reg_out.append(reg_conv(t))
        return cls_out, reg_out


def hbb_rpn_loss(rng, cls_scores, bbox_preds, gt_bboxes, gt_mask,
                 anchor_generator, coder: DeltaXYWHBBoxCoder,
                 num_sample: int = 256, pos_fraction: float = 0.5,
                 pos_iou_thr: float = 0.7, neg_iou_thr: float = 0.3,
                 min_pos_iou: float = 0.3, norm_ctx=None):
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    anchors = jnp.concatenate(
        anchor_generator.grid_anchors(featmap_sizes), axis=0)

    flat_cls = jnp.concatenate(
        [s.reshape(s.shape[0], -1) for s in cls_scores], axis=1)
    flat_reg = jnp.concatenate(
        [p.reshape(p.shape[0], -1, 4) for p in bbox_preds], axis=1)

    def single_image(rng_i, cls_s, reg_s, gts, mask):
        ious = bbox_overlaps(anchors, gts)
        ious = jnp.where(mask[None, :], ious, -1.0)
        assigned = max_iou_assign(
            ious, mask, pos_iou_thr=pos_iou_thr, neg_iou_thr=neg_iou_thr,
            min_pos_iou=min_pos_iou, match_low_quality=True)
        sample = random_sample(rng_i, assigned, num_sample, pos_fraction)
        inds, pos_m, neg_m = (sample["inds"], sample["pos_mask"],
                              sample["neg_mask"])
        gt_idx = jnp.clip(assigned[inds] - 1, 0)
        targets = coder.encode(anchors[inds], gts[gt_idx])
        valid = pos_m | neg_m
        l_cls = sigmoid_cross_entropy(
            cls_s[inds], pos_m.astype(jnp.float32),
            weight=valid.astype(jnp.float32), avg_factor=1.0)
        l_reg = smooth_l1_loss(
            reg_s[inds], targets, beta=1.0 / 9.0,
            weight=pos_m[:, None].astype(jnp.float32), avg_factor=1.0)
        return l_cls, l_reg, jnp.sum(valid)

    rngs = jax.random.split(rng, flat_cls.shape[0])
    l_cls, l_reg, n_valid = jax.vmap(single_image)(
        rngs, flat_cls, flat_reg, gt_bboxes, gt_mask)
    total = jnp.sum(n_valid).astype(jnp.float32)
    if norm_ctx is not None:
        total = norm_ctx(total)
    total = jnp.maximum(total, 1.0)
    return {"loss_rpn_cls": jnp.sum(l_cls) / total,
            "loss_rpn_bbox": jnp.sum(l_reg) / total}


def hbb_rpn_get_proposals(cls_scores, bbox_preds, anchor_generator,
                          coder: DeltaXYWHBBoxCoder, img_shape,
                          nms_pre: int = 2000, max_per_img: int = 2000,
                          iou_thr: float = 0.7):
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    anchors_l = anchor_generator.grid_anchors(featmap_sizes)

    def single_image(cls_list, reg_list):
        boxes_all, scores_all, level_all = [], [], []
        for lvl, (cls_s, reg_s) in enumerate(zip(cls_list, reg_list)):
            scores = jax.nn.sigmoid(cls_s.reshape(-1))
            deltas = reg_s.reshape(-1, 4)
            k = min(nms_pre, scores.shape[0])
            top_vals, top_idx = _topk_scores(scores, k)
            boxes = coder.decode(anchors_l[lvl][top_idx],
                                 deltas[top_idx], max_shape=img_shape)
            boxes_all.append(boxes)
            scores_all.append(top_vals)
            level_all.append(jnp.full((k,), lvl, jnp.int32))
        boxes = jnp.concatenate(boxes_all, 0)
        scores = jnp.concatenate(scores_all, 0)
        levels = jnp.concatenate(level_all, 0)
        max_coord = jnp.max(jnp.abs(boxes)) + 1.0
        shifted = boxes + \
            (levels.astype(boxes.dtype) * 2 * max_coord)[:, None]
        _, idx, valid = nms(shifted, scores, iou_thr, max_out=max_per_img)
        safe = jnp.where(idx >= 0, idx, 0)
        out_boxes = jnp.where(valid[:, None], boxes[safe], 0.0)
        out_scores = jnp.where(valid, scores[safe], 0.0)
        return out_boxes, out_scores, valid

    b = cls_scores[0].shape[0]
    cls_list = [s.reshape(b, -1) for s in cls_scores]
    reg_list = [p.reshape(b, -1, 4) for p in bbox_preds]
    return jax.vmap(single_image)(cls_list, reg_list)
