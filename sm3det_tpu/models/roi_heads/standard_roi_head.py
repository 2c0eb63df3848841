"""Horizontal Standard RoI head (Faster R-CNN branch for H2 TriSource
variants). RoIAlign = the rotated op at theta=0 (identical bilinear
semantics, one code path). mmdet ``StandardRoIHead``/``Shared2FCBBoxHead``
behavior contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.bbox.assigners import max_iou_assign
from ...core.bbox.coders import DeltaXYWHBBoxCoder
from ...core.bbox.samplers import random_sample
from ...ops.nms import bbox_overlaps, multiclass_nms
from ...ops.roi_align_rotated import roi_align_rotated
from ..losses import smooth_l1_loss, softmax_cross_entropy


class Shared2FCBBoxHead(nn.Module):
    num_classes: int = 26
    fc_out_channels: int = 1024
    reg_class_agnostic: bool = False

    @nn.compact
    def __call__(self, roi_feats):
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_out_channels, name="shared_fc0")(x))
        x = nn.relu(nn.Dense(self.fc_out_channels, name="shared_fc1")(x))
        cls = nn.Dense(self.num_classes + 1, name="fc_cls")(x)
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        reg = nn.Dense(reg_dim, name="fc_reg")(x)
        return cls, reg


def hbb_to_roi5(hbbs):
    """xyxy -> (cx, cy, w, h, 0) so RoIAlignRotated serves as RoIAlign."""
    cx = (hbbs[..., 0] + hbbs[..., 2]) * 0.5
    cy = (hbbs[..., 1] + hbbs[..., 3]) * 0.5
    w = hbbs[..., 2] - hbbs[..., 0]
    h = hbbs[..., 3] - hbbs[..., 1]
    return jnp.stack([cx, cy, w, h, jnp.zeros_like(cx)], axis=-1)


def extract_hbb_roi_feats(feats, rois6_hbb, out_size=7, sample_num=2,
                          featmap_strides=(4, 8, 16, 32),
                          finest_scale=56):
    """rois6_hbb: (N, 5) = (batch_idx, x1, y1, x2, y2)."""
    from ...ops.roi_align_rotated import roi_align_rotated_pyramid
    roi5 = hbb_to_roi5(rois6_hbb[:, 1:5])
    rois6 = jnp.concatenate([rois6_hbb[:, :1], roi5], axis=-1)
    scale = jnp.sqrt(jnp.maximum(roi5[:, 2] * roi5[:, 3], 1e-6))
    lvls = jnp.clip(jnp.floor(jnp.log2(scale / finest_scale + 1e-6)),
                    0, len(featmap_strides) - 1).astype(jnp.int32)
    return roi_align_rotated_pyramid(
        list(feats), rois6, lvls, out_size,
        featmap_strides=featmap_strides, sample_num=sample_num)


def sample_hbb_rois(rng, proposals, proposal_valid, gt_bboxes, gt_labels,
                    gt_mask, num=512, pos_fraction=0.25,
                    pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5):
    props = jnp.concatenate([gt_bboxes, proposals], axis=0)
    prop_valid = jnp.concatenate([gt_mask, proposal_valid], axis=0)
    ious = bbox_overlaps(props, gt_bboxes)
    ious = jnp.where(prop_valid[:, None] & gt_mask[None, :], ious, -1.0)
    assigned = max_iou_assign(
        ious, gt_mask, pos_iou_thr=pos_iou_thr, neg_iou_thr=neg_iou_thr,
        min_pos_iou=min_pos_iou, match_low_quality=False)
    assigned = jnp.where(prop_valid, assigned, -1)
    sample = random_sample(rng, assigned, num, pos_fraction)
    inds = sample["inds"]
    return {"rois": props[inds], "pos_mask": sample["pos_mask"],
            "neg_mask": sample["neg_mask"],
            "gt_idx": jnp.clip(assigned[inds] - 1, 0)}


def hbb_head_loss(cls_logits, reg_pred, sampled, gt_bboxes, gt_labels,
                  coder: DeltaXYWHBBoxCoder, num_classes: int):
    pos, neg = sampled["pos_mask"], sampled["neg_mask"]
    valid = pos | neg
    gt_idx = sampled["gt_idx"]
    labels = jnp.where(pos, gt_labels[gt_idx], num_classes)
    l_cls = softmax_cross_entropy(
        cls_logits, labels, weight=valid.astype(jnp.float32),
        avg_factor=1.0)
    targets = coder.encode(sampled["rois"], gt_bboxes[gt_idx])
    if reg_pred.shape[-1] > 4:
        reg_pred = reg_pred.reshape(reg_pred.shape[0], num_classes, 4)
        reg_pred = jnp.take_along_axis(
            reg_pred, jnp.clip(labels, 0, num_classes - 1)[:, None, None]
            .repeat(4, -1), axis=1)[:, 0]
    l_reg = smooth_l1_loss(
        reg_pred, targets, beta=1.0,
        weight=pos[:, None].astype(jnp.float32), avg_factor=1.0)
    return l_cls, l_reg, jnp.sum(valid), jnp.sum(pos)


def hbb_head_get_bboxes(cls_logits, reg_pred, rois, roi_valid,
                        coder: DeltaXYWHBBoxCoder, num_classes: int,
                        img_shape=None, score_thr=0.05, iou_thr=0.5,
                        max_per_img=100, pre_nms=1000):
    scores = jax.nn.softmax(cls_logits, axis=-1)
    scores = jnp.where(roi_valid[:, None], scores, 0.0)
    if reg_pred.shape[-1] > 4:
        boxes = jax.vmap(
            lambda r, d: coder.decode(
                r[None].repeat(num_classes, 0),
                d.reshape(num_classes, 4), max_shape=img_shape)
        )(rois, reg_pred)                          # (N, C, 4)
        boxes = boxes.reshape(rois.shape[0], -1)
    else:
        boxes = coder.decode(rois, reg_pred, max_shape=img_shape)
    return multiclass_nms(boxes, scores, score_thr=score_thr,
                          iou_thr=iou_thr, max_num=max_per_img,
                          pre_nms=pre_nms)
