"""Rotated ATSS head.

Parity target: ``mmrotate/models/dense_heads/rotated_atss_head.py:11`` —
a RotatedRetinaHead tower (1 anchor/cell: octave_base_scale=4,
scales_per_octave=1, ratios=[1.0], per
``configs/rotated_atss/rotated_atss_obb_r50_fpn_1x_dota_le90.py``) whose
targets come from the ATSSObbAssigner
(``mmrotate/core/bbox/assigners/atss_obb_assigner.py:13``): per gt, the
top-k center-closest priors per pyramid level are candidates; the IoU
threshold is mean+std of candidate rotated IoUs; positives additionally
need their center inside the (rotated) gt.

Static-shape re-design: the candidate mask is a dense (P, G) bool; all
steps are masked tensor ops (no data-dependent gathers).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ...core.bbox.coders import DeltaXYWHAOBBoxCoder
from ...ops.rotated_iou import box_iou_rotated_chunked
from ..losses import sigmoid_focal_loss, smooth_l1_loss
from .rotated_retina_head import RotatedRetinaHead


class RotatedATSSHead(RotatedRetinaHead):
    """Same tower as RotatedRetinaHead; the reference subclass only
    overrides target assignment (``rotated_atss_head.py:22``)."""

    num_anchors: int = 1


def atss_obb_assign(ious, prior_centers, gt_obbs, gt_mask,
                    num_level_priors, topk: int = 9):
    """ATSSObbAssigner on rotated IoUs.

    Args:
        ious: (P, G) rotated IoU priors x padded gts.
        prior_centers: (P, 2) anchor centers.
        gt_obbs: (G, 5) padded gt OBBs.
        gt_mask: (G,) validity.
        num_level_priors: python list, priors per level.
        topk: candidates per level per gt.

    Returns:
        assigned_gt_inds (P,) in {0 neg, 1..G pos}.
    """
    num_priors, num_gt = ious.shape
    gt_pts = gt_obbs[:, :2]                                      # (G, 2)
    distances = jnp.linalg.norm(
        prior_centers[:, None, :] - gt_pts[None, :, :], axis=-1)

    is_candidate = jnp.zeros((num_priors, num_gt), bool)
    start = 0
    for n in num_level_priors:
        level_dist = distances[start:start + n]                  # (n, G)
        k = min(topk, n)
        _, topk_idx = jax.lax.top_k(-level_dist.T, k)            # (G, k)
        level_mask = jnp.zeros((num_gt, n), bool).at[
            jnp.arange(num_gt)[:, None], topk_idx].set(True)
        is_candidate = is_candidate.at[start:start + n].set(level_mask.T)
        start += n

    cand_ious = jnp.where(is_candidate, ious, jnp.nan)
    mean_iou = jnp.nanmean(cand_ious, axis=0)
    std_iou = jnp.sqrt(jnp.nanmean(
        (cand_ious - mean_iou[None, :]) ** 2, axis=0))
    iou_thr = mean_iou + std_iou
    is_pos = is_candidate & (ious >= iou_thr[None, :])

    # center of prior inside the ROTATED gt (atss_obb_assigner.py step 6)
    cx, cy, w, h, th = (gt_obbs[:, i] for i in range(5))
    dx = prior_centers[:, 0][:, None] - cx[None]
    dy = prior_centers[:, 1][:, None] - cy[None]
    cos_t, sin_t = jnp.cos(th), jnp.sin(th)
    fx = cos_t[None] * dx + sin_t[None] * dy
    fy = -sin_t[None] * dx + cos_t[None] * dy
    inside = (jnp.abs(fx) < w[None] / 2 + 0.01) & \
             (jnp.abs(fy) < h[None] / 2 + 0.01)
    is_pos = is_pos & inside & gt_mask[None, :]

    # each prior takes the max-IoU gt among its positive assignments
    pos_ious = jnp.where(is_pos, ious, -jnp.inf)
    best_gt = jnp.argmax(pos_ious, axis=1)
    has_pos = jnp.any(is_pos, axis=1)
    return jnp.where(has_pos, best_gt + 1, 0)


def atss_loss(cls_scores, bbox_preds, gt_obbs, gt_labels, gt_mask,
              anchor_generator, coder: DeltaXYWHAOBBoxCoder,
              num_classes: int, topk: int = 9, beta: float = 0.11,
              norm_ctx=None):
    """RotatedRetinaHead loss driven by ATSS-OBB assignment."""
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    anchors_l = anchor_generator.grid_anchors(featmap_sizes)
    num_level = [a.shape[0] for a in anchors_l]
    anchors = jnp.concatenate(anchors_l, axis=0)                 # (A, 5)
    centers = anchors[:, :2]

    flat_cls = jnp.concatenate(
        [s.reshape(s.shape[0], -1, num_classes) for s in cls_scores], 1)
    flat_reg = jnp.concatenate(
        [p.reshape(p.shape[0], -1, 5) for p in bbox_preds], 1)

    def single(cls_s, reg_s, gts, labels, mask):
        ious = box_iou_rotated_chunked(anchors, gts)
        ious = jnp.where(mask[None, :], ious, -1.0)
        assigned = atss_obb_assign(ious, centers, gts, mask,
                                   num_level, topk=topk)
        pos = assigned > 0
        gt_idx = jnp.clip(assigned - 1, 0)
        cls_t = jnp.where(pos, labels[gt_idx], num_classes)
        l_cls = sigmoid_focal_loss(
            cls_s, cls_t, weight=jnp.ones(cls_s.shape[0]), avg_factor=1.0)
        targets = coder.encode(anchors, gts[gt_idx])
        l_reg = smooth_l1_loss(
            reg_s, targets, beta=beta,
            weight=pos[:, None].astype(jnp.float32), avg_factor=1.0)
        return l_cls, l_reg, jnp.sum(pos)

    l_cls, l_reg, n_pos = jax.vmap(single)(
        flat_cls, flat_reg, gt_obbs, gt_labels, gt_mask)
    total = jnp.sum(n_pos).astype(jnp.float32)
    if norm_ctx is not None:
        total = norm_ctx(total)
    total = jnp.maximum(total, 1.0)
    return {"loss_cls": jnp.sum(l_cls) / total,
            "loss_bbox": jnp.sum(l_reg) / total}
