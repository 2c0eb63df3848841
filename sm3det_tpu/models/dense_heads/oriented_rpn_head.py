"""Oriented RPN head (midpoint-offset regression), TPU-native.

Parity target: ``mmrotate/models/dense_heads/oriented_rpn_head.py:15`` —
HBB anchors (scales [8], ratios [.5, 1, 2], strides 4-64) regress 6-param
midpoint offsets toward gt OBBs; assignment and classification run on the
gts' enclosing HBBs (``:75`` uses ``obb2xyxy``); proposal NMS runs on the
decoded OBBs' enclosing HBBs at IoU 0.8.

Static-shape re-design: fixed 256-sample random pos/neg sampling (masked),
fixed ``nms_pre`` per level and ``max_per_img`` proposals with validity
masks.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.anchor import AnchorGenerator
from ...core.bbox.assigners import max_iou_assign
from ...core.bbox.coders import MidpointOffsetCoder
from ...core.bbox.samplers import random_sample
from ...ops.box_convert import obb2xyxy
from ...ops.nms import _topk_scores, bbox_overlaps, nms
from ..losses import sigmoid_cross_entropy, smooth_l1_loss


class OrientedRPNHead(nn.Module):
    in_channels: int = 256
    feat_channels: int = 256
    num_anchors: int = 3

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        conv = nn.Conv(self.feat_channels, (3, 3), padding=1,
                       name="rpn_conv")
        cls_conv = nn.Conv(self.num_anchors, (1, 1), name="rpn_cls")
        reg_conv = nn.Conv(self.num_anchors * 6, (1, 1), name="rpn_reg")
        cls_out, reg_out = [], []
        for x in feats:
            t = nn.relu(conv(x))
            cls_out.append(cls_conv(t))
            reg_out.append(reg_conv(t))
        return cls_out, reg_out


def rpn_loss(rng, cls_scores, bbox_preds, gt_obbs, gt_mask,
             anchor_generator: AnchorGenerator, coder: MidpointOffsetCoder,
             version: str = "le90", num_sample: int = 256,
             pos_fraction: float = 0.5, pos_iou_thr: float = 0.7,
             neg_iou_thr: float = 0.3, min_pos_iou: float = 0.3,
             beta: float = 1.0 / 9.0, norm_ctx=None):
    """Oriented RPN loss over a batch.

    Args:
        gt_obbs: (B, G, 5) padded gt OBBs; gt_mask (B, G).
    """
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    anchors = jnp.concatenate(
        anchor_generator.grid_anchors(featmap_sizes), axis=0)  # (A, 4)
    a_tot = anchors.shape[0]
    na = cls_scores[0].shape[-1]

    flat_cls = jnp.concatenate(
        [s.reshape(s.shape[0], -1) for s in cls_scores], axis=1)  # (B, A)
    flat_reg = jnp.concatenate(
        [p.reshape(p.shape[0], -1, 6) for p in bbox_preds], axis=1)

    def single_image(rng_i, cls_s, reg_s, gts, mask):
        gt_hbb = obb2xyxy(gts, version)
        ious = bbox_overlaps(anchors, gt_hbb)
        ious = jnp.where(mask[None, :], ious, -1.0)
        assigned = max_iou_assign(
            ious, mask, pos_iou_thr=pos_iou_thr, neg_iou_thr=neg_iou_thr,
            min_pos_iou=min_pos_iou, match_low_quality=True)
        sample = random_sample(rng_i, assigned, num_sample, pos_fraction)
        inds, pos_m, neg_m = (sample["inds"], sample["pos_mask"],
                              sample["neg_mask"])
        sel_anchor = anchors[inds]
        sel_assigned = assigned[inds]
        gt_idx = jnp.clip(sel_assigned - 1, 0)
        targets = coder.encode(sel_anchor, gts[gt_idx])        # (S, 6)
        preds = reg_s[inds]
        labels = pos_m.astype(jnp.float32)                     # 1=object
        valid = pos_m | neg_m
        l_cls = sigmoid_cross_entropy(
            cls_s[inds], labels,
            weight=valid.astype(jnp.float32), avg_factor=1.0)
        l_reg = smooth_l1_loss(
            preds, targets, beta=beta,
            weight=pos_m[:, None].astype(jnp.float32), avg_factor=1.0)
        return l_cls, l_reg, jnp.sum(valid)

    b = flat_cls.shape[0]
    rngs = jax.random.split(rng, b)
    l_cls, l_reg, n_valid = jax.vmap(single_image)(
        rngs, flat_cls, flat_reg, gt_obbs, gt_mask)
    total = jnp.sum(n_valid).astype(jnp.float32)
    if norm_ctx is not None:
        total = norm_ctx(total)
    total = jnp.maximum(total, 1.0)
    return {
        "loss_rpn_cls": jnp.sum(l_cls) / total,
        "loss_rpn_bbox": jnp.sum(l_reg) / total,
    }


def rpn_get_proposals(cls_scores, bbox_preds,
                      anchor_generator: AnchorGenerator,
                      coder: MidpointOffsetCoder, img_shape,
                      nms_pre: int = 2000, max_per_img: int = 2000,
                      iou_thr: float = 0.8):
    """Decode + per-level top-k + HBB NMS -> fixed-size OBB proposals.

    Returns (proposals (B, max_per_img, 5), scores, valid mask).
    """
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    anchors_l = anchor_generator.grid_anchors(featmap_sizes)

    def single_image(cls_list, reg_list):
        # mmdet's RPN nms is per-level (batched_nms over level ids):
        # boxes of different levels never suppress each other, so the
        # level-offset trick's (sum_l k_l)^2 suppression matrix is
        # block-diagonal. Levels are padded to a common K and the NMS is
        # vmapped over them — same per-level IoU work, but the
        # sequential greedy-keep scan (the dominant cost; exact top-k is
        # ~0.3 ms, tools/profiling/archive/profile_topk.py) runs ONCE batched instead of
        # once per level — then merged by score. Exactly equivalent to
        # the level-offset formulation (tests/test_rpn_proposals.py).
        boxes_lv, scores_lv = [], []
        kmax = max(min(nms_pre, c.reshape(-1).shape[0])
                   for c in cls_list)
        for lvl, (cls_s, reg_s) in enumerate(zip(cls_list, reg_list)):
            scores = jax.nn.sigmoid(cls_s.reshape(-1))
            deltas = reg_s.reshape(-1, 6)
            k = min(nms_pre, scores.shape[0])
            top_vals, top_idx = _topk_scores(scores, k)
            obbs = coder.decode(anchors_l[lvl][top_idx], deltas[top_idx])
            # NOTE: no image clipping — the reference's
            # MidpointOffsetCoder.decode accepts max_shape but never
            # applies it (delta_midpointoffset_rbbox_coder.py:57, arg
            # unused in delta2bbox), so proposals are unclipped there too.
            if k < kmax:    # -inf padding is ineligible inside nms
                top_vals = jnp.concatenate(
                    [top_vals, jnp.full((kmax - k,), -jnp.inf,
                                        top_vals.dtype)])
                obbs = jnp.concatenate(
                    [obbs, jnp.zeros((kmax - k, 5), obbs.dtype)])
            boxes_lv.append(obbs)
            scores_lv.append(top_vals)
        obbs_lv = jnp.stack(boxes_lv)                  # (L, K, 5)
        scores_lv = jnp.stack(scores_lv)               # (L, K)
        keep_n = min(max_per_img, kmax)
        _, idx, valid = jax.vmap(
            lambda b, s: nms(obb2xyxy(b), s, iou_thr, max_out=keep_n,
                             score_thr=-jnp.inf))(obbs_lv, scores_lv)
        safe = jnp.where(idx >= 0, idx, 0)
        obbs = jnp.where(
            valid[..., None],
            jnp.take_along_axis(obbs_lv, safe[..., None], axis=1),
            0.0).reshape(-1, 5)
        scores = jnp.where(
            valid, jnp.take_along_axis(scores_lv, safe, axis=1),
            -jnp.inf).reshape(-1)
        if scores.shape[0] < max_per_img:     # degenerate tiny configs
            pad = max_per_img - scores.shape[0]
            scores = jnp.concatenate(
                [scores, jnp.full((pad,), -jnp.inf, scores.dtype)], 0)
            obbs = jnp.concatenate(
                [obbs, jnp.zeros((pad, 5), obbs.dtype)], 0)
        top_s, top_i = _topk_scores(scores, max_per_img)
        valid = jnp.isfinite(top_s)
        out_obbs = jnp.where(valid[:, None], obbs[top_i], 0.0)
        out_scores = jnp.where(valid, top_s, 0.0)
        return out_obbs, out_scores, valid

    b = cls_scores[0].shape[0]
    cls_list = [s.reshape(b, -1) for s in cls_scores]
    reg_list = [p.reshape(b, -1, 6) for p in bbox_preds]
    return jax.vmap(single_image)(cls_list, reg_list)
