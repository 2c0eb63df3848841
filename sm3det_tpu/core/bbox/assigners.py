"""Static-shape bbox assigners (jnp, jit-compatible).

Re-designs of the reference assigners for fixed shapes: ground truths arrive
padded to ``G`` with a validity mask; every function returns per-prior
``assigned_gt_inds`` using the mmdet encoding —

    -1 : ignore
     0 : negative (background)
    >0 : (gt index + 1)

- ``max_iou_assign``: mmdet ``MaxIoUAssigner`` (used for RPN on HBB overlaps
  and for R-CNN on rotated overlaps via ``RBboxOverlaps2D``).
- ``atss_assign``: mmdet ``ATSSAssigner`` (GFL head), center-distance top-k
  candidates per level, mean+std IoU threshold, center-in-gt check.

The IoU matrix is supplied by the caller so one implementation serves both
horizontal and rotated geometry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_DIST = 1e8


def max_iou_assign(ious, gt_mask, pos_iou_thr, neg_iou_thr,
                   min_pos_iou=0.0, match_low_quality=True,
                   gt_max_assign_all=True):
    """mmdet MaxIoUAssigner on a precomputed (P, G) IoU matrix.

    Args:
        ious: (P, G) IoU between priors and (padded) gts.
        gt_mask: (G,) bool validity of each gt row.

    Returns:
        assigned_gt_inds: (P,) int32 in {-1 unused here, 0, 1..G}.
    """
    ious = jnp.where(gt_mask[None, :], ious, -1.0)
    max_overlaps = jnp.max(ious, axis=1)            # (P,)
    argmax_overlaps = jnp.argmax(ious, axis=1)      # (P,)

    # negatives: max iou in [0, neg_thr)
    assigned = jnp.where(
        (max_overlaps >= 0) & (max_overlaps < neg_iou_thr), 0, -1)
    # positives
    assigned = jnp.where(
        max_overlaps >= pos_iou_thr, argmax_overlaps + 1, assigned)

    if match_low_quality:
        # for each gt, the prior(s) with the highest IoU with it
        gt_max = jnp.max(ious, axis=0)              # (G,)
        eligible_gt = gt_mask & (gt_max > min_pos_iou)
        if gt_max_assign_all:
            # every prior achieving the per-gt max gets assigned to that gt
            is_gt_argmax = (ious == gt_max[None, :]) & eligible_gt[None, :]
            # later gts override earlier ones (mmdet iterates gts in order)
            gt_ids = jnp.arange(ious.shape[1]) + 1
            cand = jnp.where(is_gt_argmax, gt_ids[None, :], 0)
            low_q = jnp.max(cand, axis=1)
            assigned = jnp.where(low_q > 0, low_q, assigned)
        else:
            gt_argmax = jnp.argmax(ious, axis=0)    # (G,)
            upd = jnp.where(eligible_gt, jnp.arange(ious.shape[1]) + 1, 0)
            assigned = assigned.at[gt_argmax].max(upd)
    return assigned.astype(jnp.int32)


def atss_assign(ious, priors_cxcy, gt_hbboxes, gt_mask,
                num_level_priors, topk=9):
    """mmdet ATSSAssigner with static shapes.

    Args:
        ious: (P, G) IoU between priors and gts (horizontal for GFL).
        priors_cxcy: (P, 2) prior center points.
        gt_hbboxes: (G, 4) xyxy gts (padded).
        gt_mask: (G,) validity.
        num_level_priors: python list of priors per level, sums to P.
        topk: candidates per level per gt.

    Returns:
        (assigned_gt_inds (P,), max_overlaps (P,)).
    """
    num_priors, num_gt = ious.shape
    gt_cx = (gt_hbboxes[:, 0] + gt_hbboxes[:, 2]) / 2.0
    gt_cy = (gt_hbboxes[:, 1] + gt_hbboxes[:, 3]) / 2.0
    gt_points = jnp.stack([gt_cx, gt_cy], axis=-1)  # (G, 2)

    distances = jnp.linalg.norm(
        priors_cxcy[:, None, :] - gt_points[None, :, :], axis=-1)  # (P, G)

    # top-k closest priors per level per gt
    is_candidate = jnp.zeros((num_priors, num_gt), bool)
    start = 0
    for n in num_level_priors:
        level_dist = distances[start:start + n]                    # (n, G)
        k = min(topk, n)
        neg = -level_dist.T                                        # (G, n)
        _, topk_idx = jax.lax.top_k(neg, k)                        # (G, k)
        level_mask = jnp.zeros((num_gt, n), bool)
        level_mask = level_mask.at[
            jnp.arange(num_gt)[:, None], topk_idx].set(True)
        is_candidate = is_candidate.at[start:start + n].set(
            level_mask.T)
        start += n

    # adaptive threshold: mean + std of candidate IoUs per gt.
    # torch ``Tensor.std`` (atss_obb_assigner.py:120) is UNBIASED
    # (n-1 denominator) — matching it matters: the biased variant sets a
    # ~1% lower threshold and flips borderline assignments.
    count = jnp.sum(is_candidate, axis=0).astype(ious.dtype)       # (G,)
    cand_sum = jnp.sum(jnp.where(is_candidate, ious, 0.0), axis=0)
    mean_iou = cand_sum / jnp.maximum(count, 1.0)                  # (G,)
    sq_dev = jnp.where(is_candidate,
                       (ious - mean_iou[None, :]) ** 2, 0.0)
    std_iou = jnp.sqrt(jnp.sum(sq_dev, axis=0) /
                       jnp.maximum(count - 1.0, 1.0))
    iou_thr = mean_iou + std_iou

    is_pos = is_candidate & (ious >= iou_thr[None, :])

    # center of prior must be inside gt
    cx = priors_cxcy[:, 0][:, None]
    cy = priors_cxcy[:, 1][:, None]
    inside = (cx - gt_hbboxes[None, :, 0] > 0.01) & \
             (cy - gt_hbboxes[None, :, 1] > 0.01) & \
             (gt_hbboxes[None, :, 2] - cx > 0.01) & \
             (gt_hbboxes[None, :, 3] - cy > 0.01)
    is_pos = is_pos & inside & gt_mask[None, :]

    # each prior is assigned to the gt with the max IoU among its positives
    pos_ious = jnp.where(is_pos, ious, -jnp.inf)
    max_pos = jnp.max(pos_ious, axis=1)
    arg_pos = jnp.argmax(pos_ious, axis=1)
    assigned = jnp.where(max_pos > -jnp.inf, arg_pos + 1, 0)

    masked_ious = jnp.where(gt_mask[None, :], ious, -1.0)
    max_overlaps = jnp.where(
        max_pos > -jnp.inf, max_pos, jnp.max(masked_ious, axis=1))
    return assigned.astype(jnp.int32), max_overlaps


def atss_kld_assign(ious, prior_obbs, gt_obbs, gt_mask,
                    num_level_priors, topk=9):
    """ATSSKldAssigner (``atss_kld_assigner.py``): ATSS candidate
    selection by (negative) KL divergence between prior and gt box
    Gaussians instead of center distance; same mean+std IoU threshold."""
    from ...models.losses import obb2gaussian
    num_priors, num_gt = ious.shape
    mu_p, sig_p = obb2gaussian(prior_obbs)          # (P, .)
    mu_g, sig_g = obb2gaussian(gt_obbs)             # (G, .)
    inv_g = jnp.linalg.inv(sig_g)                   # (G, 2, 2)
    delta = mu_p[:, None, :] - mu_g[None, :, :]     # (P, G, 2)
    t1 = jnp.einsum("pgi,gij,pgj->pg", delta, inv_g, delta)
    t2 = jnp.einsum("gij,pji->pg", inv_g, sig_p)
    det_ratio = jnp.log(jnp.clip(
        jnp.linalg.det(sig_g)[None, :] /
        jnp.clip(jnp.linalg.det(sig_p), 1e-7)[:, None], 1e-7))
    kld = 0.5 * (t1 + t2 + det_ratio - 2)           # (P, G) smaller=closer

    is_candidate = jnp.zeros((num_priors, num_gt), bool)
    start = 0
    for n in num_level_priors:
        level_d = kld[start:start + n]
        k = min(topk, n)
        _, topk_idx = jax.lax.top_k(-level_d.T, k)  # (G, k)
        level_mask = jnp.zeros((num_gt, n), bool)
        level_mask = level_mask.at[
            jnp.arange(num_gt)[:, None], topk_idx].set(True)
        is_candidate = is_candidate.at[start:start + n].set(level_mask.T)
        start += n

    # unbiased std — torch ``Tensor.std`` (atss_kld_assigner.py:135)
    count = jnp.sum(is_candidate, axis=0).astype(ious.dtype)
    cand_sum = jnp.sum(jnp.where(is_candidate, ious, 0.0), axis=0)
    mean_iou = cand_sum / jnp.maximum(count, 1.0)
    sq_dev = jnp.where(is_candidate,
                       (ious - mean_iou[None, :]) ** 2, 0.0)
    std_iou = jnp.sqrt(jnp.sum(sq_dev, axis=0) /
                       jnp.maximum(count - 1.0, 1.0))
    is_pos = is_candidate & (ious >= (mean_iou + std_iou)[None, :]) & \
        gt_mask[None, :]
    pos_ious = jnp.where(is_pos, ious, -jnp.inf)
    max_pos = jnp.max(pos_ious, axis=1)
    assigned = jnp.where(max_pos > -jnp.inf,
                         jnp.argmax(pos_ious, axis=1) + 1, 0)
    return assigned.astype(jnp.int32)


def convex_assign(pred_points, gt_polys, gt_mask, pos_iou_thr=0.5,
                  neg_iou_thr=0.4, valid_points=None):
    """ConvexAssigner/MaxConvexIoUAssigner contract
    (``mmrotate/core/bbox/assigners/convex_assigner.py``): assign point
    sets to gts by convex-hull IoU (our rotating-calipers + quad IoU).

    Args:
        pred_points: (P, K, 2) point sets.
        gt_polys: (G, 8) gt quad corners (padded).
    """
    from ...ops.geometry_extras import convex_iou
    ious = convex_iou(pred_points, gt_polys, valid_points)   # (P, G)
    ious = jnp.where(gt_mask[None, :], ious, -1.0)
    return max_iou_assign(ious, gt_mask, pos_iou_thr=pos_iou_thr,
                          neg_iou_thr=neg_iou_thr,
                          min_pos_iou=0.0, match_low_quality=True)


def sas_assign(points, stride_vec, gt_obbs, gt_mask, topk: int = 9):
    """SASAssigner contract (``sas_assigner.py``): per gt, take the topk
    nearest points (center distance, scale-aware by level stride) that
    fall inside the gt as positives."""
    g = gt_obbs.shape[0]
    cx, cy, w, h, th = (gt_obbs[:, i] for i in range(5))
    cos_t, sin_t = jnp.cos(th), jnp.sin(th)
    dx = points[:, 0][:, None] - cx[None]
    dy = points[:, 1][:, None] - cy[None]
    fx = cos_t[None] * dx + sin_t[None] * dy
    fy = -sin_t[None] * dx + cos_t[None] * dy
    inside = (jnp.abs(fx) < w[None] / 2) & (jnp.abs(fy) < h[None] / 2)
    # scale-aware distance: normalize by gt scale and point stride
    scale = jnp.sqrt(w * h)[None]
    dist = jnp.sqrt(dx * dx + dy * dy) / jnp.maximum(scale, 1e-6)
    dist = dist + (1.0 - inside) * 1e6 + (~gt_mask)[None] * 1e6
    k = min(topk, points.shape[0])
    _, top_idx = jax.lax.top_k(-dist.T, k)                  # (G, k)
    is_pos = jnp.zeros((points.shape[0], g), bool)
    is_pos = is_pos.at[top_idx, jnp.arange(g)[:, None]].set(True)
    is_pos = is_pos & inside & gt_mask[None]
    d_masked = jnp.where(is_pos, dist, jnp.inf)
    best = jnp.argmin(d_masked, axis=1)
    has = jnp.isfinite(jnp.min(d_masked, axis=1))
    return jnp.where(has, best + 1, 0).astype(jnp.int32)
