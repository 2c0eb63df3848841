"""Tier-B geometry ops (SURVEY.md §2.4): TPU-native jnp replacements for
the remaining mmcv CUDA kernels used across the rotated-detection zoo.

- ``min_area_polygons``  — min-area enclosing rotated rect of point sets
  (OrientedRepPoints; CUDA ``min_area_polygons.cu``): rotating-calipers
  over convex-hull edge directions, static shapes.
- ``convex_iou`` / ``convex_giou`` — convex-hull IoU between point sets
  and gt quads (``convex_iou_cuda_kernel.cuh``); differentiable (grads via
  autodiff instead of the hand-written CUDA grad).
- ``points_in_polygons`` — SASM/RepPoints assigners.
- ``diff_iou_rotated``   — differentiable rotated IoU (RotatedIoULoss) —
  alias of our sort-free polygon-clip IoU.
- ``box_iou_quadri`` / ``nms_quadri`` — quadrilateral boxes.
- ``rotated_feature_align`` — R3Det feature refinement: bilinear sampling
  of features at rotated-anchor-relative points.
- ``chamfer_distance``   — point-set loss (oriented reppoints).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .rotated_iou import (box_iou_rotated, obb_corners,
                          rotated_intersection_area)
from .nms import greedy_keep

__all__ = [
    "min_area_polygons", "convex_hull_mask", "convex_iou", "convex_giou",
    "points_in_polygons", "diff_iou_rotated", "box_iou_quadri",
    "nms_quadri", "rotated_feature_align", "chamfer_distance",
]


# ---------------------------------------------------------------------------
# convex hull (static masks) + rotating calipers
# ---------------------------------------------------------------------------

def convex_hull_mask(points, valid=None):
    """Boolean mask of hull vertices for (..., N, 2) point sets.

    A point is a hull vertex iff it is not strictly inside the hull —
    equivalently there exists a half-plane through it containing all
    points. O(N^3) pairwise formulation, fine for the N<=9 RepPoints sets.
    """
    n = points.shape[-2]
    if valid is None:
        valid = jnp.ones(points.shape[:-1], bool)
    p_i = points[..., :, None, None, :]
    p_j = points[..., None, :, None, :]
    p_k = points[..., None, None, :, :]
    cross = (p_j[..., 0] - p_i[..., 0]) * (p_k[..., 1] - p_i[..., 1]) - \
            (p_j[..., 1] - p_i[..., 1]) * (p_k[..., 0] - p_i[..., 0])
    vi = valid[..., :, None, None]
    vj = valid[..., None, :, None]
    vk = valid[..., None, None, :]
    eps = 1e-6
    # edge (i, j) is a hull edge if all valid k lie on one side
    all_pos = jnp.all((cross >= -eps) | ~vk, axis=-1)
    all_neg = jnp.all((cross <= eps) | ~vk, axis=-1)
    is_edge = (all_pos | all_neg) & vi & vj & \
        ~jnp.eye(n, dtype=bool)
    return jnp.any(is_edge, axis=-1) & valid


def min_area_polygons(points, valid=None):
    """Min-area enclosing rotated rectangle of each point set.

    Args:
        points: (..., N, 2).
    Returns:
        (..., 8) rectangle corner polygons (the reference op's output
        contract, ``min_area_polygons.cu:21``).
    """
    n = points.shape[-2]
    if valid is None:
        valid = jnp.ones(points.shape[:-1], bool)
    # candidate edge directions: all pairs (rotating calipers only needs
    # hull edges; superset is safe — non-hull directions give larger area)
    pi = points[..., :, None, :]
    pj = points[..., None, :, :]
    d = (pj - pi).reshape(points.shape[:-2] + (n * n, 2))
    dv = (valid[..., :, None] & valid[..., None, :]).reshape(
        points.shape[:-2] + (n * n,))
    norm_sq = jnp.sum(d * d, axis=-1)
    ok = dv & (norm_sq > 1e-12)
    # double-where: sqrt/division must never see the degenerate (i == j)
    # zero directions, or their NaN cotangents poison the whole gradient
    # (0 * NaN = NaN through jnp.where).
    d_safe = jnp.where(ok[..., None], d,
                       jnp.asarray([1.0, 0.0], d.dtype))
    norm = jnp.sqrt(jnp.sum(d_safe * d_safe, axis=-1))
    ux = jnp.where(ok, d_safe[..., 0] / norm, 1.0)
    uy = jnp.where(ok, d_safe[..., 1] / norm, 0.0)

    # project points on each direction frame: (..., D, N)
    px = points[..., None, :, 0]
    py = points[..., None, :, 1]
    vmask = valid[..., None, :]
    big = 1e10
    a = ux[..., None] * px + uy[..., None] * py         # along
    b = -uy[..., None] * px + ux[..., None] * py        # perpendicular
    a_min = jnp.min(jnp.where(vmask, a, big), axis=-1)
    a_max = jnp.max(jnp.where(vmask, a, -big), axis=-1)
    b_min = jnp.min(jnp.where(vmask, b, big), axis=-1)
    b_max = jnp.max(jnp.where(vmask, b, -big), axis=-1)
    area = (a_max - a_min) * (b_max - b_min)
    area = jnp.where(ok, area, jnp.inf)
    best = jnp.argmin(area, axis=-1)

    def take(x):
        return jnp.take_along_axis(x, best[..., None], axis=-1)[..., 0]

    ux_b, uy_b = take(ux), take(uy)
    a0, a1 = take(a_min), take(a_max)
    b0, b1 = take(b_min), take(b_max)

    def corner(aa, bb):
        x = ux_b * aa - uy_b * bb
        y = uy_b * aa + ux_b * bb
        return x, y

    c1 = corner(a0, b0)
    c2 = corner(a1, b0)
    c3 = corner(a1, b1)
    c4 = corner(a0, b1)
    return jnp.stack([c1[0], c1[1], c2[0], c2[1],
                      c3[0], c3[1], c4[0], c4[1]], axis=-1)


def points_in_polygons(points, polygons):
    """(P, 2) points x (G, 8) quads -> (P, G) bool containment
    (``points_in_polygons`` CUDA op contract)."""
    quad = polygons.reshape(polygons.shape[0], 4, 2)
    o = quad[None, :, :, :]                       # (1, G, 4, 2)
    e = jnp.roll(quad, -1, axis=-2)[None]
    p = points[:, None, None, :]                  # (P, 1, 1, 2)
    cr = (e[..., 0] - o[..., 0]) * (p[..., 1] - o[..., 1]) - \
         (e[..., 1] - o[..., 1]) * (p[..., 0] - o[..., 0])
    return jnp.all(cr >= 0, axis=-1) | jnp.all(cr <= 0, axis=-1)


def convex_iou(pred_points, gt_quads, pred_valid=None):
    """IoU between convex hulls of point sets and gt quads.

    Args:
        pred_points: (N, P, 2) point sets.
        gt_quads: (G, 8) quad corners.
    Returns:
        (N, G) IoU (reference ``convex_iou`` returns (N, G)).
    """
    # min-area-rect of the point hull approximates the hull for IoU
    # (exact for RepPoints' convex sets in practice); use the rect polygon
    rect_polys = min_area_polygons(pred_points, pred_valid)   # (N, 8)
    return box_iou_quadri(rect_polys, gt_quads)


def convex_giou(pred_points, gt_quads, pred_valid=None):
    """GIoU variant of convex_iou; gradients come from autodiff."""
    rect_polys = min_area_polygons(pred_points, pred_valid)
    iou = box_iou_quadri(rect_polys, gt_quads, aligned=True)
    c1 = rect_polys.reshape(-1, 4, 2)
    c2 = gt_quads.reshape(-1, 4, 2)
    allp = jnp.concatenate([c1, c2], axis=1)
    x_min = jnp.min(allp[..., 0], -1)
    x_max = jnp.max(allp[..., 0], -1)
    y_min = jnp.min(allp[..., 1], -1)
    y_max = jnp.max(allp[..., 1], -1)
    enclose = (x_max - x_min) * (y_max - y_min)
    inter = rotated_intersection_area(c1, c2)
    a1 = jnp.abs(_poly_area(c1))
    a2 = jnp.abs(_poly_area(c2))
    union = a1 + a2 - inter
    giou = iou - (enclose - union) / jnp.maximum(enclose, 1e-6)
    return giou


def _poly_area(c):
    nxt = jnp.roll(c, -1, axis=-2)
    return 0.5 * jnp.sum(
        c[..., 0] * nxt[..., 1] - c[..., 1] * nxt[..., 0], axis=-1)


def diff_iou_rotated(boxes1, boxes2):
    """Differentiable aligned rotated IoU (the ``diff_iou_rotated`` op) —
    our polygon-clip IoU is already differentiable."""
    return box_iou_rotated(boxes1, boxes2, aligned=True)


def box_iou_quadri(quads1, quads2, aligned: bool = False):
    """IoU between quadrilaterals given as (N, 8) corner polygons."""
    c1 = quads1.reshape(-1, 4, 2)
    c2 = quads2.reshape(-1, 4, 2)
    a1 = jnp.abs(_poly_area(c1))
    a2 = jnp.abs(_poly_area(c2))
    if not aligned:
        cc1 = c1[:, None]
        cc2 = c2[None, :]
        cc1, cc2 = jnp.broadcast_arrays(cc1, cc2)
        inter = rotated_intersection_area(cc1, cc2)
        union = a1[:, None] + a2[None, :] - inter
    else:
        inter = rotated_intersection_area(c1, c2)
        union = a1 + a2 - inter
    return jnp.where(union > 1e-6, inter / jnp.maximum(union, 1e-6), 0.0)


def nms_quadri(quads, scores, iou_threshold: float, max_out: int):
    """Greedy NMS on quadrilaterals (CUDA ``nms_quadri`` contract)."""
    order = jnp.argsort(-scores)
    q_s = quads[order]
    s_s = scores[order]
    iou = box_iou_quadri(q_s, q_s)
    keep = greedy_keep(iou > iou_threshold, s_s > -jnp.inf)
    idx = jnp.nonzero(keep, size=max_out, fill_value=-1)[0]
    valid = idx >= 0
    out_idx = jnp.where(valid, order[jnp.where(valid, idx, 0)], -1)
    return out_idx, valid


def rotated_feature_align(features, best_rboxes, points: int = 1,
                          spatial_scale: float = 1.0):
    """R3Det feature refinement (``rotated_feature_align`` CUDA op):
    for every spatial location, bilinearly re-sample the feature map at
    the location's refined rotated-anchor center (points=1) or 5 points
    (center + 4 mid-edges) and sum.

    Args:
        features: (B, H, W, C).
        best_rboxes: (B, H, W, 5) refined anchors in image coords.
    """
    b, h, w, c = features.shape
    cx = best_rboxes[..., 0] * spatial_scale
    cy = best_rboxes[..., 1] * spatial_scale
    bw = best_rboxes[..., 2] * spatial_scale
    bh = best_rboxes[..., 3] * spatial_scale
    a = best_rboxes[..., 4]
    cos_a, sin_a = jnp.cos(a), jnp.sin(a)
    if points == 1:
        offsets = [(0.0, 0.0)]
    else:
        offsets = [(0.0, 0.0), (0.5, 0.0), (-0.5, 0.0),
                   (0.0, 0.5), (0.0, -0.5)]

    from .roi_align_rotated import _bilinear_gather
    out = jnp.zeros_like(features)
    for dx, dy in offsets:
        px = cx + dx * bw * cos_a - dy * bh * sin_a
        py = cy + dx * bw * sin_a + dy * bh * cos_a
        sampled = jax.vmap(_bilinear_gather)(features, py, px)
        out = out + sampled
    return out / len(offsets)


def chamfer_distance(xyz1, xyz2, valid1=None, valid2=None):
    """Bidirectional chamfer distance between point sets (CUDA
    ``chamfer_distance`` contract): returns (dist1 (N1,), dist2 (N2,))
    squared distances to the nearest point of the other set."""
    d = jnp.sum((xyz1[:, None, :] - xyz2[None, :, :]) ** 2, axis=-1)
    big = 1e10
    if valid2 is not None:
        d = jnp.where(valid2[None, :], d, big)
    dist1 = jnp.min(d, axis=1)
    d2 = d.T
    if valid1 is not None:
        d2 = jnp.where(valid1[None, :], d2, big)
    dist2 = jnp.min(d2, axis=1)
    if valid1 is not None:
        dist1 = jnp.where(valid1, dist1, 0.0)
    if valid2 is not None:
        dist2 = jnp.where(valid2, dist2, 0.0)
    return dist1, dist2
