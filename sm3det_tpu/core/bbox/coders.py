"""Box coders (pure jnp, jit-compatible).

Re-implements the encode/decode math of the reference coders:

- ``DeltaXYWHBBoxCoder``   — mmdet's horizontal 4-param coder.
- ``DeltaXYWHAOBBoxCoder`` — 5-param rotated coder with ``proj_xy`` /
  ``edge_swap`` (``mmrotate/core/bbox/coder/delta_xywha_rbbox_coder.py:12``).
- ``MidpointOffsetCoder``  — 6-param HBB-anchor->OBB coder used by the
  Oriented RPN (``delta_midpointoffset_rbbox_coder.py:13``).
- ``DistancePointBBoxCoder`` — point-to-edge distances (GFL / FCOS style).

All functions broadcast over leading dims and contain no data-dependent
control flow.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...ops.box_convert import norm_angle, obb2poly, obb2xyxy, poly2obb

PI = np.pi


def _normalize(deltas, means, stds):
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def _denormalize(deltas, means, stds):
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return deltas * stds + means


# --------------------------------------------------------------------------
# Horizontal DeltaXYWH
# --------------------------------------------------------------------------

class DeltaXYWHBBoxCoder:
    """mmdet-compatible horizontal box coder (xyxy <-> 4 deltas)."""

    def __init__(self, target_means=(0., 0., 0., 0.),
                 target_stds=(1., 1., 1., 1.)):
        self.means = target_means
        self.stds = target_stds

    def encode(self, bboxes, gt_bboxes):
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        pw = bboxes[..., 2] - bboxes[..., 0]
        ph = bboxes[..., 3] - bboxes[..., 1]
        gx = (gt_bboxes[..., 0] + gt_bboxes[..., 2]) * 0.5
        gy = (gt_bboxes[..., 1] + gt_bboxes[..., 3]) * 0.5
        gw = gt_bboxes[..., 2] - gt_bboxes[..., 0]
        gh = gt_bboxes[..., 3] - gt_bboxes[..., 1]
        pw = jnp.maximum(pw, 1e-6)
        ph = jnp.maximum(ph, 1e-6)
        deltas = jnp.stack([
            (gx - px) / pw,
            (gy - py) / ph,
            jnp.log(jnp.maximum(gw, 1e-6) / pw),
            jnp.log(jnp.maximum(gh, 1e-6) / ph),
        ], axis=-1)
        return _normalize(deltas, self.means, self.stds)

    def decode(self, bboxes, deltas, max_shape=None,
               wh_ratio_clip=16 / 1000):
        d = _denormalize(deltas, self.means, self.stds)
        max_ratio = abs(np.log(wh_ratio_clip))
        dx, dy = d[..., 0], d[..., 1]
        dw = jnp.clip(d[..., 2], -max_ratio, max_ratio)
        dh = jnp.clip(d[..., 3], -max_ratio, max_ratio)
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        pw = bboxes[..., 2] - bboxes[..., 0]
        ph = bboxes[..., 3] - bboxes[..., 1]
        gx = px + pw * dx
        gy = py + ph * dy
        gw = pw * jnp.exp(dw)
        gh = ph * jnp.exp(dh)
        out = jnp.stack(
            [gx - gw / 2, gy - gh / 2, gx + gw / 2, gy + gh / 2], axis=-1)
        if max_shape is not None:
            h, w = max_shape[0], max_shape[1]
            out = jnp.stack([
                jnp.clip(out[..., 0], 0, w),
                jnp.clip(out[..., 1], 0, h),
                jnp.clip(out[..., 2], 0, w),
                jnp.clip(out[..., 3], 0, h),
            ], axis=-1)
        return out


# --------------------------------------------------------------------------
# Rotated DeltaXYWHA
# --------------------------------------------------------------------------

class DeltaXYWHAOBBoxCoder:
    """5-param rotated coder (``delta_xywha_rbbox_coder.py:12``)."""

    def __init__(self, angle_range="oc",
                 target_means=(0., 0., 0., 0., 0.),
                 target_stds=(1., 1., 1., 1., 1.),
                 norm_factor=None, edge_swap=False, proj_xy=False):
        self.version = angle_range
        self.means = target_means
        self.stds = target_stds
        self.norm_factor = norm_factor
        self.edge_swap = edge_swap
        self.proj_xy = proj_xy

    def encode(self, bboxes, gt_bboxes):
        px, py, pw, ph, pa = (bboxes[..., i] for i in range(5))
        gx, gy, gw, gh, ga = (gt_bboxes[..., i] for i in range(5))
        pw = jnp.maximum(pw, 1e-6)
        ph = jnp.maximum(ph, 1e-6)
        if self.proj_xy:
            dx = (jnp.cos(pa) * (gx - px) + jnp.sin(pa) * (gy - py)) / pw
            dy = (-jnp.sin(pa) * (gx - px) + jnp.cos(pa) * (gy - py)) / ph
        else:
            dx = (gx - px) / pw
            dy = (gy - py) / ph
        if self.edge_swap:
            dtheta1 = norm_angle(ga - pa, self.version)
            dtheta2 = norm_angle(ga - pa + PI / 2, self.version)
            swap = jnp.abs(dtheta1) >= jnp.abs(dtheta2)
            gw_r = jnp.where(swap, gh, gw)
            gh_r = jnp.where(swap, gw, gh)
            da = jnp.where(swap, dtheta2, dtheta1)
            dw = jnp.log(jnp.maximum(gw_r, 1e-6) / pw)
            dh = jnp.log(jnp.maximum(gh_r, 1e-6) / ph)
        else:
            da = norm_angle(ga - pa, self.version)
            dw = jnp.log(jnp.maximum(gw, 1e-6) / pw)
            dh = jnp.log(jnp.maximum(gh, 1e-6) / ph)
        if self.norm_factor:
            da = da / (self.norm_factor * PI)
        deltas = jnp.stack([dx, dy, dw, dh, da], axis=-1)
        return _normalize(deltas, self.means, self.stds)

    def decode(self, rois, deltas, max_shape=None, wh_ratio_clip=16 / 1000):
        d = _denormalize(deltas, self.means, self.stds)
        dx, dy, dw, dh, da = (d[..., i] for i in range(5))
        if self.norm_factor:
            da = da * (self.norm_factor * PI)
        max_ratio = abs(np.log(wh_ratio_clip))
        dw = jnp.clip(dw, -max_ratio, max_ratio)
        dh = jnp.clip(dh, -max_ratio, max_ratio)
        px, py, pw, ph, pa = (rois[..., i] for i in range(5))
        gw = pw * jnp.exp(dw)
        gh = ph * jnp.exp(dh)
        if self.proj_xy:
            gx = dx * pw * jnp.cos(pa) - dy * ph * jnp.sin(pa) + px
            gy = dx * pw * jnp.sin(pa) + dy * ph * jnp.cos(pa) + py
        else:
            gx = px + pw * dx
            gy = py + ph * dy
        ga = norm_angle(pa + da, self.version)
        if max_shape is not None:
            gx = jnp.clip(gx, 0, max_shape[1] - 1)
            gy = jnp.clip(gy, 0, max_shape[0] - 1)
        if self.edge_swap:
            swap = gw <= gh
            w_r = jnp.where(swap, gh, gw)
            h_r = jnp.where(swap, gw, gh)
            theta_r = norm_angle(jnp.where(swap, ga + PI / 2, ga),
                                 self.version)
            return jnp.stack([gx, gy, w_r, h_r, theta_r], axis=-1)
        return jnp.stack([gx, gy, gw, gh, ga], axis=-1)


# --------------------------------------------------------------------------
# Midpoint offset (Oriented RPN)
# --------------------------------------------------------------------------

class MidpointOffsetCoder:
    """HBB-anchor -> OBB 6-param coder (``delta_midpointoffset_rbbox_coder.py``).

    Encodes gt OBBs as (dx, dy, dw, dh, da, db) relative to a horizontal
    anchor: (dx..dh) regress the enclosing HBB, (da, db) locate the top and
    right polygon midpoints along the HBB edges. Decoding rebuilds the
    8-point polygon, rescales its half-diagonals to the max so it becomes a
    parallelogram-consistent rectangle, and converts to OBB.
    """

    def __init__(self, angle_range="oc",
                 target_means=(0., 0., 0., 0., 0., 0.),
                 target_stds=(1., 1., 1., 1., 1., 1.)):
        self.version = angle_range
        self.means = target_means
        self.stds = target_stds

    def encode(self, bboxes, gt_bboxes):
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        pw = jnp.maximum(bboxes[..., 2] - bboxes[..., 0], 1e-6)
        ph = jnp.maximum(bboxes[..., 3] - bboxes[..., 1], 1e-6)

        hbb = obb2xyxy(gt_bboxes, self.version)
        poly = obb2poly(gt_bboxes, self.version)
        gx = (hbb[..., 0] + hbb[..., 2]) * 0.5
        gy = (hbb[..., 1] + hbb[..., 3]) * 0.5
        gw = jnp.maximum(hbb[..., 2] - hbb[..., 0], 1e-6)
        gh = jnp.maximum(hbb[..., 3] - hbb[..., 1], 1e-6)

        x_coor = poly[..., 0::2]
        y_coor = poly[..., 1::2]
        y_min = jnp.min(y_coor, axis=-1, keepdims=True)
        x_max = jnp.max(x_coor, axis=-1, keepdims=True)
        # ga: x of the topmost vertex; gb: y of the rightmost vertex
        ga = jnp.max(
            jnp.where(jnp.abs(y_coor - y_min) > 0.1, -1000.0, x_coor),
            axis=-1)
        gb = jnp.max(
            jnp.where(jnp.abs(x_coor - x_max) > 0.1, -1000.0, y_coor),
            axis=-1)

        deltas = jnp.stack([
            (gx - px) / pw,
            (gy - py) / ph,
            jnp.log(gw / pw),
            jnp.log(gh / ph),
            (ga - gx) / gw,
            (gb - gy) / gh,
        ], axis=-1)
        return _normalize(deltas, self.means, self.stds)

    def decode(self, rois, deltas, max_shape=None, wh_ratio_clip=16 / 1000):
        d = _denormalize(deltas, self.means, self.stds)
        dx, dy, dw, dh, da, db = (d[..., i] for i in range(6))
        max_ratio = abs(np.log(wh_ratio_clip))
        dw = jnp.clip(dw, -max_ratio, max_ratio)
        dh = jnp.clip(dh, -max_ratio, max_ratio)
        px = (rois[..., 0] + rois[..., 2]) * 0.5
        py = (rois[..., 1] + rois[..., 3]) * 0.5
        pw = rois[..., 2] - rois[..., 0]
        ph = rois[..., 3] - rois[..., 1]
        gw = pw * jnp.exp(dw)
        gh = ph * jnp.exp(dh)
        gx = px + pw * dx
        gy = py + ph * dy
        x1 = gx - gw * 0.5
        y1 = gy - gh * 0.5
        x2 = gx + gw * 0.5
        y2 = gy + gh * 0.5
        da = jnp.clip(da, -0.5, 0.5)
        db = jnp.clip(db, -0.5, 0.5)
        ga = gx + da * gw
        _ga = gx - da * gw
        gb = gy + db * gh
        _gb = gy - db * gh
        polys = jnp.stack([ga, y1, x2, gb, _ga, y2, x1, _gb], axis=-1)
        center = jnp.stack([gx, gy] * 4, axis=-1)
        cp = polys - center
        diag = jnp.sqrt(cp[..., 0::2] ** 2 + cp[..., 1::2] ** 2)
        diag = jnp.maximum(diag, 1e-6)
        max_diag = jnp.max(diag, axis=-1, keepdims=True)
        scale = jnp.repeat(max_diag / diag, 2, axis=-1)
        rect = cp * scale + center
        return poly2obb(rect, self.version)


# --------------------------------------------------------------------------
# Distance-point (GFL / FCOS)
# --------------------------------------------------------------------------

class DistancePointBBoxCoder:
    """Point + (left, top, right, bottom) distances <-> xyxy boxes."""

    def encode(self, points, gt_bboxes, max_dis=None, eps=0.1):
        left = points[..., 0] - gt_bboxes[..., 0]
        top = points[..., 1] - gt_bboxes[..., 1]
        right = gt_bboxes[..., 2] - points[..., 0]
        bottom = gt_bboxes[..., 3] - points[..., 1]
        d = jnp.stack([left, top, right, bottom], axis=-1)
        if max_dis is not None:
            d = jnp.clip(d, 0, max_dis - eps)
        return d

    def decode(self, points, distances, max_shape=None):
        x1 = points[..., 0] - distances[..., 0]
        y1 = points[..., 1] - distances[..., 1]
        x2 = points[..., 0] + distances[..., 2]
        y2 = points[..., 1] + distances[..., 3]
        out = jnp.stack([x1, y1, x2, y2], axis=-1)
        if max_shape is not None:
            h, w = max_shape[0], max_shape[1]
            out = jnp.stack([
                jnp.clip(out[..., 0], 0, w),
                jnp.clip(out[..., 1], 0, h),
                jnp.clip(out[..., 2], 0, w),
                jnp.clip(out[..., 3], 0, h),
            ], axis=-1)
        return out
