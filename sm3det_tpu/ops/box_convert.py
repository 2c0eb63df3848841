"""Rotated-box representation conversions (TPU-native, pure jnp).

Oriented boxes (OBB) are ``(cx, cy, w, h, theta)`` in image coordinates
(y axis pointing down), under one of three angle conventions:

- ``'oc'``   : theta in (0, pi/2]; ``w`` is the edge reached by rotating the
  y-axis by theta (OpenCV ``minAreaRect`` style).
- ``'le135'``: theta in [-pi/4, 3*pi/4); ``w`` is the long edge.
- ``'le90'`` : theta in [-pi/2, pi/2); ``w`` is the long edge.

Behavioral parity with the reference's conversion semantics
(``mmrotate/core/bbox/transforms.py:95-705``); everything here is
re-implemented as vectorized, jit-compatible jnp with static shapes — no
data-dependent control flow, so these run inside compiled train/eval steps.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

PI = np.pi

__all__ = [
    "norm_angle",
    "poly2obb",
    "obb2poly",
    "obb2hbb",
    "hbb2obb",
    "obb2xyxy",
    "rbbox_flip",
    "poly2obb_np",
    "obb2poly_np",
    "gaussian2bbox",
]


def norm_angle(angle, angle_range: str):
    """Normalize angles into the canonical range of an angle convention.

    Mirrors ``mmrotate/core/bbox/transforms.py:850``.
    """
    if angle_range == "oc":
        return angle
    elif angle_range == "le135":
        return (angle + PI / 4) % PI - PI / 4
    elif angle_range == "le90":
        return (angle + PI / 2) % PI - PI / 2
    raise NotImplementedError(f"unknown angle_range {angle_range!r}")


def _poly2obb_long_edge(polys, version: str):
    """Shared long-edge (le135/le90) poly->obb path.

    Assumes the polygon vertices trace a rectangle (the GT contract in the
    reference, ``transforms.py:268-333``).
    """
    polys = polys.reshape(polys.shape[:-1] + (4, 2))
    pt1, pt2, pt3, pt4 = (polys[..., i, :] for i in range(4))
    edge1 = jnp.linalg.norm(pt1 - pt2, axis=-1)
    edge2 = jnp.linalg.norm(pt2 - pt3, axis=-1)
    angle1 = jnp.arctan2(pt2[..., 1] - pt1[..., 1], pt2[..., 0] - pt1[..., 0])
    angle2 = jnp.arctan2(pt4[..., 1] - pt1[..., 1], pt4[..., 0] - pt1[..., 0])
    angle = jnp.where(edge1 > edge2, angle1, angle2)
    angle = norm_angle(angle, version)
    ctr = (pt1 + pt3) / 2.0
    width = jnp.maximum(edge1, edge2)
    height = jnp.minimum(edge1, edge2)
    return jnp.stack(
        [ctr[..., 0], ctr[..., 1], width, height, angle], axis=-1)


def _poly2obb_oc(polys):
    """OpenCV-convention poly->obb (``transforms.py:242``)."""
    polys = polys.reshape(polys.shape[:-1] + (4, 2))
    ctr = jnp.mean(polys, axis=-2)
    pt0, pt1, pt2 = polys[..., 0, :], polys[..., 1, :], polys[..., 2, :]
    _w = jnp.linalg.norm(pt0 - pt1, axis=-1)
    _h = jnp.linalg.norm(pt1 - pt2, axis=-1)
    _theta = jnp.arctan2(-(pt1[..., 0] - pt0[..., 0]),
                         pt1[..., 1] - pt0[..., 1])
    odd = jnp.equal(jnp.floor(_theta / (PI * 0.5)) % 2, 0)
    w = jnp.where(odd, _h, _w)
    h = jnp.where(odd, _w, _h)
    theta = _theta % (PI * 0.5)
    return jnp.stack([ctr[..., 0], ctr[..., 1], w, h, theta], axis=-1)


def poly2obb(polys, version: str = "oc"):
    """Convert rectangle polygons ``(..., 8)`` to OBBs ``(..., 5)``."""
    if version == "oc":
        return _poly2obb_oc(polys)
    if version in ("le135", "le90"):
        return _poly2obb_long_edge(polys, version)
    raise NotImplementedError(version)


def obb2poly(obbs, version: str = "oc"):
    """Convert OBBs ``(..., 5)`` to corner polygons ``(..., 8)``.

    All three conventions share one corner parameterization: corners
    ``(±w/2, ±h/2)`` rotated by ``[[cos,-sin],[sin,cos]]`` about the center
    (``transforms.py:421-501`` — the oc and long-edge paths reduce to the
    same formulas). ``version`` is accepted for API symmetry.
    """
    del version
    x, y, w, h, a = (obbs[..., i] for i in range(5))
    cosa, sina = jnp.cos(a), jnp.sin(a)
    wx, wy = w / 2 * cosa, w / 2 * sina
    hx, hy = -h / 2 * sina, h / 2 * cosa
    p1 = (x - wx - hx, y - wy - hy)
    p2 = (x + wx - hx, y + wy - hy)
    p3 = (x + wx + hx, y + wy + hy)
    p4 = (x - wx + hx, y - wy + hy)
    return jnp.stack(
        [p1[0], p1[1], p2[0], p2[1], p3[0], p3[1], p4[0], p4[1]], axis=-1)


def obb2xyxy(obbs, version: str = "oc"):
    """Axis-aligned enclosing box ``(x1, y1, x2, y2)`` of an OBB.

    ``transforms.py:637-705``. For ``oc`` the reference exploits
    cos>0, sin>0; the abs-form below is equivalent on the canonical range
    and exact for all versions.
    """
    x, y, w, h, a = (obbs[..., i] for i in range(5))
    cosa, sina = jnp.abs(jnp.cos(a)), jnp.abs(jnp.sin(a))
    dw = cosa * w + sina * h
    dh = sina * w + cosa * h
    return jnp.stack(
        [x - dw / 2, y - dh / 2, x + dw / 2, y + dh / 2], axis=-1)


def obb2hbb(obbs, version: str = "oc"):
    """Horizontal box in OBB form (``transforms.py:502-578``)."""
    xyxy = obb2xyxy(obbs, version)
    x = (xyxy[..., 0] + xyxy[..., 2]) * 0.5
    y = (xyxy[..., 1] + xyxy[..., 3]) * 0.5
    w = xyxy[..., 2] - xyxy[..., 0]
    h = xyxy[..., 3] - xyxy[..., 1]
    if version == "oc":
        return jnp.stack([x, y, h, w, jnp.full_like(x, PI / 2)], axis=-1)
    swap = w < h
    out_w = jnp.where(swap, h, w)
    out_h = jnp.where(swap, w, h)
    theta_swapped = PI / 2 if version == "le135" else -PI / 2
    theta = jnp.where(swap, theta_swapped, 0.0)
    return jnp.stack([x, y, out_w, out_h, theta], axis=-1)


def hbb2obb(hbbs, version: str = "oc"):
    """xyxy horizontal boxes to OBBs (``transforms.py:579-636``)."""
    x = (hbbs[..., 0] + hbbs[..., 2]) * 0.5
    y = (hbbs[..., 1] + hbbs[..., 3]) * 0.5
    w = hbbs[..., 2] - hbbs[..., 0]
    h = hbbs[..., 3] - hbbs[..., 1]
    if version == "oc":
        return jnp.stack([x, y, h, w, jnp.full_like(x, PI / 2)], axis=-1)
    swap = w < h
    out_w = jnp.where(swap, h, w)
    out_h = jnp.where(swap, w, h)
    theta_swapped = PI / 2 if version == "le135" else -PI / 2
    theta = jnp.where(swap, theta_swapped, 0.0)
    return jnp.stack([x, y, out_w, out_h, theta], axis=-1)


def rbbox_flip(obbs, img_shape, direction: str = "horizontal",
               version: str = "le90"):
    """Flip OBBs inside an image (``mmrotate/datasets/pipelines`` semantics).

    ``img_shape`` is (H, W).
    """
    x, y, w, h, a = (obbs[..., i] for i in range(5))
    H, W = img_shape[0], img_shape[1]
    if direction not in ("horizontal", "vertical", "diagonal"):
        raise ValueError(direction)
    if direction in ("horizontal", "diagonal"):
        x = W - x
    if direction in ("vertical", "diagonal"):
        y = H - y
    if direction != "diagonal":    # diagonal = 180-deg rotation: a fixed
        if version == "oc":
            # oc convention mirrors by swapping the edges
            # (reference RRandomFlip.bbox_flip, transforms.py:224-228)
            rot = a != PI / 2
            w, h = jnp.where(rot, h, w), jnp.where(rot, w, h)
            a = jnp.where(rot, PI / 2 - a, a)
        else:
            a = norm_angle(-a, version)
    return jnp.stack([x, y, w, h, a], axis=-1)


# --- numpy host-side variants (annotation loading / eval / tools) -----------
# Pure numpy so host tools never touch the accelerator.

def _norm_angle_np(angle, version):
    if version == "oc":
        return angle
    if version == "le135":
        return (angle + PI / 4) % PI - PI / 4
    return (angle + PI / 2) % PI - PI / 2


def poly2obb_np(polys: np.ndarray, version: str = "le90") -> np.ndarray:
    """Host-side poly->obb for annotation loading; accepts (..., 8)."""
    polys = np.asarray(polys, np.float32)
    pts = polys.reshape(polys.shape[:-1] + (4, 2))
    pt1, pt2, pt3, pt4 = (pts[..., i, :] for i in range(4))
    if version == "oc":
        ctr = pts.mean(-2)
        _w = np.linalg.norm(pt1 - pt2, axis=-1)
        _h = np.linalg.norm(pt2 - pt3, axis=-1)
        _theta = np.arctan2(-(pt2[..., 0] - pt1[..., 0]),
                            pt2[..., 1] - pt1[..., 1])
        odd = np.equal(np.floor(_theta / (PI * 0.5)) % 2, 0)
        w = np.where(odd, _h, _w)
        h = np.where(odd, _w, _h)
        theta = _theta % (PI * 0.5)
        return np.stack([ctr[..., 0], ctr[..., 1], w, h, theta],
                        -1).astype(np.float32)
    edge1 = np.linalg.norm(pt1 - pt2, axis=-1)
    edge2 = np.linalg.norm(pt2 - pt3, axis=-1)
    a1 = np.arctan2(pt2[..., 1] - pt1[..., 1], pt2[..., 0] - pt1[..., 0])
    a2 = np.arctan2(pt4[..., 1] - pt1[..., 1], pt4[..., 0] - pt1[..., 0])
    angle = _norm_angle_np(np.where(edge1 > edge2, a1, a2), version)
    ctr = (pt1 + pt3) / 2.0
    return np.stack([ctr[..., 0], ctr[..., 1],
                     np.maximum(edge1, edge2), np.minimum(edge1, edge2),
                     angle], -1).astype(np.float32)


def obb2poly_np(obbs: np.ndarray, version: str = "le90") -> np.ndarray:
    obbs = np.asarray(obbs, np.float32)
    x, y, w, h, a = (obbs[..., i] for i in range(5))
    cosa, sina = np.cos(a), np.sin(a)
    wx, wy = w / 2 * cosa, w / 2 * sina
    hx, hy = -h / 2 * sina, h / 2 * cosa
    return np.stack([x - wx - hx, y - wy - hy, x + wx - hx, y + wy - hy,
                     x + wx + hx, y + wy + hy, x - wx + hx, y - wy + hy],
                    -1).astype(np.float32)


def gaussian2bbox(mu, var):
    """Convert 2-D Gaussians back to corner polygons via SVD
    (``mmrotate/core/bbox/transforms.py:883 gaussian2bbox``; the reference
    takes a GMM object and requires torch_batch_svd — here plain
    ``(mu, var)`` arrays and ``jnp.linalg.svd``, fully jittable).

    Args:
        mu: (..., 2) Gaussian means.
        var: (..., 2, 2) SPD covariance matrices.
    Returns:
        (..., 8) polygons (x0,y0,...,x3,y3), L = 3-sigma box.
    """
    L = 3.0
    mu = jnp.asarray(mu)
    var = jnp.asarray(var)
    u, s, vt = jnp.linalg.svd(var)
    size_half = L * jnp.sqrt(jnp.clip(s, 0.0))[..., None, :]   # (...,1,2)
    dx_dy = size_half * jnp.asarray(
        [[-1.0, 1.0], [1.0, 1.0], [1.0, -1.0], [-1.0, -1.0]], mu.dtype)
    # rows of vt are the principal axes; rotate offsets into image frame
    corners = mu[..., None, :] + dx_dy @ vt
    return corners.reshape(corners.shape[:-2] + (8,))
