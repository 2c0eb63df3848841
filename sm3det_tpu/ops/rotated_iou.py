"""Rotated-box IoU via vectorized convex polygon clipping (pure jnp).

TPU-native replacement for the reference CUDA op ``box_iou_rotated``
(``mmcv/mmcv/ops/csrc/common/box_iou_rotated_utils.hpp`` is the algorithmic
spec: rotated-rect intersection = edge×edge segment intersections plus
contained corners, ordered angularly, then shoelace). Everything here is
static-shaped and fully vectorized: the 16 candidate edge intersections and
8 candidate contained corners are computed for *all* pairs at once, sorted
by angle with invalid candidates pushed to the end, and integrated with a
masked shoelace — no data-dependent shapes, so it fuses under ``jit`` and
vmaps over arbitrary batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "obb_corners",
    "rotated_intersection_area",
    "box_iou_rotated",
    "box_iou_rotated_chunked",
]

_EPS = 1e-8


def obb_corners(obbs):
    """Corners of ``(..., 5)`` OBBs -> ``(..., 4, 2)``."""
    x, y, w, h, a = (obbs[..., i] for i in range(5))
    cosa, sina = jnp.cos(a), jnp.sin(a)
    wx, wy = w / 2 * cosa, w / 2 * sina
    hx, hy = -h / 2 * sina, h / 2 * cosa
    corners = jnp.stack(
        [
            x - wx - hx, y - wy - hy,
            x + wx - hx, y + wy - hy,
            x + wx + hx, y + wy + hy,
            x - wx + hx, y - wy + hy,
        ],
        axis=-1,
    )
    return corners.reshape(corners.shape[:-1] + (4, 2))


def _cross(o, a, b):
    """2D cross product of (a - o) x (b - o) over trailing dim 2."""
    return ((a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1])
            - (a[..., 1] - o[..., 1]) * (b[..., 0] - o[..., 0]))


def _edge_clip_contrib(sub, clip, eps_inside, sub_sign=None,
                       clip_sign=None):
    """Green's-theorem contribution of ``sub``'s edges clipped to the
    inside of convex quad ``clip``.

    For each edge P(t) = p + t(q-p), the inside-``clip`` portion is one
    interval [t_lo, t_hi] (convexity); its boundary contribution is
    0.5 * cross(P(t_lo), P(t_hi)). Order-independent, sort-free.

    sub, clip: (..., 4, 2) consistently wound (obb_corners order).
    eps_inside: shift of the half-plane inside test in pixels — used to
        break the tie when an edge lies exactly ON the other quad's
        boundary (identical boxes) so it is counted once, not twice.
    """
    p = sub                                   # (..., 4, 2) edge starts
    q = jnp.roll(sub, -1, axis=-2)            # edge ends
    d = q - p                                 # (..., 4, 2)

    o = clip                                  # (..., 4, 2) clip edge starts
    e = jnp.roll(clip, -1, axis=-2) - o       # clip edge dirs
    e_len = jnp.maximum(jnp.linalg.norm(e, axis=-1), _EPS)

    # signed distance (in px) of a point x to clip edge k:
    #   cross(e_k, x - o_k) / |e_k|  (positive inside for CCW winding)
    # dist(P(t)) = a + t*b  with:
    po = p[..., :, None, :] - o[..., None, :, :]       # (..., 4s, 4c, 2)
    ek = e[..., None, :, :]
    a = (ek[..., 0] * po[..., 1] - ek[..., 1] * po[..., 0]) \
        / e_len[..., None, :]                          # (..., 4s, 4c)
    dk = d[..., :, None, :]
    b = (ek[..., 0] * dk[..., 1] - ek[..., 1] * dk[..., 0]) \
        / e_len[..., None, :]

    if clip_sign is not None:
        # CW clip polygons flip the inside half-plane
        cs = clip_sign[..., None, None]
        a = a * cs
        b = b * cs
    a = a + eps_inside
    # inside(t) := a + t*b >= 0. Entering at t=-a/b if b>0, exiting if b<0.
    safe_b = jnp.where(jnp.abs(b) < _EPS, _EPS, b)
    t_cross = -a / safe_b
    t_lo_k = jnp.where(b > _EPS, t_cross, 0.0)
    t_lo_k = jnp.where((jnp.abs(b) <= _EPS) & (a < 0), 1.0, t_lo_k)
    t_hi_k = jnp.where(b < -_EPS, t_cross, 1.0)
    t_hi_k = jnp.where((jnp.abs(b) <= _EPS) & (a < 0), 0.0, t_hi_k)

    t_lo = jnp.clip(jnp.max(t_lo_k, axis=-1), 0.0, 1.0)   # (..., 4s)
    t_hi = jnp.clip(jnp.min(t_hi_k, axis=-1), 0.0, 1.0)
    valid = t_hi > t_lo

    p0 = p + t_lo[..., None] * d
    p1 = p + t_hi[..., None] * d
    contrib = 0.5 * (p0[..., 0] * p1[..., 1] - p0[..., 1] * p1[..., 0])
    total = jnp.sum(jnp.where(valid, contrib, 0.0), axis=-1)
    if sub_sign is not None:
        # CW subject polygons contribute with flipped orientation
        total = total * sub_sign
    return total


def _signed_area(c):
    n = jnp.roll(c, -1, axis=-2)
    return 0.5 * jnp.sum(
        c[..., 0] * n[..., 1] - c[..., 1] * n[..., 0], axis=-1)


def rotated_intersection_area(corners1, corners2):
    """Intersection area of two convex quads, batched — sort-free.

    The boundary of A∩B is exactly (∂A inside B) ∪ (∂B inside A); each
    straight piece contributes 0.5*cross(start, end) to the shoelace sum
    independent of ordering. ~100 flops/pair on the VPU vs. the classic
    24-candidate angular sort (the reference CUDA algorithm,
    ``box_iou_rotated_utils.hpp``) which is sort-bound under XLA.

    corners1, corners2: (..., 4, 2) with matching batch dims.
    """
    c1 = corners1.astype(jnp.float32)
    c2 = corners2.astype(jnp.float32)
    # winding handled by sign multipliers (reversing vertex order with
    # ::-1 trips a libtpu fusion-emitter bug); obb_corners output is
    # always CCW so these are +1 in the hot path and fold away
    s1 = jnp.sign(_signed_area(c1)) + (jnp.abs(_signed_area(c1)) < _EPS)
    s2 = jnp.sign(_signed_area(c2)) + (jnp.abs(_signed_area(c2)) < _EPS)
    # A-edges counted on/inside B; B-edges strictly inside A (tie-break so
    # coincident boundaries are counted exactly once)
    area = _edge_clip_contrib(c1, c2, 1e-4, sub_sign=s1, clip_sign=s2) + \
        _edge_clip_contrib(c2, c1, -1e-4, sub_sign=s2, clip_sign=s1)
    return jnp.maximum(area, 0.0)


def rotated_intersection_area_sorted(corners1, corners2):
    """Reference implementation: 24-candidate angular sort + shoelace
    (kept as the oracle for tests)."""
    c1 = corners1.astype(jnp.float32)
    c2 = corners2.astype(jnp.float32)

    # --- 16 edge-pair intersection candidates -------------------------------
    a1 = c1                                 # (..., 4, 2) edge starts of quad1
    b1 = jnp.roll(c1, -1, axis=-2)          # edge ends of quad1
    a2 = c2
    b2 = jnp.roll(c2, -1, axis=-2)

    # broadcast edges: quad1 edge i vs quad2 edge j -> (..., 4, 4, 2)
    p = a1[..., :, None, :]
    r = (b1 - a1)[..., :, None, :]
    q = a2[..., None, :, :]
    s = (b2 - a2)[..., None, :, :]

    denom = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]      # (..., 4, 4)
    qp = q - p
    t_num = qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]
    u_num = qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]
    safe_denom = jnp.where(jnp.abs(denom) < _EPS, 1.0, denom)
    t = t_num / safe_denom
    u = u_num / safe_denom
    edge_valid = (jnp.abs(denom) >= _EPS) & (t >= 0) & (t <= 1) \
        & (u >= 0) & (u <= 1)
    edge_pts = p + t[..., None] * r                             # (...,4,4,2)
    batch_shape = denom.shape[:-2]
    edge_pts = edge_pts.reshape(batch_shape + (16, 2))
    edge_valid = edge_valid.reshape(batch_shape + (16,))

    # --- corners of each quad inside the other ------------------------------
    def corners_in_quad(pts, quad):
        # pts: (..., 4, 2), quad: (..., 4, 2) convex, consistent winding.
        # The cross product scales with |edge| * |offset|; normalize by the
        # edge length so the tolerance is a signed point-to-edge DISTANCE
        # in pixels — an absolute eps breaks in fp32 at image-scale
        # coordinates (ulp of ~800^2 products is ~0.06).
        o = quad[..., None, :, :]                        # (..., 1, 4, 2)
        e = jnp.roll(quad, -1, axis=-2)[..., None, :, :]
        pp = pts[..., :, None, :]                        # (..., 4, 1, 2)
        cr = _cross(o, e, pp)                            # (..., 4, 4)
        edge_len = jnp.linalg.norm(
            jnp.roll(quad, -1, axis=-2) - quad, axis=-1)  # (..., 4)
        dist = cr / jnp.maximum(edge_len[..., None, :], _EPS)
        eps = 1e-3                                       # pixels
        inside = jnp.all(dist >= -eps, axis=-1) | \
            jnp.all(dist <= eps, axis=-1)
        return inside

    in1 = corners_in_quad(c1, c2)        # (..., 4) quad1 corners in quad2
    in2 = corners_in_quad(c2, c1)

    pts = jnp.concatenate([edge_pts, c1, c2], axis=-2)   # (..., 24, 2)
    valid = jnp.concatenate([edge_valid, in1, in2], axis=-1)  # (..., 24)

    num_valid = jnp.sum(valid, axis=-1)

    # --- order candidates angularly about their centroid --------------------
    vf = valid[..., None].astype(jnp.float32)
    centroid = jnp.sum(pts * vf, axis=-2, keepdims=True) / \
        jnp.maximum(jnp.sum(vf, axis=-2, keepdims=True), 1.0)
    rel = pts - centroid
    ang = jnp.arctan2(rel[..., 1], rel[..., 0])
    ang = jnp.where(valid, ang, jnp.inf)                 # invalid -> end
    order = jnp.argsort(ang, axis=-1)
    sorted_pts = jnp.take_along_axis(pts, order[..., None], axis=-2)

    # --- masked shoelace over the valid prefix ------------------------------
    idx = jnp.arange(24)
    nv = jnp.maximum(num_valid, 1)[..., None]            # (..., 1)
    nxt = jnp.where(idx[None] + 1 < nv, idx[None] + 1, 0)  # (..., 24)
    nxt_pts = jnp.take_along_axis(sorted_pts, nxt[..., None], axis=-2)
    contrib = (sorted_pts[..., 0] * nxt_pts[..., 1]
               - sorted_pts[..., 1] * nxt_pts[..., 0])
    contrib = jnp.where(idx[None] < nv, contrib, 0.0)
    area = 0.5 * jnp.abs(jnp.sum(contrib, axis=-1))
    return jnp.where(num_valid >= 3, area, 0.0)


def box_iou_rotated(boxes1, boxes2, mode: str = "iou",
                    aligned: bool = False):
    """Rotated IoU, API-compatible with the reference op.

    Mirrors ``mmcv/mmcv/ops/box_iou_rotated.py:9``: boxes are
    ``(cx, cy, w, h, theta)``; ``aligned=False`` gives ``(N, M)``,
    ``aligned=True`` a pairwise ``(N,)``; ``mode`` is ``'iou'`` or
    ``'iof'`` (intersection over the first box's area).
    """
    area1 = boxes1[..., 2] * boxes1[..., 3]
    area2 = boxes2[..., 2] * boxes2[..., 3]
    c1 = obb_corners(boxes1)
    c2 = obb_corners(boxes2)
    if not aligned:
        c1 = c1[..., :, None, :, :]
        c2 = c2[..., None, :, :, :]
        area1 = area1[..., :, None]
        area2 = area2[..., None, :]
        c1, c2 = jnp.broadcast_arrays(c1, c2)
    inter = rotated_intersection_area(c1, c2)
    if mode == "iou":
        union = area1 + area2 - inter
    elif mode == "iof":
        union = area1
    else:
        raise ValueError(mode)
    return jnp.where(union > _EPS, inter / jnp.maximum(union, _EPS), 0.0)


def box_iou_rotated_chunked(boxes1, boxes2, mode: str = "iou",
                            row_chunk: int = 256):
    """(N, M) rotated IoU computed in row blocks to bound peak memory.

    The full (N, M) candidate tensor is (N*M*24*2) floats; chunking rows via
    ``lax.map`` keeps the working set ~``row_chunk*M*24*2`` while XLA still
    pipelines the blocks.
    """
    n = boxes1.shape[0]
    if n <= row_chunk:
        return box_iou_rotated(boxes1, boxes2, mode=mode)
    pad = (-n) % row_chunk
    padded = jnp.pad(boxes1, ((0, pad), (0, 0)))
    blocks = padded.reshape(-1, row_chunk, 5)
    out = jax.lax.map(
        lambda blk: box_iou_rotated(blk, boxes2, mode=mode), blocks)
    return out.reshape(-1, boxes2.shape[0])[:n]
