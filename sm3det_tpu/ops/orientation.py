"""Orientation-aware ops for the equivariant/refinement detectors.

- ``active_rotated_filter`` (ORConv / S2ANet,
  ``mmcv/.../active_rotated_filter.*``): materialize N rotated copies of
  each filter by bilinear rotation of the kernel grid + cyclic shift of
  the orientation channels. Here the rotation matrices are static, so the
  op is one einsum against a precomputed (O, k*k, k*k) interpolation
  tensor — MXU-friendly.
- ``riroi_align_rotated`` (ReDet, ``riroi_align_rotated.*``): RoIAlign
  rotated + rotation-invariant orientation-channel alignment (cyclic
  shift of the orientation dimension by the RoI angle).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .roi_align_rotated import roi_align_rotated


def _rotation_interp_matrix(k: int, angle: float) -> np.ndarray:
    """(k*k, k*k) bilinear map rotating a kxk kernel by ``angle``."""
    c = (k - 1) / 2.0
    cos_a, sin_a = np.cos(-angle), np.sin(-angle)
    m = np.zeros((k * k, k * k), np.float32)
    for oy in range(k):
        for ox in range(k):
            sx = cos_a * (ox - c) - sin_a * (oy - c) + c
            sy = sin_a * (ox - c) + cos_a * (oy - c) + c
            x0, y0 = int(np.floor(sx)), int(np.floor(sy))
            for dy in (0, 1):
                for dx in (0, 1):
                    xx, yy = x0 + dx, y0 + dy
                    if 0 <= xx < k and 0 <= yy < k:
                        wx = 1 - abs(sx - xx)
                        wy = 1 - abs(sy - yy)
                        if wx > 0 and wy > 0:
                            m[oy * k + ox, yy * k + xx] += wx * wy
    return m


def active_rotated_filter(weights, num_rotations: int = 8):
    """Expand orientation-grouped filters into rotated copies.

    Args:
        weights: (k, k, Cin*O, Cout) NHWC-style conv kernel whose input
            channel dim is grouped as (Cin, O) orientation channels.
        num_rotations: O.

    Returns:
        (O, k, k, Cin*O, Cout): for each target rotation r, the filter is
        spatially rotated by 2*pi*r/O and its orientation channels are
        cyclically shifted by r.
    """
    k = weights.shape[0]
    o = num_rotations
    cin_o, cout = weights.shape[2], weights.shape[3]
    cin = cin_o // o
    mats = np.stack([_rotation_interp_matrix(k, 2 * np.pi * r / o)
                     for r in range(o)])              # (O, kk, kk)
    w = weights.reshape(k * k, cin, o, cout)
    rotated = jnp.einsum("rab,bcod->racod", jnp.asarray(mats), w)
    # cyclic shift of orientation channels per rotation
    outs = []
    for r in range(o):
        shifted = jnp.roll(rotated[r], r, axis=2)     # (kk, cin, o, cout)
        outs.append(shifted.reshape(k, k, cin_o, cout))
    return jnp.stack(outs)


# ORConv2d's discrete 45-degree-step kernel index tables
# (mmrotate/models/utils/orconv.py:70-91): for a kxk kernel rotated by
# angle, entry j gives the 1-based target cell of source cell j.
_ORCONV_KERNEL_INDICES = {
    1: {a: (1,) for a in range(0, 360, 45)},
    3: {
        0: (1, 2, 3, 4, 5, 6, 7, 8, 9),
        45: (2, 3, 6, 1, 5, 9, 4, 7, 8),
        90: (3, 6, 9, 2, 5, 8, 1, 4, 7),
        135: (6, 9, 8, 3, 5, 7, 2, 1, 4),
        180: (9, 8, 7, 6, 5, 4, 3, 2, 1),
        225: (8, 7, 4, 9, 5, 1, 6, 3, 2),
        270: (7, 4, 1, 8, 5, 2, 9, 6, 3),
        315: (4, 1, 2, 7, 5, 3, 8, 9, 6),
    },
}


def orconv_indices(k: int, n_orient: int, n_rot: int) -> np.ndarray:
    """0-based (n_orient*k*k, n_rot) target-position table.

    Exact re-derivation of ``ORConv2d.get_indices``
    (``mmrotate/models/utils/orconv.py:93-104``): source entry
    ``l = i*k*k + j`` (orientation i, cell j) lands, under rotation r by
    ``angle = r*360/n_rot``, at orientation
    ``(i + angle // (360/n_orient)) % n_orient`` and kernel cell
    ``table[k][angle][j]``.
    """
    if 360 % n_rot or (360 // n_rot) % 45:
        raise ValueError(f"n_rot must divide 360 into 45-deg steps: {n_rot}")
    table = _ORCONV_KERNEL_INDICES[k]
    d_or = 360 / n_orient
    idx = np.zeros((n_orient * k * k, n_rot), np.int64)
    for i in range(n_orient):
        for j in range(k * k):
            for r in range(n_rot):
                angle = r * (360 // n_rot)
                layer = (i + int(angle // d_or)) % n_orient
                idx[i * k * k + j, r] = layer * k * k + table[angle][j] - 1
    return idx


def arf_expand(weights, n_rot: int = 8):
    """ActiveRotatedFilter with the reference's EXACT index semantics.

    The CUDA op scatters ``out[cout, r, cin, indices[l, r]] = w[cout, cin, l]``
    (``mmcv/.../active_rotated_filter_cuda_kernel.cuh:19-33``); here the
    same permutation is one static gather per rotation.

    Args:
        weights: (k, k, Cin, O_in, Cout) — NHWC-style ORConv weight
            (torch layout is (Cout, Cin, O_in, k, k)).
        n_rot: number of rotated copies R (45-degree steps).

    Returns:
        (k, k, Cin*O_in, Cout*R) conv kernel whose output channels are
        ordered (Cout, R) with R fastest — matching the torch layout that
        ``RotationInvariantPooling`` views as (N, Cout, R, H, W).
    """
    k, _, cin, o_in, cout = weights.shape
    idx = orconv_indices(k, o_in, n_rot)               # (O_in*k*k, R)
    # source entry order l = (o_in, ky, kx): bring weights to (l, cin, cout)
    w = jnp.transpose(weights, (3, 0, 1, 2, 4)).reshape(
        o_in * k * k, cin, cout)
    # scatter new[idx[l, r]] = w[l]  <=>  gather new[p] = w[inv[p]]
    inv = np.empty_like(idx)
    for r in range(n_rot):
        inv[idx[:, r], r] = np.arange(idx.shape[0])
    outs = []
    for r in range(n_rot):
        wr = w[inv[:, r]].reshape(o_in, k, k, cin, cout)
        outs.append(jnp.transpose(wr, (1, 2, 3, 0, 4)).reshape(
            k, k, cin * o_in, cout))
    # (R, k, k, Cin*O_in, Cout) -> (k, k, Cin*O_in, Cout*R), R fastest
    stacked = jnp.stack(outs, axis=-1)                  # (..., cout, R)
    return stacked.reshape(k, k, cin * o_in, cout * n_rot)


def rotation_invariant_pool(x, n_orient: int = 8):
    """RotationInvariantPooling (``mmrotate/models/utils/ripool.py:18-23``):
    max over the orientation-fastest channel groups. NHWC."""
    shape = x.shape[:-1] + (x.shape[-1] // n_orient, n_orient)
    return jnp.max(x.reshape(shape), axis=-1)


def orientation_align(pooled, theta, num_orientations: int = 8):
    """Cyclic interpolation of orientation channels by each RoI's angle —
    the channel-alignment half of RiRoIAlign
    (``mmcv/.../riroi_align_rotated_cuda_kernel.cuh`` orientation loop).

    Args:
        pooled: (N, s, s, Cin*O), orientation-fastest channel grouping.
        theta: (N,) RoI angles in radians.
    """
    n, s, _, co = pooled.shape
    o = num_orientations
    cin = co // o
    p = pooled.reshape(n, s, s, cin, o)
    # fractional orientation shift = theta / (2*pi/O)
    shift = theta / (2 * np.pi / o)
    lo = jnp.floor(shift).astype(jnp.int32)
    frac = (shift - lo)[:, None, None, None, None]
    idx = (jnp.arange(o)[None] + lo[:, None]) % o     # (N, O)
    idx1 = (idx + 1) % o
    g0 = jnp.take_along_axis(
        p, idx[:, None, None, None, :].repeat(s, 1).repeat(s, 2)
        .repeat(cin, 3), axis=-1)
    g1 = jnp.take_along_axis(
        p, idx1[:, None, None, None, :].repeat(s, 1).repeat(s, 2)
        .repeat(cin, 3), axis=-1)
    out = (1 - frac) * g0 + frac * g1
    return out.reshape(n, s, s, co)


def riroi_align_rotated(features, rois, out_size: int,
                        spatial_scale: float, num_orientations: int = 8,
                        sample_num: int = 2):
    """Rotation-invariant RoIAlign (ReDet): rotated RoIAlign + cyclic
    interpolation of orientation channels by the RoI angle.

    Args:
        features: (B, H, W, Cin*O) with orientation-grouped channels.
        rois: (N, 6).
    """
    pooled = roi_align_rotated(features, rois, out_size, spatial_scale,
                               sample_num=sample_num, aligned=True,
                               clockwise=True)        # (N, s, s, Cin*O)
    return orientation_align(pooled, rois[:, 5], num_orientations)
