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
    n, s, _, co = pooled.shape
    o = num_orientations
    cin = co // o
    p = pooled.reshape(n, s, s, cin, o)
    # fractional orientation shift = theta / (2*pi/O)
    theta = rois[:, 5]
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
