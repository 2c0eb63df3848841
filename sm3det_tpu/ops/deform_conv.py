"""Deformable convolution v1/v2 (jnp, autodiff backward).

TPU-native replacement for the mmcv CUDA ops ``deform_conv`` /
``modulated_deform_conv`` (zoo backbone DCN options, SURVEY.md §2.4
Tier B): offsets shift each kernel tap's sampling location; v2 adds a
per-tap modulation mask. Implemented as kernel-tap bilinear gathers +
one einsum — taps unroll at trace time (k*k is small and static).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear(feat, y, x):
    """feat (H, W, C); y/x (...,) -> (..., C), true zero padding: each of
    the 4 taps contributes only if it lies inside the feature map (the
    CUDA dcn bilinear contract)."""
    h, w = feat.shape[0], feat.shape[1]
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    ly = (y - y0)[..., None]
    lx = (x - x0)[..., None]
    out = 0.0
    for dy, wy in ((0, 1 - ly), (1, ly)):
        for dx, wx in ((0, 1 - lx), (1, lx)):
            yy = y0 + dy
            xx = x0 + dx
            valid = ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w))
            v = feat[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
            out = out + wy * wx * jnp.where(valid[..., None], v, 0.0)
    return out


def deform_conv2d(x, offset, weight, mask=None, stride: int = 1,
                  padding: int = 1, dilation: int = 1):
    """
    Args:
        x: (B, H, W, Cin).
        offset: (B, Ho, Wo, 2*k*k) per-tap (dy, dx) offsets.
        weight: (k, k, Cin, Cout).
        mask: optional (B, Ho, Wo, k*k) modulation (DCNv2).

    Returns:
        (B, Ho, Wo, Cout).
    """
    b, h, w, cin = x.shape
    k = weight.shape[0]
    ho = (h + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (k - 1) - 1) // stride + 1

    ys = jnp.arange(ho) * stride - padding
    xs = jnp.arange(wo) * stride - padding
    gy, gx = jnp.meshgrid(ys.astype(jnp.float32),
                          xs.astype(jnp.float32), indexing="ij")

    cols = []
    for i in range(k):
        for j in range(k):
            t = i * k + j
            dy = offset[..., 2 * t]
            dx = offset[..., 2 * t + 1]
            sy = gy[None] + i * dilation + dy
            sx = gx[None] + j * dilation + dx
            v = jax.vmap(_bilinear)(x, sy, sx)       # (B, Ho, Wo, Cin)
            if mask is not None:
                v = v * mask[..., t:t + 1]
            cols.append(v)
    col = jnp.stack(cols, axis=-2)                   # (B,Ho,Wo,k*k,Cin)
    wmat = weight.reshape(k * k, cin, -1)
    return jnp.einsum("bhwtc,tcd->bhwd", col, wmat,
                      preferred_element_type=jnp.float32)
