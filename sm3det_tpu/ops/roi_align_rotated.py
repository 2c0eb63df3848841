"""Rotated RoI Align (pure jnp gather + bilinear; differentiable for free).

TPU-native equivalent of the reference CUDA op
(``mmcv/mmcv/ops/csrc/common/cuda/roi_align_rotated_cuda_kernel.cuh:1-202``):
for each RoI ``(batch_idx, cx, cy, w, h, theta)`` a ``out*out`` grid of
``sample*sample`` points is rotated into the feature map and bilinearly
interpolated, then averaged per bin. The JAX formulation computes all sample
coordinates for a whole RoI batch at once and uses one fused 4-tap gather —
the backward pass (scatter-add) comes from autodiff, matching the hand-
written CUDA backward.

Layout: features are NHWC (TPU-native); rois carry explicit batch indices so
one call serves a whole per-modality sub-batch.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _bilinear_gather(feat, y, x):
    """feat (H, W, C); y, x arbitrary equal shapes -> (..., C)."""
    h, w = feat.shape[0], feat.shape[1]
    # Out-of-bounds samples contribute zero (matches the CUDA kernel's
    # y < -1 / y > height guard).
    oob = (y < -1.0) | (y > h * 1.0) | (x < -1.0) | (x > w * 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (y - y0.astype(y.dtype))[..., None]
    lx = (x - x0.astype(x.dtype))[..., None]
    hy, hx = 1.0 - ly, 1.0 - lx
    v00 = feat[y0, x0]
    v01 = feat[y0, x1]
    v10 = feat[y1, x0]
    v11 = feat[y1, x1]
    out = hy * hx * v00 + hy * lx * v01 + ly * hx * v10 + ly * lx * v11
    return jnp.where(oob[..., None], 0.0, out)


def roi_align_rotated(features, rois, out_size: int, spatial_scale: float,
                      sample_num: int = 2, aligned: bool = True,
                      clockwise: bool = True):
    """Rotated RoI align.

    Args:
        features: (B, H, W, C).
        rois: (N, 6) ``(batch_idx, cx, cy, w, h, theta)`` in image coords.
        out_size: pooled output resolution (e.g. 7).
        spatial_scale: feature stride reciprocal (e.g. 1/8).
        sample_num: sampling grid per bin edge (config uses 2).

    Returns:
        (N, out_size, out_size, C) pooled features.
    """
    n = rois.shape[0]
    offset = 0.5 if aligned else 0.0
    cx = rois[:, 1] * spatial_scale - offset
    cy = rois[:, 2] * spatial_scale - offset
    w = rois[:, 3] * spatial_scale
    h = rois[:, 4] * spatial_scale
    theta = rois[:, 5]
    if clockwise:
        theta = -theta
    if not aligned:
        w = jnp.maximum(w, 1.0)
        h = jnp.maximum(h, 1.0)

    bin_h = h / out_size
    bin_w = w / out_size
    g = sample_num
    # sample offsets within a bin: (iy + .5) / g for iy in range(g)
    sub = (jnp.arange(g, dtype=rois.dtype) + 0.5) / g           # (g,)
    ph = jnp.arange(out_size, dtype=rois.dtype)                  # (out,)
    # local coords before rotation, per roi: (N, out, g)
    yy = (-h / 2)[:, None, None] + \
        (ph[None, :, None] + sub[None, None, :]) * bin_h[:, None, None]
    xx = (-w / 2)[:, None, None] + \
        (ph[None, :, None] + sub[None, None, :]) * bin_w[:, None, None]
    # full grid: (N, out, g, out, g)
    yy = yy[:, :, :, None, None]
    xx = xx[:, None, None, :, :]
    cos_t = jnp.cos(theta)[:, None, None, None, None]
    sin_t = jnp.sin(theta)[:, None, None, None, None]
    y = yy * cos_t + xx * sin_t + cy[:, None, None, None, None]
    x = xx * cos_t - yy * sin_t + cx[:, None, None, None, None]

    batch_idx = rois[:, 0].astype(jnp.int32)

    # gather from per-roi source image: (N, out, g, out, g, C)
    num_images = features.shape[0]
    if num_images == 1:
        vals = _bilinear_gather(features[0], y, x)
    else:
        # one gather with flattened batch offset: fold batch into rows
        bh, bw = features.shape[1], features.shape[2]
        flat = features.reshape(num_images * bh, bw, -1)
        y_off = y + (batch_idx * bh)[:, None, None, None, None]
        # guard: clip within the roi's own image rows
        y_lo = (batch_idx * bh)[:, None, None, None, None]
        oob = (y < -1.0) | (y > bh * 1.0)
        y_off = jnp.clip(y_off, y_lo, y_lo + bh - 1)
        vals = _bilinear_gather(flat, y_off, x)
        vals = jnp.where(oob[..., None], 0.0, vals)

    pooled = vals.mean(axis=(2, 4))                              # (N,out,out,C)
    return pooled


def roi_align_rotated_pyramid(feats, rois, target_lvls, out_size: int,
                              featmap_strides=(4, 8, 16, 32),
                              sample_num: int = 2, aligned: bool = True,
                              clockwise: bool = True):
    """Single-pass multi-level rotated RoI align.

    All levels are row-concatenated into one (B, sumH, maxW, C) buffer;
    each RoI's sample coordinates are scaled by ITS level's stride and
    shifted by the level's row offset, so one fused gather serves the
    whole pyramid (vs. aligning on every level and masking — 4x traffic).

    Args:
        feats: per-level (B, H_l, W_l, C), same B and C.
        rois: (N, 6) (batch_idx, cx, cy, w, h, theta) image coords.
        target_lvls: (N,) int32 level per RoI.
    """
    nb = feats[0].shape[0]
    ch = feats[0].shape[-1]
    heights = [f.shape[1] for f in feats]
    widths = [f.shape[2] for f in feats]
    max_w = max(widths)
    padded = [jnp.pad(f, ((0, 0), (0, 0), (0, max_w - f.shape[2]),
                          (0, 0))) for f in feats]
    stacked = jnp.concatenate(padded, axis=1)       # (B, sumH, maxW, C)
    row_offsets = np.cumsum([0] + heights[:-1])

    lvl_stride = jnp.asarray(featmap_strides, jnp.float32)[target_lvls]
    lvl_off = jnp.asarray(row_offsets, jnp.float32)[target_lvls]
    lvl_h = jnp.asarray(heights, jnp.float32)[target_lvls]
    lvl_w = jnp.asarray(widths, jnp.float32)[target_lvls]

    offset = 0.5 if aligned else 0.0
    inv = 1.0 / lvl_stride
    cx = rois[:, 1] * inv - offset
    cy = rois[:, 2] * inv - offset
    w = rois[:, 3] * inv
    h = rois[:, 4] * inv
    theta = -rois[:, 5] if clockwise else rois[:, 5]

    g = sample_num
    sub = (jnp.arange(g, dtype=rois.dtype) + 0.5) / g
    ph = jnp.arange(out_size, dtype=rois.dtype)
    bin_h = h / out_size
    bin_w = w / out_size
    yy = (-h / 2)[:, None, None] + \
        (ph[None, :, None] + sub[None, None, :]) * bin_h[:, None, None]
    xx = (-w / 2)[:, None, None] + \
        (ph[None, :, None] + sub[None, None, :]) * bin_w[:, None, None]
    yy = yy[:, :, :, None, None]
    xx = xx[:, None, None, :, :]
    cos_t = jnp.cos(theta)[:, None, None, None, None]
    sin_t = jnp.sin(theta)[:, None, None, None, None]
    y = yy * cos_t + xx * sin_t + cy[:, None, None, None, None]
    x = xx * cos_t - yy * sin_t + cx[:, None, None, None, None]

    def expand(v):
        return v[:, None, None, None, None]

    # out-of-level-bounds guard (per-roi level extents)
    oob = (y < -1.0) | (y > expand(lvl_h)) | \
          (x < -1.0) | (x > expand(lvl_w))
    y = jnp.clip(y, 0.0, expand(lvl_h) - 1.0)
    x = jnp.clip(x, 0.0, expand(lvl_w) - 1.0)

    # fold batch + level-row offset into the row coordinate
    batch_idx = rois[:, 0].astype(jnp.int32)
    sum_h = stacked.shape[1]
    flat = stacked.reshape(nb * sum_h, max_w, ch)
    row_base = batch_idx.astype(jnp.float32) * sum_h + lvl_off
    y_lo = expand(row_base)
    y_hi = y_lo + expand(lvl_h) - 1.0
    yf = jnp.clip(y + y_lo, y_lo, y_hi)

    y0 = jnp.floor(yf).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, nb * sum_h - 1)
    x1 = jnp.minimum(x0 + 1, max_w - 1)
    ly = (yf - y0.astype(yf.dtype))[..., None]
    lx = (x - x0.astype(x.dtype))[..., None]
    hy, hx = 1.0 - ly, 1.0 - lx
    vals = hy * hx * flat[y0, x0] + hy * lx * flat[y0, x1] + \
        ly * hx * flat[y1, x0] + ly * lx * flat[y1, x1]
    vals = jnp.where(oob[..., None], 0.0, vals)
    return vals.mean(axis=(2, 4))                   # (N, out, out, C)
