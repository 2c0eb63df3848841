"""Multi-Scale Deformable Attention sampling (TPU-native jnp).

Replaces the reference CUDA op (``mmcv/.../ms_deform_attn_cuda.cu:351`` /
``ms_deform_attn_cuda_kernel.cuh:801``) used by the ViT-Adapter
(``mmrotate/models/backbones/adapter_modules.py``): for each query, sample
``num_points`` bilinear taps from every feature level at predicted
locations and combine with softmax attention weights. Autodiff provides
the backward (the CUDA backward is hand-written).

Layout: value is a concatenation of flattened levels (TPU-friendly single
gather source); sampling grid in normalized [0, 1] coordinates.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def ms_deform_attn(value, value_spatial_shapes, sampling_locations,
                   attention_weights):
    """
    Args:
        value: (B, sum(H*W), num_heads, head_dim).
        value_spatial_shapes: static list of (H, W) per level.
        sampling_locations: (B, Q, num_heads, L, P, 2) in [0, 1].
        attention_weights: (B, Q, num_heads, L, P), softmaxed over L*P.

    Returns:
        (B, Q, num_heads * head_dim).
    """
    b, _, nh, hd = value.shape
    q = sampling_locations.shape[1]
    levels = len(value_spatial_shapes)

    out = jnp.zeros((b, q, nh, hd), value.dtype)
    start = 0
    for lvl, (h, w) in enumerate(value_spatial_shapes):
        v = value[:, start:start + h * w]              # (B, H*W, nh, hd)
        v = v.reshape(b, h, w, nh, hd).transpose(0, 3, 1, 2, 4)
        loc = sampling_locations[:, :, :, lvl]         # (B, Q, nh, P, 2)
        x = (loc[..., 0] * w - 0.5).transpose(0, 2, 1, 3)  # (B, nh, Q, P)
        y = (loc[..., 1] * h - 0.5).transpose(0, 2, 1, 3)

        def bilinear(feat, yy, xx):
            # feat (H, W, hd); yy/xx (Q, P)
            oob = (yy < -1.0) | (yy > h * 1.0) | \
                  (xx < -1.0) | (xx > w * 1.0)
            yy = jnp.clip(yy, 0.0, h - 1.0)
            xx = jnp.clip(xx, 0.0, w - 1.0)
            y0 = jnp.floor(yy).astype(jnp.int32)
            x0 = jnp.floor(xx).astype(jnp.int32)
            y1 = jnp.minimum(y0 + 1, h - 1)
            x1 = jnp.minimum(x0 + 1, w - 1)
            ly = (yy - y0)[..., None]
            lx = (xx - x0)[..., None]
            res = (1 - ly) * (1 - lx) * feat[y0, x0] + \
                (1 - ly) * lx * feat[y0, x1] + \
                ly * (1 - lx) * feat[y1, x0] + \
                ly * lx * feat[y1, x1]
            return jnp.where(oob[..., None], 0.0, res)

        sampled = jax.vmap(jax.vmap(bilinear))(v, y, x)  # (B,nh,Q,P,hd)
        sampled = sampled.transpose(0, 2, 1, 3, 4)       # (B,Q,nh,P,hd)
        wgt = attention_weights[:, :, :, lvl][..., None]
        out = out + jnp.sum(sampled * wgt, axis=3)
        start += h * w
    return out.reshape(b, q, nh * hd)
