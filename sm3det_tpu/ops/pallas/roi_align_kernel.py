"""Pallas TPU kernel: fused multi-level rotated RoI align.

TPU-native replacement for the gather formulation in
``sm3det_tpu.ops.roi_align_rotated`` (itself the equivalent of the
reference CUDA op ``mmcv/mmcv/ops/csrc/common/cuda/
roi_align_rotated_cuda_kernel.cuh``). The jnp path issues ~1.6M
(1, 1, C) gathers for 2000 RoIs — descriptor-rate bound at ~18 ms on a
TPU chip (tools/profile_roialign.py). This kernel restructures the op
around the two things the hardware does fast:

- **DMA**: each RoI's rotated footprint is covered by ONE static
  ``(PATCH, PATCH, C)`` window of its pyramid level; the kernel streams
  these windows HBM -> VMEM with a double-buffered async copy whose
  origin comes from scalar-prefetched per-RoI offsets (2000 descriptors
  instead of 1.6M).
- **MXU**: the ``(out*g)^2`` bilinear samples of a RoI are one
  ``(P, PATCH^2) @ (PATCH^2, C)`` matmul against the flattened patch,
  with the 4-tap interpolation weights built on the VPU from a
  separable two-tap row/column one-hot outer product.

Level routing: ``map_roi_levels`` (sqrt-area rule,
``mmrotate/models/roi_heads/roi_extractors/rotate_single_level_roi_extractor.py:63``)
plus an **extent clamp**: a RoI whose rotated diagonal exceeds the patch
coverage at its assigned level is sampled from the first coarser level
that fits (only ultra-elongated boxes move; the patch is sized so every
box fits at the coarsest level). This is the one deliberate deviation
from the reference's heuristic — required for static shapes — and it is
disabled in the exact jnp path used as the correctness oracle
(tests/test_pallas_kernels.py asserts parity on in-coverage boxes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roundup(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def compute_patch_size(heights, widths) -> int:
    """Static patch edge: the coarsest level's diagonal (every box fits
    there) plus bilinear/rounding margin, rounded to sublane multiples."""
    diag_coarse = int(np.ceil(np.hypot(heights[-1], widths[-1])))
    return max(_roundup(diag_coarse + 3, 8), 8)


def route_levels(rois, patch: int, featmap_strides, finest_scale: int,
                 num_lvls: int):
    """sqrt-area level rule (``rotate_single_level_roi_extractor.py:63``)
    plus the extent clamp that guarantees a RoI's rotated diagonal fits
    the static patch at its sampling level."""
    scale = jnp.sqrt(jnp.maximum(rois[:, 3] * rois[:, 4], 1e-6))
    lvl = jnp.clip(jnp.floor(jnp.log2(scale / finest_scale + 1e-6)),
                   0, num_lvls - 1).astype(jnp.int32)
    diag_px = jnp.sqrt(rois[:, 3] ** 2 + rois[:, 4] ** 2)
    lvl_min = jnp.ceil(jnp.log2(jnp.maximum(
        diag_px / ((patch - 3) * featmap_strides[0]), 1e-6)))
    lvl_min = jnp.clip(lvl_min, 0, num_lvls - 1).astype(jnp.int32)
    return jnp.maximum(lvl, lvl_min)


ALIGN = 16   # HBM row-tile alignment for dynamic DMA origins (bf16: 16)


def _make_kernel(patch: int, px: int, p: int, c: int, slab_w: int,
                 compute_dtype):
    """Build the per-RoI kernel for static (PATCH, PX, P, C).

    A RoI's (PATCH, PX, C) window is fetched with ONE strided DMA from
    the 3-D pyramid slab (row offset on the free outer dim; x offset
    ALIGN-aligned so Mosaic accepts the tiled-dim slice), double-buffered
    across grid steps."""

    def kernel(oy_ref, ox_ref, coords_ref, qy_ref, qx_ref, hbm_ref,
               out_ref, patches, sems):
        i = pl.program_id(0)
        n = pl.num_programs(0)

        def dma(slot, idx):
            # one strided window DMA per RoI: row offset is free (outer
            # dim), the x offset is ALIGN-aligned by the wrapper —
            # pl.multiple_of carries the proof to Mosaic
            ox = pl.multiple_of(ox_ref[idx], ALIGN)
            return pltpu.make_async_copy(
                hbm_ref.at[pl.ds(oy_ref[idx], patch), pl.ds(ox, px), :],
                patches.at[slot], sems.at[slot])

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

        @pl.when(i + 1 < n)
        def _():
            dma((i + 1) % 2, i + 1).start()

        dma(i % 2, i).wait()
        # leading-dim collapse only (contiguity-preserving for Mosaic)
        tile = patches[i % 2].reshape(patch * px, c)

        y = coords_ref[0, 0, :]                      # (P,) patch-relative
        x = coords_ref[0, 1, :]
        y0 = jnp.floor(y)
        x0 = jnp.floor(x)
        # f32 stencil arithmetic throughout (v5e has no bf16 vector
        # compare and mixing mask layouts trips Mosaic relayout); qy/qx
        # are precomputed (P, PATCH*PX) index grids, loaded once (the
        # BlockSpec maps every grid step to the same block).
        fy = (y - y0)[:, None]
        fx = (x - x0)[:, None]
        y0 = y0[:, None]
        x0 = x0[:, None]
        qy = qy_ref[...]
        qx = qx_ref[...]
        # out-of-bounds samples arrive poisoned (-10): both taps miss
        wy = jnp.where(qy == y0, 1.0 - fy, 0.0) + \
            jnp.where(qy == y0 + 1.0, fy, 0.0)
        wx = jnp.where(qx == x0, 1.0 - fx, 0.0) + \
            jnp.where(qx == x0 + 1.0, fx, 0.0)
        w = wy * wx
        out_ref[0] = jnp.dot(w.astype(compute_dtype),
                             tile.astype(compute_dtype),
                             preferred_element_type=jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "out_size", "featmap_strides", "sample_num", "aligned", "clockwise",
    "finest_scale", "interpret"))
def roi_align_rotated_pyramid_fused(feats, rois, out_size: int = 7,
                                    featmap_strides=(4, 8, 16, 32),
                                    sample_num: int = 2,
                                    aligned: bool = True,
                                    clockwise: bool = True,
                                    finest_scale: int = 56,
                                    interpret: bool = False):
    """Fused pyramid rotated RoI align (level routing included).

    Args:
        feats: per-level (B, H_l, W_l, C), same B and C.
        rois: (N, 6) ``(batch_idx, cx, cy, w, h, theta)`` image coords.

    Returns:
        (N, out_size, out_size, C) pooled features, ``feats[0].dtype``.
    """
    nb = feats[0].shape[0]
    c = feats[0].shape[-1]
    num_lvls = len(featmap_strides)
    heights = [f.shape[1] for f in feats]
    widths = [f.shape[2] for f in feats]
    n = rois.shape[0]
    g = sample_num
    p = (out_size * g) ** 2

    # patch sized so ANY box fits at the coarsest level (image diagonal)
    patch = compute_patch_size(heights, widths)
    px = patch + ALIGN   # x extent widened so the DMA origin can align
    slab_w = _roundup(max(max(widths), px), ALIGN)
    pad_heights = [max(h, patch) for h in heights]
    row_base = np.cumsum([0] + pad_heights[:-1])
    sum_h = int(sum(pad_heights))

    slab = jnp.concatenate(
        [jnp.pad(f, ((0, 0), (0, ph - f.shape[1]),
                     (0, slab_w - f.shape[2]), (0, 0)))
         for f, ph in zip(feats, pad_heights)], axis=1)
    slab = slab.reshape(nb * sum_h, slab_w, c)

    # ---- level routing: sqrt-area rule + extent clamp -------------------
    lvl = route_levels(rois, patch, featmap_strides, finest_scale,
                       num_lvls)

    stride = jnp.asarray(featmap_strides, jnp.float32)[lvl]
    lvl_h = jnp.asarray(heights, jnp.float32)[lvl]
    lvl_w = jnp.asarray(widths, jnp.float32)[lvl]
    lvl_hpad = jnp.asarray(pad_heights, jnp.float32)[lvl]
    base = jnp.asarray(row_base, jnp.float32)[lvl]

    offset = 0.5 if aligned else 0.0
    inv = 1.0 / stride
    cx = rois[:, 1] * inv - offset
    cy = rois[:, 2] * inv - offset
    w = rois[:, 3] * inv
    h = rois[:, 4] * inv
    theta = -rois[:, 5] if clockwise else rois[:, 5]

    # sample grid, same ordering as the exact path: (out, g, out, g)
    sub = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    ph_i = jnp.arange(out_size, dtype=jnp.float32)
    bin_h = h / out_size
    bin_w = w / out_size
    yy = (-h / 2)[:, None, None] + \
        (ph_i[None, :, None] + sub[None, None, :]) * bin_h[:, None, None]
    xx = (-w / 2)[:, None, None] + \
        (ph_i[None, :, None] + sub[None, None, :]) * bin_w[:, None, None]
    yy = yy[:, :, :, None, None]
    xx = xx[:, None, None, :, :]
    ct = jnp.cos(theta)[:, None, None, None, None]
    st = jnp.sin(theta)[:, None, None, None, None]
    y = (yy * ct + xx * st + cy[:, None, None, None, None]).reshape(n, p)
    x = (xx * ct - yy * st + cx[:, None, None, None, None]).reshape(n, p)

    # oob contributions are zero, exactly like the CUDA kernel's guard
    oob = (y < -1.0) | (y > lvl_h[:, None]) | \
          (x < -1.0) | (x > lvl_w[:, None])
    y_cl = jnp.clip(y, 0.0, lvl_h[:, None] - 1.0)
    x_cl = jnp.clip(x, 0.0, lvl_w[:, None] - 1.0)

    # per-RoI patch origin, clamped inside the RoI's (padded) level rows;
    # the x origin is rounded DOWN to the DMA tile alignment (the widened
    # px extent keeps coverage)
    oy_rel = jnp.clip(jnp.floor(cy) - patch // 2, 0.0, lvl_hpad - patch)
    ox = jnp.clip(jnp.floor(cx) - patch // 2, 0.0, float(slab_w - px))
    ox = jnp.floor(ox / ALIGN) * ALIGN
    batch = rois[:, 0].astype(jnp.float32)
    oy_abs = (batch * sum_h + base + oy_rel).astype(jnp.int32)
    ox_i = ox.astype(jnp.int32)

    y_rel = jnp.where(oob, -10.0, y_cl - oy_rel[:, None])
    x_rel = jnp.where(oob, -10.0, x_cl - ox[:, None])
    coords = jnp.stack([y_rel, x_rel], axis=1)           # (N, 2, P)

    compute_dtype = slab.dtype if slab.dtype == jnp.bfloat16 \
        else jnp.float32
    # flat tap-index grids (q = qy*PX + qx), f32 for the vector compares
    itc = np.arange(patch * px, dtype=np.int64)
    qy_grid = jnp.asarray(np.broadcast_to(
        (itc // px).astype(np.float32), (p, patch * px)))
    qx_grid = jnp.asarray(np.broadcast_to(
        (itc % px).astype(np.float32), (p, patch * px)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 2, p), lambda i, oy, ox: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, patch * px), lambda i, oy, ox: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, patch * px), lambda i, oy, ox: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, p, c), lambda i, oy, ox: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, patch, px, c), slab.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(patch, px, p, c, slab_w, compute_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, p, c), jnp.float32),
        interpret=interpret,
    )(oy_abs, ox_i, coords, qy_grid, qx_grid, slab)

    pooled = out.reshape(n, out_size, g, out_size, g, c).mean(axis=(2, 4))
    return pooled.astype(feats[0].dtype)
