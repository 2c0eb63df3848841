"""Pallas TPU kernel: fused multi-level rotated RoI align.

TPU-native replacement for the gather formulation in
``sm3det_tpu.ops.roi_align_rotated`` (itself the equivalent of the
reference CUDA op ``mmcv/mmcv/ops/csrc/common/cuda/
roi_align_rotated_cuda_kernel.cuh``). The jnp path issues ~1.6M
(1, 1, C) gathers for 2000 RoIs — descriptor-rate bound at ~18 ms on a
TPU chip (tools/profiling/archive/profile_roialign.py). This kernel restructures the op
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
                 compute_dtype, gsq: int, out_dtype,
                 n_buf: int = 2, group: int = 1):
    """Build the kernel for static (PATCH, PX, P, C).

    A RoI's (PATCH, PX, C) window is fetched with ONE strided DMA from
    the 3-D pyramid slab (row offset on the free outer dim; x offset
    ALIGN-aligned so Mosaic accepts the tiled-dim slice). Each grid
    step processes ``group`` RoIs: the TPU's ~1-2 us fixed grid-step
    cost dominates small-patch RoIs (their matmul is ~0.5 us), so
    grouping amortizes it; the group's DMAs are issued together, which
    also hides per-descriptor DMA latency. ``n_buf`` GROUPS are kept in
    flight (double-buffered by default)."""

    def kernel(oy_ref, ox_ref, coords_ref, qy_ref, qx_ref, hbm_ref,
               out_ref, patches, sems):
        i = pl.program_id(0)                  # group index
        n = pl.num_programs(0)

        def dma(slot, g, idx):
            # one strided window DMA per RoI: row offset is free (outer
            # dim), the x offset is ALIGN-aligned by the wrapper —
            # pl.multiple_of carries the proof to Mosaic
            ox = pl.multiple_of(ox_ref[idx], ALIGN)
            return pltpu.make_async_copy(
                hbm_ref.at[pl.ds(oy_ref[idx], patch), pl.ds(ox, px), :],
                patches.at[slot, g], sems.at[slot, g])

        for k in range(n_buf - 1):
            @pl.when((i == 0) & (k < n))
            def _(k=k):
                for g in range(group):
                    dma(k, g, k * group + g).start()

        nxt = i + n_buf - 1

        @pl.when(nxt < n)
        def _():
            for g in range(group):
                dma(nxt % n_buf, g, nxt * group + g).start()

        slot = i % n_buf
        qy = qy_ref[...]
        qx = qx_ref[...]
        for g in range(group):
            dma(slot, g, i * group + g).wait()
            # leading-dim collapse only (contiguity-preserving)
            tile = patches[slot, g].reshape(patch * px, c)
            y = coords_ref[g, 0, :]              # (P,) patch-relative
            x = coords_ref[g, 1, :]
            y0 = jnp.floor(y)
            x0 = jnp.floor(x)
            # f32 stencil arithmetic throughout (v5e has no bf16 vector
            # compare and mixing mask layouts trips Mosaic relayout);
            # qy/qx are precomputed (P, PATCH*PX) index grids, loaded
            # once (their BlockSpec maps every step to the same block).
            fy = (y - y0)[:, None]
            fx = (x - x0)[:, None]
            # out-of-bounds samples arrive poisoned (-10): both taps
            # miss
            wy = jnp.where(qy == y0[:, None], 1.0 - fy, 0.0) + \
                jnp.where(qy == y0[:, None] + 1.0, fy, 0.0)
            wx = jnp.where(qx == x0[:, None], 1.0 - fx, 0.0) + \
                jnp.where(qx == x0[:, None] + 1.0, fx, 0.0)
            w = wy * wx
            res = jnp.dot(w.astype(compute_dtype),
                          tile.astype(compute_dtype),
                          preferred_element_type=jnp.float32)
            # avg-pool the gsq sub-samples of each output bin HERE:
            # sample order is (ph, pw, gy, gx), so the pool is over the
            # contiguous minor group — emitting (out^2, C) pooled
            # directly keeps the f32 (N, P, C) sample tensor (2.4 GB at
            # batch-16 bench shapes) out of HBM entirely (it cost a
            # layout copy + reduce + convert downstream)
            res = res.reshape(p // gsq, gsq, c)
            acc = res[:, 0, :]
            for q in range(1, gsq):
                acc = acc + res[:, q, :]
            out_ref[g] = (acc * (1.0 / gsq)).astype(out_dtype)

    return kernel


def _slab_geometry(heights, widths, patch: int):
    """Static slab layout shared by the forward build and the backward
    un-build: (slab_w, pad_heights, row_base, sum_h)."""
    px = patch + ALIGN
    slab_w = _roundup(max(max(widths), px), ALIGN)
    pad_heights = [max(h, patch) for h in heights]
    row_base = np.cumsum([0] + pad_heights[:-1])
    sum_h = int(sum(pad_heights))
    return slab_w, pad_heights, row_base, sum_h


def _build_slab(feats, patch: int):
    """Row-concatenate the pyramid into one (B*sum_h, slab_w, C) slab.

    ``slab_w``/``pad_heights`` are sized for ``patch`` (the LARGEST
    patch that will sample from this slab, when shared by the bucketed
    variant's two kernel calls)."""
    nb = feats[0].shape[0]
    c = feats[0].shape[-1]
    heights = [f.shape[1] for f in feats]
    widths = [f.shape[2] for f in feats]
    slab_w, pad_heights, row_base, sum_h = _slab_geometry(
        heights, widths, patch)
    slab = jnp.concatenate(
        [jnp.pad(f, ((0, 0), (0, ph - f.shape[1]),
                     (0, slab_w - f.shape[2]), (0, 0)))
         for f, ph in zip(feats, pad_heights)], axis=1)
    slab = slab.reshape(nb * sum_h, slab_w, c)
    return slab, slab_w, pad_heights, row_base, sum_h


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
    heights = [f.shape[1] for f in feats]
    widths = [f.shape[2] for f in feats]
    # patch sized so ANY box fits at the coarsest level (image diagonal)
    patch = compute_patch_size(heights, widths)
    slab, slab_w, pad_heights, row_base, sum_h = _build_slab(
        feats, patch)
    return _align_core(
        slab, slab_w, pad_heights, row_base, sum_h,
        feats[0].shape[0], heights, widths, feats[0].dtype,
        rois, patch, out_size, featmap_strides, sample_num, aligned,
        clockwise, finest_scale, interpret)


def _roi_geometry(rois, patch, out_size, featmap_strides, sample_num,
                  aligned, clockwise, finest_scale, heights, widths,
                  pad_heights, row_base, sum_h, slab_w):
    """Per-RoI sampling geometry shared by the forward and backward
    kernels: window origins + patch-relative (poisoned) sample coords.

    Returns (oy_abs (N,) i32, ox_i (N,) i32, y_rel (N,P), x_rel (N,P)).
    """
    num_lvls = len(featmap_strides)
    n = rois.shape[0]
    g = sample_num
    p = (out_size * g) ** 2
    px = patch + ALIGN   # x extent widened so the DMA origin can align

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

    # sample grid in (ph, pw, gy, gx) order: the gsq=g*g sub-samples of
    # an output bin are CONTIGUOUS so the kernel can pool them in-place
    sub = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    ph_i = jnp.arange(out_size, dtype=jnp.float32)
    bin_h = h / out_size
    bin_w = w / out_size
    yy = (-h / 2)[:, None, None] + \
        (ph_i[None, :, None] + sub[None, None, :]) * bin_h[:, None, None]
    xx = (-w / 2)[:, None, None] + \
        (ph_i[None, :, None] + sub[None, None, :]) * bin_w[:, None, None]
    yy = yy[:, :, None, :, None]                 # (n, PH, _, GY, _)
    xx = xx[:, None, :, None, :]                 # (n, _, PW, _, GX)
    ct = jnp.cos(theta)[:, None, None, None, None]
    st = jnp.sin(theta)[:, None, None, None, None]
    y = (yy * ct + xx * st + cy[:, None, None, None, None]).reshape(n, p)
    x = (xx * ct - yy * st + cx[:, None, None, None, None]).reshape(n, p)

    # oob contributions are zero, exactly like the CUDA kernel's guard
    # (``y < -1 || y > h || x < -1 || x > w`` -> skip). Poison PER AXIS:
    # the kernel's w = wy*wx is zero whenever either factor is zero, so
    # axis-wise poisoning reproduces the joint guard exactly.
    oob_y = (y < -1.0) | (y > lvl_h[:, None])
    oob_x = (x < -1.0) | (x > lvl_w[:, None])
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

    y_rel = jnp.where(oob_y, -10.0, y_cl - oy_rel[:, None])
    x_rel = jnp.where(oob_x, -10.0, x_cl - ox[:, None])
    return oy_abs, ox_i, y_rel, x_rel


def _align_core(slab, slab_w, pad_heights, row_base, sum_h, nb,
                heights, widths, out_dtype, rois, patch, out_size,
                featmap_strides, sample_num, aligned, clockwise,
                finest_scale, interpret):
    c = slab.shape[-1]
    n = rois.shape[0]
    g = sample_num
    p = (out_size * g) ** 2
    px = patch + ALIGN

    oy_abs, ox_i, y_rel, x_rel = _roi_geometry(
        rois, patch, out_size, featmap_strides, sample_num, aligned,
        clockwise, finest_scale, heights, widths, pad_heights, row_base,
        sum_h, slab_w)
    coords = jnp.stack([y_rel, x_rel], axis=1)           # (N, 2, P)

    compute_dtype = slab.dtype if slab.dtype == jnp.bfloat16 \
        else jnp.float32
    # flat tap-index grids (q = qy*PX + qx), f32 for the vector compares
    itc = np.arange(patch * px, dtype=np.int64)
    qy_grid = jnp.asarray(np.broadcast_to(
        (itc // px).astype(np.float32), (p, patch * px)))
    qx_grid = jnp.asarray(np.broadcast_to(
        (itc % px).astype(np.float32), (p, patch * px)))
    # RoIs per grid step: amortize the ~1-2 us fixed step cost (the
    # dominant term for small patches) while bounding VMEM to ~2
    # double-buffered groups of windows
    win_bytes = patch * px * c * slab.dtype.itemsize
    group = max(1, min(8, (5 * 1024 * 1024 // 2) // max(win_bytes, 1)))
    n_buf = 2
    npad = _roundup(n, group)
    if npad != n:
        # padding RoIs replay window 0 and are sliced off below
        pad = npad - n
        oy_abs = jnp.concatenate([oy_abs, jnp.zeros(pad, jnp.int32)])
        ox_i = jnp.concatenate([ox_i, jnp.zeros(pad, jnp.int32)])
        coords = jnp.concatenate(
            [coords, jnp.full((pad, 2, p), -10.0, coords.dtype)])
    gsq = g * g
    pout = p // gsq                                       # out_size^2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(npad // group,),
        in_specs=[
            pl.BlockSpec((group, 2, p), lambda i, oy, ox: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, patch * px), lambda i, oy, ox: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, patch * px), lambda i, oy, ox: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((group, pout, c),
                               lambda i, oy, ox: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_buf, group, patch, px, c), slab.dtype),
            pltpu.SemaphoreType.DMA((n_buf, group)),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(patch, px, p, c, slab_w, compute_dtype, gsq,
                     out_dtype, n_buf=n_buf, group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((npad, pout, c), out_dtype),
        interpret=interpret,
    )(oy_abs, ox_i, coords, qy_grid, qx_grid, slab)[:n]

    return out.reshape(n, out_size, out_size, c)


@functools.partial(jax.jit, static_argnames=(
    "out_size", "featmap_strides", "sample_num", "aligned", "clockwise",
    "finest_scale", "small_patch", "big_k", "interpret"))
def roi_align_rotated_pyramid_fused_bucketed(
        feats, rois, out_size: int = 7,
        featmap_strides=(4, 8, 16, 32), sample_num: int = 2,
        aligned: bool = True, clockwise: bool = True,
        finest_scale: int = 56, small_patch: int = 16,
        big_k: int | None = None, interpret: bool = False):
    """Size-bucketed fused align: the worst-case patch (the sqrt-area
    rule can assign up to ~40 cells at a RoI's level) forces a ~1 MB
    window DMA and a (P, patch*px) matmul PER RoI, but small objects —
    the bulk of proposals on remote-sensing data — span far fewer. The
    ``big_k`` RoIs needing the most cells run the full-patch kernel;
    the rest run a ``small_patch`` kernel (~5x less DMA and MXU work).

    Exactness: RoIs are ranked by cells-at-routed-level, so every RoI
    whose diagonal exceeds ``small_patch - 3`` cells lands in the big
    bucket as long as there are at most ``big_k`` of them. A RoI that
    fits the small patch at its full-patch-routed level resolves to the
    SAME level inside the small kernel (the small extent clamp is
    sandwiched between the full clamp and the routed level) —
    identical sampling. If MORE than ``big_k`` RoIs need a big patch,
    the overflow RoIs (the smallest of the big class, by the ranking)
    are pushed one level coarser by the small kernel's extent clamp —
    the same graceful degradation the clamp already applies to
    ultra-elongated boxes, never an invalid read.
    """
    n = rois.shape[0]
    if big_k is None:
        # big-bucket share must scale with N (batched multi-image RoI
        # sets), or the per-image exactness margin shrinks with batch:
        # keep the tuned 1024-of-4000 (~25%) ratio as the default
        big_k = max(1024, n // 4)
    heights = [f.shape[1] for f in feats]
    widths = [f.shape[2] for f in feats]
    patch = compute_patch_size(heights, widths)
    if n <= big_k or small_patch >= patch:
        return roi_align_rotated_pyramid_fused(
            feats, rois, out_size, featmap_strides, sample_num,
            aligned, clockwise, finest_scale, interpret)

    slab, slab_w, pad_heights, row_base, sum_h = _build_slab(
        feats, patch)

    # cells needed at the full-patch routed level, descending
    lvl = route_levels(rois, patch, featmap_strides, finest_scale,
                       len(featmap_strides))
    stride = jnp.asarray(featmap_strides, jnp.float32)[lvl]
    diag_cells = jnp.sqrt(rois[:, 3] ** 2 + rois[:, 4] ** 2) / stride
    order = jnp.argsort(-diag_cells)
    inv = jnp.argsort(order)
    rois_sorted = rois[order]

    args = (out_size, featmap_strides, sample_num, aligned, clockwise,
            finest_scale, interpret)
    out_big = _align_core(
        slab, slab_w, pad_heights, row_base, sum_h, feats[0].shape[0],
        heights, widths, feats[0].dtype, rois_sorted[:big_k], patch,
        *args)
    out_small = _align_core(
        slab, slab_w, pad_heights, row_base, sum_h, feats[0].shape[0],
        heights, widths, feats[0].dtype, rois_sorted[big_k:],
        small_patch, *args)
    return jnp.concatenate([out_big, out_small], axis=0)[inv]


# --------------------------------------------------------------------------
# backward: feature gradients via windowed read-modify-write scatter
# --------------------------------------------------------------------------


def _make_bwd_kernel(patch, px, p, c, pout, gsq, kc, total,
                     compute_dtype):
    """Per grid step (one RoI): recompute the (patch*px, P) bilinear
    stencil transposed, matmul against the RoI's pooled output grads on
    the MXU, and accumulate the resulting window gradient into the f32
    grad slab with a read-modify-write DMA pair.

    Pipelined RMW: the window scratch is double-buffered and the wrapper
    prefetches a per-RoI ``conflict`` flag (window i overlaps window
    i-1). Only a conflicting step must wait for the previous write-back
    before reading — the common case (disjoint windows, the vast
    majority of sampled RoIs) overlaps step i's read+matmul with step
    i-1's write-back, instead of fully serializing every step. Each
    write semaphore is consumed exactly once: wr(j) is waited at step
    j+1 when conflict[j+1], else at step j+2 (slot reuse), with the
    tail handled after the last write is issued. Overlapping windows
    still accumulate exactly — a conflicting read never starts until
    the overlapping write has landed."""
    nchunks = patch // kc

    def kernel(oy_ref, ox_ref, conf_ref, coords_ref, g_ref, zeros_ref,
               dslab_ref, win0, win1, rsem, wsem0, wsem1):
        del zeros_ref                       # aliased with dslab_ref
        i = pl.program_id(0)
        even = jax.lax.rem(i, 2) == 0       # parity selects the buffer

        def rd(buf):
            ox = pl.multiple_of(ox_ref[i], ALIGN)
            return pltpu.make_async_copy(
                dslab_ref.at[pl.ds(oy_ref[i], patch), pl.ds(ox, px), :],
                buf, rsem)

        def wr(idx, buf, sem):
            ox = pl.multiple_of(ox_ref[idx], ALIGN)
            return pltpu.make_async_copy(
                buf, dslab_ref.at[pl.ds(oy_ref[idx], patch),
                                  pl.ds(ox, px), :], sem)

        def per_parity(fn):
            # static two-way specialization (Mosaic cannot DMA-slice a
            # dynamically indexed 4-D scratch with c < 128)
            @pl.when(even)
            def _():
                fn(win0, wsem0, win1, wsem1)

            @pl.when(jnp.logical_not(even))
            def _():
                fn(win1, wsem1, win0, wsem0)

        # overlap hazard: window i intersects window i-1 -> its write
        # must land before this read starts
        @pl.when((i > 0) & (conf_ref[i] == 1))
        def _():
            per_parity(lambda mybuf, mysem, obuf, osem:
                       wr(i - 1, obuf, osem).wait())

        # slot reuse: wr(i-2) wrote from this parity's buffer; wait it
        # here unless it was already consumed by step i-1's conflict wait
        # (index clamped: `&` doesn't short-circuit, so conf_ref[i-1]
        # would otherwise load SMEM index -1 on steps 0-1)
        @pl.when((i > 1) & (conf_ref[jnp.maximum(i - 1, 0)] == 0))
        def _():
            per_parity(lambda mybuf, mysem, obuf, osem:
                       wr(i - 2, mybuf, mysem).wait())

        per_parity(lambda mybuf, mysem, obuf, osem:
                   rd(mybuf).start())

        # stencil weights while the read flies (no DMA dependence)
        y = coords_ref[0, 0, :]
        x = coords_ref[0, 1, :]
        y0 = jnp.floor(y)
        x0 = jnp.floor(x)
        fy = y - y0
        fx = x - x0
        # column-tap weights (px, P): shared by every patch row
        # (int iota -> f32 convert: Mosaic has no float iota)
        qx = jax.lax.broadcasted_iota(
            jnp.int32, (px, p), 0).astype(jnp.float32)
        wx = jnp.where(qx == x0[None, :], 1.0 - fx[None, :], 0.0) + \
            jnp.where(qx == x0[None, :] + 1.0, fx[None, :], 0.0)
        wx = wx.astype(compute_dtype)
        # pooled grads -> per-sample grads: each of the gsq sub-samples
        # of a bin receives grad/gsq (the forward pooled with mean)
        gs = g_ref[0].astype(jnp.float32) * (1.0 / gsq)
        gs = jnp.broadcast_to(gs[:, None, :], (pout, gsq, c)) \
            .reshape(p, c).astype(compute_dtype)

        # whole-window gradient as register values (parity-independent)
        wgs = []
        for ck in range(nchunks):
            qy = jax.lax.broadcasted_iota(
                jnp.int32, (kc, 1, p), 0).astype(jnp.float32) \
                + float(ck * kc)
            wy = jnp.where(qy == y0[None, None, :],
                           1.0 - fy[None, None, :], 0.0) + \
                jnp.where(qy == y0[None, None, :] + 1.0,
                          fy[None, None, :], 0.0)
            wch = (wy.astype(compute_dtype) * wx[None]) \
                .reshape(kc * px, p)
            wg = jnp.dot(wch, gs, preferred_element_type=jnp.float32)
            wgs.append(wg.reshape(kc, px, c))

        def accum_and_write(mybuf, mysem, obuf, osem):
            rd(mybuf).wait()
            for ck in range(nchunks):
                mybuf[ck * kc:(ck + 1) * kc] = \
                    mybuf[ck * kc:(ck + 1) * kc] + wgs[ck]
            wr(i, mybuf, mysem).start()

        per_parity(accum_and_write)

        @pl.when(i == total - 1)
        def _():
            # drain: wr(i-1) unless step i's conflict wait consumed it
            @pl.when((i > 0) & (conf_ref[i] == 0))
            def _():
                per_parity(lambda mybuf, mysem, obuf, osem:
                           wr(i - 1, obuf, osem).wait())
            per_parity(lambda mybuf, mysem, obuf, osem:
                       wr(i, mybuf, mysem).wait())

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "out_size", "featmap_strides", "sample_num", "aligned", "clockwise",
    "finest_scale", "interpret"))
def roi_align_rotated_pyramid_fused_bwd(feats, rois, g, out_size: int = 7,
                                        featmap_strides=(4, 8, 16, 32),
                                        sample_num: int = 2,
                                        aligned: bool = True,
                                        clockwise: bool = True,
                                        finest_scale: int = 56,
                                        interpret: bool = False):
    """Feature gradients of the (unbucketed) fused pyramid align.

    The reference CUDA backward (``mmcv/mmcv/ops/csrc/common/cuda/
    roi_align_rotated_cuda_kernel.cuh``, backward kernel) atomicAdds
    each sample's 4 bilinear taps into the feature grad; XLA lowers the
    equivalent jnp VJP to row-serialized scatters (~59M rows/s: 14 ms/
    step at train shapes, device trace). This kernel restructures it
    the same way the forward was: per RoI, ONE (patch*px, P) @ (P, C)
    MXU matmul forms the whole window gradient, which is accumulated
    into the grad slab with a serialized read-modify-write window DMA.

    Args:
        feats: per-level (B, H_l, W_l, C) — shapes/dtypes only.
        rois: (N, 6) as in the forward.
        g: (N, out_size, out_size, C) cotangent of the pooled output.

    Returns:
        tuple of per-level gradients, dtype of each ``feats[l]``.
    """
    heights = [f.shape[1] for f in feats]
    widths = [f.shape[2] for f in feats]
    patch = compute_patch_size(heights, widths)
    px = patch + ALIGN
    slab_w, pad_heights, row_base, sum_h = _slab_geometry(
        heights, widths, patch)
    nb = feats[0].shape[0]
    c = feats[0].shape[-1]
    n = rois.shape[0]
    gsq = sample_num * sample_num
    pout = out_size * out_size
    p = pout * gsq

    oy_abs, ox_i, y_rel, x_rel = _roi_geometry(
        rois, patch, out_size, featmap_strides, sample_num, aligned,
        clockwise, finest_scale, heights, widths, pad_heights, row_base,
        sum_h, slab_w)
    coords = jnp.stack([y_rel, x_rel], axis=1)

    compute_dtype = jnp.bfloat16 if feats[0].dtype == jnp.bfloat16 \
        else jnp.float32              # matches the forward's matmul dtype
    g2 = g.reshape(n, pout, c)
    dslab0 = jnp.zeros((nb * sum_h, slab_w, c), jnp.float32)

    # per-RoI conflict flag: does window i overlap window i-1?  Only
    # those steps must serialize on the previous write-back (the kernel
    # pipelines the rest) — on sampled detection RoIs most consecutive
    # windows are disjoint
    dy = jnp.abs(oy_abs[1:] - oy_abs[:-1])
    dx = jnp.abs(ox_i[1:] - ox_i[:-1])
    conf = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        ((dy < patch) & (dx < px)).astype(jnp.int32)])

    kc = 8                            # patch is always a multiple of 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 2, p), lambda i, oy, ox, cf: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pout, c), lambda i, oy, ox, cf: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),       # zeros (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((patch, px, c), jnp.float32),
            pltpu.VMEM((patch, px, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    dslab = pl.pallas_call(
        _make_bwd_kernel(patch, px, p, c, pout, gsq, kc, n,
                         compute_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * sum_h, slab_w, c),
                                       jnp.float32),
        input_output_aliases={5: 0},
        interpret=interpret,
    )(oy_abs, ox_i, conf, coords, g2, dslab0)

    ds = dslab.reshape(nb, sum_h, slab_w, c)
    grads = []
    row = 0
    for (h, w_), ph, f in zip(zip(heights, widths), pad_heights, feats):
        grads.append(ds[:, row:row + h, :w_, :].astype(f.dtype))
        row += ph
    return tuple(grads)
