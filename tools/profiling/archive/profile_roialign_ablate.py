#!/usr/bin/env python
"""Ablate the fused Pallas RoI-align kernel's cost components on the
real TPU: full kernel vs stencil-skipped vs matmul-skipped vs DMA-only.
Identifies where the per-RoI time actually goes (docs/PERF.md)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from sm3det_tpu.ops.pallas.roi_align_kernel import (  # noqa: E402
    ALIGN, compute_patch_size, route_levels, _roundup)

N = 2000
C = 256
K = 8


def log(m):
    print(m, flush=True)


def make_kernel(patch, px, p, c, variant):
    def kernel(oy_ref, ox_ref, coords_ref, qy_ref, qx_ref, hbm_ref,
               out_ref, patches, sems):
        i = pl.program_id(0)
        n = pl.num_programs(0)

        def dma(slot, idx):
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
        tile = patches[i % 2].reshape(patch * px, c)

        if variant == "dmaonly":
            out_ref[0] = tile[:p].astype(jnp.float32)
            return

        if variant == "nostencil":
            w = qy_ref[...] + qx_ref[...]
            out_ref[0] = jnp.dot(w.astype(tile.dtype), tile,
                                 preferred_element_type=jnp.float32)
            return

        y = coords_ref[0, 0, :]
        x = coords_ref[0, 1, :]
        y0 = jnp.floor(y)
        x0 = jnp.floor(x)
        fy = (y - y0)[:, None]
        fx = (x - x0)[:, None]
        y0 = y0[:, None]
        x0 = x0[:, None]
        qy = qy_ref[...]
        qx = qx_ref[...]
        wy = jnp.where(qy == y0, 1.0 - fy, 0.0) + \
            jnp.where(qy == y0 + 1.0, fy, 0.0)
        wx = jnp.where(qx == x0, 1.0 - fx, 0.0) + \
            jnp.where(qx == x0 + 1.0, fx, 0.0)
        w = wy * wx
        if variant == "nomatmul":
            out_ref[0] = tile[:p].astype(jnp.float32) + \
                jnp.sum(w, axis=1, keepdims=True)
            return
        out_ref[0] = jnp.dot(w.astype(tile.dtype), tile,
                             preferred_element_type=jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("variant",))
def run(feats, rois, variant):
    out_size, g, sample_num, finest_scale = 7, 2, 2, 56
    featmap_strides = (4, 8, 16, 32)
    nb = feats[0].shape[0]
    c = feats[0].shape[-1]
    num_lvls = len(featmap_strides)
    heights = [f.shape[1] for f in feats]
    widths = [f.shape[2] for f in feats]
    n = rois.shape[0]
    p = (out_size * g) ** 2

    patch = compute_patch_size(heights, widths)
    px = patch + ALIGN
    slab_w = _roundup(max(max(widths), px), ALIGN)
    pad_heights = [max(h, patch) for h in heights]
    row_base = np.cumsum([0] + pad_heights[:-1])
    sum_h = int(sum(pad_heights))
    slab = jnp.concatenate(
        [jnp.pad(f, ((0, 0), (0, ph - f.shape[1]),
                     (0, slab_w - f.shape[2]), (0, 0)))
         for f, ph in zip(feats, pad_heights)], axis=1)
    slab = slab.reshape(nb * sum_h, slab_w, c)

    lvl = route_levels(rois, patch, featmap_strides, finest_scale,
                       num_lvls)
    stride = jnp.asarray(featmap_strides, jnp.float32)[lvl]
    lvl_h = jnp.asarray(heights, jnp.float32)[lvl]
    lvl_w = jnp.asarray(widths, jnp.float32)[lvl]
    lvl_hpad = jnp.asarray(pad_heights, jnp.float32)[lvl]
    base = jnp.asarray(row_base, jnp.float32)[lvl]

    inv = 1.0 / stride
    cx = rois[:, 1] * inv - 0.5
    cy = rois[:, 2] * inv - 0.5
    w_ = rois[:, 3] * inv
    h_ = rois[:, 4] * inv
    theta = -rois[:, 5]
    sub = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    ph_i = jnp.arange(out_size, dtype=jnp.float32)
    yy = (-h_ / 2)[:, None, None] + \
        (ph_i[None, :, None] + sub[None, None, :]) * \
        (h_ / out_size)[:, None, None]
    xx = (-w_ / 2)[:, None, None] + \
        (ph_i[None, :, None] + sub[None, None, :]) * \
        (w_ / out_size)[:, None, None]
    yy = yy[:, :, :, None, None]
    xx = xx[:, None, None, :, :]
    ct = jnp.cos(theta)[:, None, None, None, None]
    st = jnp.sin(theta)[:, None, None, None, None]
    y = (yy * ct + xx * st + cy[:, None, None, None, None]).reshape(n, p)
    x = (xx * ct - yy * st + cx[:, None, None, None, None]).reshape(n, p)
    oob = (y < -1.0) | (y > lvl_h[:, None]) | \
          (x < -1.0) | (x > lvl_w[:, None])
    y_cl = jnp.clip(y, 0.0, lvl_h[:, None] - 1.0)
    x_cl = jnp.clip(x, 0.0, lvl_w[:, None] - 1.0)
    oy_rel = jnp.clip(jnp.floor(cy) - patch // 2, 0.0, lvl_hpad - patch)
    ox = jnp.clip(jnp.floor(cx) - patch // 2, 0.0, float(slab_w - px))
    ox = jnp.floor(ox / ALIGN) * ALIGN
    batch = rois[:, 0].astype(jnp.float32)
    oy_abs = (batch * sum_h + base + oy_rel).astype(jnp.int32)
    ox_i = ox.astype(jnp.int32)
    y_rel = jnp.where(oob, -10.0, y_cl - oy_rel[:, None])
    x_rel = jnp.where(oob, -10.0, x_cl - ox[:, None])
    coords = jnp.stack([y_rel, x_rel], axis=1)

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
        make_kernel(patch, px, p, c, "full"
                    if variant not in ("dmaonly", "nostencil", "nomatmul")
                    else variant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, p, c), jnp.float32),
    )(oy_abs, ox_i, coords, qy_grid, qx_grid, slab)
    return jnp.sum(out) * 1e-9


def main():
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.rand(1, 800 // s, 800 // s, C)
                         .astype(np.float32)).astype(jnp.bfloat16)
             for s in (4, 8, 16, 32)]
    rois = np.concatenate([
        np.zeros((N, 1), np.float32),
        np.stack([rng.uniform(50, 750, N), rng.uniform(50, 750, N),
                  rng.uniform(10, 120, N), rng.uniform(8, 60, N),
                  rng.uniform(-1.5, 1.5, N)], -1).astype(np.float32)], -1)
    rois = jnp.asarray(rois)

    for variant in ("full", "nostencil", "nomatmul", "dmaonly"):
        fn = jax.jit(lambda c, r, v=variant: run(feats, r + c * 1e-9, v))
        c = float(fn(jnp.zeros(()), rois))
        t0 = time.perf_counter()
        cc = jnp.zeros(())
        for _ in range(K):
            cc = fn(cc, rois)
        _ = float(cc)
        dt = (time.perf_counter() - t0) / K * 1000
        log(f"{variant:12s} {dt:9.2f} ms/iter")


if __name__ == "__main__":
    main()
