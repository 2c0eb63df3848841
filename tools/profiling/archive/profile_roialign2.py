#!/usr/bin/env python
"""Decompose the patch+einsum RoI-align variant: patch extraction vs
sampling einsum, plus extraction strategies (gather / vmapped
dynamic_slice / Pallas DMA)."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

K = 8
N = 2000
OUT = 7
G = 2
C = 256
PATCH = 40
P = OUT * G * OUT * G   # 196 sample points


def log(m):
    print(m, flush=True)


def timed(name, fn, *args):
    fn = jax.jit(fn)
    c = float(fn(jnp.zeros(()), *args))
    t0 = time.perf_counter()
    cc = jnp.zeros(())
    for _ in range(K):
        cc = fn(cc, *args)
    _ = float(cc)
    dt = (time.perf_counter() - t0) / K * 1000
    log(f"{name:56s} {dt:9.2f} ms/iter")
    return dt


def main():
    rng = np.random.RandomState(0)
    sum_h = sum(800 // s for s in (4, 8, 16, 32))   # 375
    flat = jnp.asarray(rng.rand(sum_h, 200, C).astype(np.float32)
                       ).astype(jnp.bfloat16)
    oy = jnp.asarray(rng.randint(0, sum_h - PATCH, N), jnp.int32)
    ox = jnp.asarray(rng.randint(0, 200 - PATCH, N), jnp.int32)

    # 1. patch extraction via lax.gather (slice mode)
    def extract_gather(c, oy, ox):
        oy = oy + (c * 0).astype(jnp.int32)
        start = jnp.stack([oy, ox], -1)
        p = jax.lax.gather(
            flat, start,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1)),
            slice_sizes=(PATCH, PATCH, C), mode="clip")
        return c + jnp.sum(p.astype(jnp.float32)) * 1e-6

    timed("patch extract: lax.gather (40,40,C) x2000", extract_gather,
          oy, ox)

    # 2. patch extraction via vmapped dynamic_slice
    def extract_dynslice(c, oy, ox):
        oy = oy + (c * 0).astype(jnp.int32)

        def one(yy, xx):
            return jax.lax.dynamic_slice(flat, (yy, xx, 0),
                                         (PATCH, PATCH, C))
        p = jax.vmap(one)(oy, ox)
        return c + jnp.sum(p.astype(jnp.float32)) * 1e-6

    timed("patch extract: vmap(dynamic_slice) x2000", extract_dynslice,
          oy, ox)

    # 3. sampling einsum only (patches resident)
    patches = jnp.asarray(rng.rand(N, PATCH, PATCH, C).astype(np.float32)
                          ).astype(jnp.bfloat16)
    y = jnp.asarray(rng.rand(N, P).astype(np.float32)) * (PATCH - 1)
    x = jnp.asarray(rng.rand(N, P).astype(np.float32)) * (PATCH - 1)

    def einsum_only(c, y, x):
        y = y + c * 1e-9
        y0 = jnp.floor(y)
        x0 = jnp.floor(x)
        fy = y - y0
        fx = x - x0
        it = jax.lax.broadcasted_iota(jnp.float32, (1, 1, PATCH), 2)
        ey = jnp.where(it == y0[..., None], 1.0 - fy[..., None], 0.0) + \
            jnp.where(it == y0[..., None] + 1.0, fy[..., None], 0.0)
        ex = jnp.where(it == x0[..., None], 1.0 - fx[..., None], 0.0) + \
            jnp.where(it == x0[..., None] + 1.0, fx[..., None], 0.0)
        g = jnp.einsum("npy,nyxc->npxc", ey.astype(jnp.bfloat16), patches,
                       preferred_element_type=jnp.float32)
        val = jnp.einsum("npx,npxc->npc", ex, g)
        pooled = val.reshape(N, OUT, G, OUT, G, C).mean(axis=(2, 4))
        return c + jnp.sum(pooled) * 1e-6

    timed("sampling einsum only (row matmul + col contract)", einsum_only,
          y, x)

    # 4. cheaper col contraction first at lower C cost? col then row
    def einsum_colfirst(c, y, x):
        y = y + c * 1e-9
        y0 = jnp.floor(y)
        x0 = jnp.floor(x)
        fy = y - y0
        fx = x - x0
        it = jax.lax.broadcasted_iota(jnp.float32, (1, 1, PATCH), 2)
        ey = jnp.where(it == y0[..., None], 1.0 - fy[..., None], 0.0) + \
            jnp.where(it == y0[..., None] + 1.0, fy[..., None], 0.0)
        ex = jnp.where(it == x0[..., None], 1.0 - fx[..., None], 0.0) + \
            jnp.where(it == x0[..., None] + 1.0, fx[..., None], 0.0)
        # bilinear taps as a (P, PATCH*PATCH) sparse row: outer product
        w = (ey[:, :, :, None] * ex[:, :, None, :]).reshape(
            N, P, PATCH * PATCH)
        val = jnp.einsum("npq,nqc->npc", w.astype(jnp.bfloat16),
                         patches.reshape(N, PATCH * PATCH, C),
                         preferred_element_type=jnp.float32)
        pooled = val.reshape(N, OUT, G, OUT, G, C).mean(axis=(2, 4))
        return c + jnp.sum(pooled) * 1e-6

    timed("sampling fused outer-product matmul (196x1600)@..",
          einsum_colfirst, y, x)

    # 5. Pallas DMA patch extraction
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def dma_kernel(oy_ref, ox_ref, hbm_ref, out_ref, sem):
        i = pl.program_id(0)
        yy = oy_ref[i]
        xx = ox_ref[i]
        cp = pltpu.make_async_copy(
            hbm_ref.at[pl.ds(yy, PATCH), pl.ds(xx, PATCH), :],
            out_ref, sem)
        cp.start()
        cp.wait()

    @jax.jit
    def extract_pallas(oy, ox):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(N,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, PATCH, PATCH, C),
                                   lambda i, oy, ox: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        )
        return pl.pallas_call(
            lambda oy_ref, ox_ref, hbm_ref, out_ref, sem: dma_kernel(
                oy_ref, ox_ref, hbm_ref, out_ref.at[0], sem),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((N, PATCH, PATCH, C),
                                           flat.dtype),
        )(oy, ox, flat)

    def extract_pallas_t(c, oy, ox):
        oy = oy + (c * 0).astype(jnp.int32)
        p = extract_pallas(oy, ox)
        return c + jnp.sum(p.astype(jnp.float32)) * 1e-6

    try:
        timed("patch extract: Pallas DMA x2000", extract_pallas_t, oy, ox)
    except Exception as e:  # noqa: BLE001
        log(f"pallas extract failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
