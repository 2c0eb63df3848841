#!/usr/bin/env python
"""Isolate the Pallas grid-step overhead vs DMA-transfer cost for the
RoI-align kernel shapes: no-op kernels with small/full outputs, window
DMA with/without dedup, at 2000 and 500 grid steps."""
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

N = 2000
C = 256
PATCH = 48
PX = 56
ROWS = 780
SLABW = 1664
K = 8


def log(m):
    print(m, flush=True)


def make_kernel(variant, out_p, n):
    def kernel(oy_ref, ox_ref, nd_ref, hbm_ref, out_ref, patches, sems):
        i = pl.program_id(0)

        def dma(slot, idx):
            ox = pl.multiple_of(ox_ref[idx], 16)
            return pltpu.make_async_copy(
                hbm_ref.at[pl.ds(oy_ref[idx], PATCH), pl.ds(ox, PX), :],
                patches.at[slot], sems.at[slot])

        if variant == "noop":
            out_ref[0] = jnp.zeros((out_p, C), jnp.float32) + \
                jnp.float32(i)
            return
        if variant == "dma":
            @pl.when(i == 0)
            def _():
                dma(0, 0).start()

            @pl.when(i + 1 < n)
            def _():
                dma((i + 1) % 2, i + 1).start()

            dma(i % 2, i).wait()
            out_ref[0] = patches[i % 2, 0, :out_p].astype(jnp.float32)
            return
        # dedup: nd marks first use of a window; single slot
        @pl.when(nd_ref[i] == 1)
        def _():
            dma(0, i).start()
            dma(0, i).wait()

        out_ref[0] = patches[0, 0, :out_p].astype(jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "out_p", "n"))
def run(slab, oy, ox, nd, variant, out_p, n):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, out_p, C), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, PATCH, PX, C), slab.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        make_kernel(variant, out_p, n),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, out_p, C), jnp.float32),
    )(oy, ox, nd, slab)
    return jnp.sum(out[:, 0, :2]) * 1e-9


def main():
    rng = np.random.RandomState(0)
    # content is irrelevant for timing; build on-device (avoids pushing
    # ~1.3 GB through the tunnel)
    slab = jnp.full((ROWS, SLABW, C), 0.5, jnp.bfloat16)

    for n in (2000, 500):
        oy_r = (rng.randint(0, (ROWS - PATCH) // 8, n) * 8).astype(
            np.int32)
        ox_r = (rng.randint(0, 13, n) * 16).astype(np.int32)
        key = oy_r.astype(np.int64) * SLABW + ox_r
        order = np.argsort(key)
        oy_s, ox_s = oy_r[order], ox_r[order]
        key_s = key[order]
        nd = np.concatenate([[1], (key_s[1:] != key_s[:-1]).astype(
            np.int32)]).astype(np.int32)
        log(f"n={n}: {int(nd.sum())} distinct windows")
        oy_j, ox_j, nd_j = map(jnp.asarray, (oy_s, ox_s, nd))

        for variant, out_p in (("noop", 8), ("noop", 196),
                               ("dma", 8), ("dedup", 8)):
            fn = jax.jit(lambda c, s, a, b, d, v=variant, o=out_p, nn=n:
                         run(s, a, b, d, v, o, nn) + c * 1e-9)
            c = float(fn(jnp.zeros(()), slab, oy_j, ox_j, nd_j))
            t0 = time.perf_counter()
            cc = jnp.zeros(())
            for _ in range(K):
                cc = fn(cc, slab, oy_j, ox_j, nd_j)
            _ = float(cc)
            dt = (time.perf_counter() - t0) / K * 1000
            log(f"n={n} {variant:6s} out_p={out_p:4d} {dt:9.2f} ms/iter")


if __name__ == "__main__":
    main()
