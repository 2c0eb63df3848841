#!/usr/bin/env python
"""Achievable HBM bandwidth probe: XLA elementwise vs trivial Pallas
copy kernel, across shapes/dtypes. Chained fori_loop timing."""
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

ITERS = 32


def log(m):
    print(m, flush=True)


def chain_time(step, x0):
    @jax.jit
    def run(x):
        def body(_, y):
            return step(y)
        return jax.lax.fori_loop(0, ITERS, body, x)

    float(jnp.sum(run(x0).astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(run(x0).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1000.0


def pallas_scale(x):
    m, c = x.shape
    tm = 512

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * x.dtype.type(1.0000001)

    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(m, tm),),
        in_specs=[pl.BlockSpec((tm, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tm, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
    )(x)


def main():
    rng = np.random.RandomState(0)
    cases = [
        ("bf16 (160000,96)  31MB", (160000, 96), jnp.bfloat16),
        ("bf16 (160000,128) 41MB", (160000, 128), jnp.bfloat16),
        ("bf16 (8192,8192) 134MB", (8192, 8192), jnp.bfloat16),
        ("f32  (8192,8192) 268MB", (8192, 8192), jnp.float32),
    ]
    for name, shape, dt in cases:
        x = jnp.asarray(rng.rand(*shape).astype(np.float32)).astype(dt)
        nbytes = int(np.prod(shape)) * x.dtype.itemsize
        t_x = chain_time(lambda y: y * dt(1.0000001), x)
        t_p = chain_time(pallas_scale, x)
        log(f"{name}: xla {t_x:7.3f} ms ({2 * nbytes / t_x / 1e6:6.1f} "
            f"GB/s)   pallas {t_p:7.3f} ms "
            f"({2 * nbytes / t_p / 1e6:6.1f} GB/s)")


if __name__ == "__main__":
    main()
