#!/usr/bin/env python
"""Is there a per-iteration floor in chained lax.fori_loop timing on
this TPU? Probe: same elementwise op at 31MB vs tiny, ITERS 32 vs 128,
and an UNROLLED 32-op chain in one jit."""
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


def log(m):
    print(m, flush=True)


def t_loop(step, x0, iters):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, lambda _, y: step(y), x)

    float(jnp.sum(run(x0).astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(run(x0).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1000.0


def t_unrolled(step, x0, iters):
    @jax.jit
    def run(x):
        for _ in range(iters):
            x = step(x)
        return x

    float(jnp.sum(run(x0).astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(run(x0).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1000.0


def main():
    rng = np.random.RandomState(0)
    big = jnp.asarray(rng.rand(160000, 96).astype(np.float32)
                      ).astype(jnp.bfloat16)
    tiny = jnp.asarray(rng.rand(1024, 128).astype(np.float32)
                       ).astype(jnp.bfloat16)
    op = lambda y: y * jnp.bfloat16(1.0000001)  # noqa: E731

    log(f"big  31MB loop32   {t_loop(op, big, 32):7.3f} ms/iter")
    log(f"big  31MB loop128  {t_loop(op, big, 128):7.3f} ms/iter")
    log(f"tiny 256KB loop32  {t_loop(op, tiny, 32):7.3f} ms/iter")
    log(f"big  31MB unroll32 {t_unrolled(op, big, 32):7.3f} ms/op")
    log(f"tiny 256KB unroll32{t_unrolled(op, tiny, 32):7.3f} ms/op")


if __name__ == "__main__":
    main()
