#!/usr/bin/env python
"""Chained decomposition of the fused ConvNeXt block at stage shapes:
pad-only vs dw+LN (fused_dwconv_ln) vs full block — locates where the
2.2 ms at stage 1 goes."""
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

ITERS = 32


def log(m):
    print(m, flush=True)


def chain_time(step, x0, *rest):
    @jax.jit
    def run(x, *r):
        def body(_, y):
            return step(y, *r)
        return jax.lax.fori_loop(0, ITERS, body, x)

    float(jnp.sum(run(x0, *rest).astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(run(x0, *rest).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1000.0


def main():
    from sm3det_tpu.ops.pallas.convnext_block_kernel import (
        _roundup, fused_convnext_block, fused_dwconv_ln)

    rng = np.random.RandomState(0)
    for b, s, c in [(4, 200, 96), (4, 100, 192), (4, 50, 384)]:
        hidden = 4 * c
        x = jnp.asarray(rng.rand(b, s, s, c).astype(np.float32)
                        ).astype(jnp.bfloat16)
        dwk = jnp.asarray(rng.randn(7, 7, 1, c).astype(np.float32)
                          * 0.05).astype(jnp.bfloat16)
        dwb = jnp.zeros((c,), jnp.bfloat16)
        lns = jnp.ones((c,), jnp.bfloat16)
        lnb = jnp.zeros((c,), jnp.bfloat16)
        w1 = jnp.asarray(rng.randn(c, hidden).astype(np.float32)
                         * 0.05).astype(jnp.bfloat16)
        b1 = jnp.zeros((hidden,), jnp.bfloat16)
        w2 = jnp.asarray(rng.randn(hidden, c).astype(np.float32)
                         * 0.05).astype(jnp.bfloat16)
        b2 = jnp.zeros((c,), jnp.bfloat16)
        gamma = jnp.full((c,), 1e-2, jnp.bfloat16)

        cp = _roundup(c, 128)
        wp = _roundup(s + 6, 8)

        t_pad = chain_time(
            lambda y: jnp.pad(
                y, ((0, 0), (3, 3), (3, wp - s - 3), (0, cp - c))
            )[:, 3:3 + s, 3:3 + s, :c] + y * 1e-9, x)
        t_dwln = chain_time(
            lambda y: fused_dwconv_ln(y, dwk, dwb, lns, lnb)
            .astype(jnp.bfloat16), x)
        t_full = chain_time(
            lambda y: fused_convnext_block(
                y, dwk, dwb, lns, lnb, w1, b1, w2, b2, gamma), x)
        log(f"({b},{s},{s},{c}): pad+slice {t_pad:6.3f}  "
            f"dw+LN {t_dwln:6.3f}  full {t_full:6.3f} ms")


if __name__ == "__main__":
    main()
