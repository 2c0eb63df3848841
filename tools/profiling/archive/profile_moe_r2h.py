#!/usr/bin/env python
"""TPU: self-chained timing (y -> moe(y)) of flax MoELayer vs the
standalone composition — same loop structure for both, no generic
carry harness."""
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

from profile_moe_r2e import moe_sorted  # noqa: E402

N, D, E, K, HID = 10000, 384, 8, 3, 1536
ITERS = 32


def log(m):
    print(m, flush=True)


def timeit(fn, *args):
    float(jnp.sum(fn(*args).astype(jnp.float32)))   # compile+run
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1000.0


def main():
    from sm3det_tpu.models.moe import MoELayer

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(N, D).astype(np.float32)).astype(jnp.bfloat16)
    moe = MoELayer(dim=D, hidden=HID, num_experts=E, top_k=K,
                   gating="cosine", noisy_gating=True,
                   capacity_factor=1.5)
    vm = moe.init(jax.random.PRNGKey(0), x, train=False)
    vm = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, vm)

    wp = jnp.asarray(rng.randn(D, 192).astype(np.float32) * 0.05
                     ).astype(jnp.bfloat16)
    sim = jnp.asarray(rng.randn(192, E).astype(np.float32) * 0.01
                      ).astype(jnp.bfloat16)
    temp = jnp.asarray([0.7], jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(E, D, HID).astype(np.float32) * 0.05
                     ).astype(jnp.bfloat16)
    b1 = jnp.zeros((E, HID), jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(E, HID, D).astype(np.float32) * 0.05
                     ).astype(jnp.bfloat16)
    b2 = jnp.zeros((E, D), jnp.bfloat16)

    @jax.jit
    def chain_flax(y, v):
        def body(_, c):
            out = moe.apply(v, c, train=False)[0]
            return (out * jnp.asarray(0.999, out.dtype)
                    + jnp.asarray(0.001, out.dtype))
        return jax.lax.fori_loop(0, ITERS, body, y)

    @jax.jit
    def chain_std(y, *w):
        def body(_, c):
            out = moe_sorted.__wrapped__(c, *w)
            return (out * jnp.asarray(0.999, out.dtype)
                    + jnp.asarray(0.001, out.dtype))
        return jax.lax.fori_loop(0, ITERS, body, y)

    t2 = timeit(chain_std, x, wp, sim, temp, w1, b1, w2, b2)
    log(f"standalone chained   {t2:7.3f} ms/iter")
    t1 = timeit(chain_flax, x, vm)
    log(f"flax chained         {t1:7.3f} ms/iter")
    t2b = timeit(chain_std, x, wp, sim, temp, w1, b1, w2, b2)
    log(f"standalone again     {t2b:7.3f} ms/iter")


if __name__ == "__main__":
    main()
