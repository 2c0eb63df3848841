#!/usr/bin/env python
"""Which part of the fused-block pad is slow: channel pad (C->Cp=128k)
vs spatial halo pad (+6 rows/cols)? Chained timings at stage shapes."""
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


def main():
    rng = np.random.RandomState(0)
    for b, s, c, cp in [(4, 200, 96, 128), (4, 100, 192, 256)]:
        wp = ((s + 6 + 7) // 8) * 8
        x = jnp.asarray(rng.rand(b, s, s, c).astype(np.float32)
                        ).astype(jnp.bfloat16)

        t_ch = chain_time(
            lambda y: jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, cp - c))
                              )[..., :c] + y * 1e-9, x)
        t_sp = chain_time(
            lambda y: jnp.pad(y, ((0, 0), (3, 3), (3, wp - s - 3),
                                  (0, 0)))[:, 3:3 + s, 3:3 + s, :]
            + y * 1e-9, x)
        t_copy = chain_time(lambda y: y * jnp.bfloat16(1.0000001), x)
        log(f"({b},{s},{s},{c}): ch-pad {t_ch:6.3f}  sp-pad {t_sp:6.3f}"
            f"  copy-baseline {t_copy:6.3f} ms")


if __name__ == "__main__":
    main()
