#!/usr/bin/env python
"""Device-true timing of exact lax.top_k vs approx_max_k at RPN sizes."""
import os
import sys

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

from ptime import device_time  # noqa: E402


def log(m):
    print(m, flush=True)


def main():
    rng = np.random.RandomState(0)
    for n in (120000, 30000):
        x = jnp.asarray(rng.rand(n).astype(np.float32))
        dt = device_time(lambda a: jax.lax.top_k(a, 2000)[0], (x,),
                         iters=16)
        log(f"top_k exact      n={n:7d} k=2000 {dt:8.3f} ms")
        dt = device_time(
            lambda a: jax.lax.approx_max_k(a, 2000)[0], (x,), iters=16)
        log(f"approx_max_k     n={n:7d} k=2000 {dt:8.3f} ms")
        dt = device_time(
            lambda a: jax.lax.approx_max_k(
                a, 2000, recall_target=0.99)[0], (x,), iters=16)
        log(f"approx r=0.99    n={n:7d} k=2000 {dt:8.3f} ms")
        dt = device_time(lambda a: jnp.argsort(-a)[:2000], (x,),
                         iters=16)
        log(f"argsort slice    n={n:7d} k=2000 {dt:8.3f} ms")


if __name__ == "__main__":
    main()
