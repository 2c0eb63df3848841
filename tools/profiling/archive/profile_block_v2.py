#!/usr/bin/env python
"""Device-true decomposition of one ConvNeXt stage-1 block at bench
shapes (2, 200, 200, 96) bf16: full block vs dwconv / LayerNorm / MLP
pieces — quantifies XLA's fusion quality to judge whether a Pallas
fused block is worth writing."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from ptime import device_time  # noqa: E402


def log(m):
    print(m, flush=True)


def timeit(name, module, x, extra=None):
    v = module.init(jax.random.PRNGKey(0), x)
    v = jax.tree.map(lambda p: p.astype(jnp.bfloat16)
                     if p.dtype == jnp.float32 else p, v)

    def fn(vv, xx):
        return module.apply(vv, xx)

    dt = device_time(fn, (v, x), iters=16,
                     perturb=lambda a, e: (a[0], a[1] + e * 1e-9))
    log(f"{name:44s} {dt:8.3f} ms")
    return dt


class Full(nn.Module):
    dim: int = 96

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.Conv(self.dim, (7, 7), padding=3,
                    feature_group_count=self.dim, name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, name="fc1")(x)
        x = nn.gelu(x, approximate=True)
        x = nn.Dense(self.dim, name="fc2")(x)
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        return shortcut + x * gamma


class DWOnly(nn.Module):
    dim: int = 96

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.dim, (7, 7), padding=3,
                       feature_group_count=self.dim, name="dwconv")(x)


class LNOnly(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-6, name="norm")(x)


class MLPOnly(nn.Module):
    dim: int = 96

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(4 * self.dim, name="fc1")(x)
        y = nn.gelu(y, approximate=True)
        return x + nn.Dense(self.dim, name="fc2")(y)


def main():
    rng = np.random.RandomState(0)
    for shape, dim in (((2, 200, 200, 96), 96),
                       ((2, 50, 50, 384), 384)):
        x = jnp.asarray(rng.rand(*shape).astype(np.float32)).astype(
            jnp.bfloat16)
        log(f"--- {shape} ---")
        timeit("full block", Full(dim=dim), x)
        timeit("dwconv 7x7 only", DWOnly(dim=dim), x)
        timeit("LayerNorm only", LNOnly(), x)
        timeit("MLP only (fc-gelu-fc+res)", MLPOnly(dim=dim), x)


if __name__ == "__main__":
    main()
