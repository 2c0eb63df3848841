#!/usr/bin/env python
"""Which part of ConvNeXt dominates on TPU? Ablate dw conv / MoE / LN."""
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
from flax import linen as nn

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    _ = float(out)          # force execution
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        _ = float(fn(*args))
        times.append(time.perf_counter() - t0)
    print(f"{name:44s} med {np.median(times) * 1000:8.1f} ms", flush=True)


class Variant(nn.Module):
    """ConvNeXt-T-like stack with switchable pieces."""
    use_dw: bool = True
    use_ln: bool = True
    use_mlp: bool = True

    @nn.compact
    def __call__(self, x):
        depths = [3, 3, 9, 3]
        chans = [96, 192, 384, 768]
        for i, (d, c) in enumerate(zip(depths, chans)):
            if i == 0:
                x = nn.Conv(c, (4, 4), strides=4, padding="VALID",
                            name=f"down{i}")(x)
            else:
                x = nn.Conv(c, (2, 2), strides=2, padding="VALID",
                            name=f"down{i}")(x)
            for j in range(d):
                s = x
                if self.use_dw:
                    x = nn.Conv(c, (7, 7), padding=3,
                                feature_group_count=c,
                                name=f"dw{i}_{j}")(x)
                if self.use_ln:
                    x = nn.LayerNorm(name=f"ln{i}_{j}")(x)
                if self.use_mlp:
                    x = nn.Dense(4 * c, name=f"fc1_{i}_{j}")(x)
                    x = nn.gelu(x, approximate=False)
                    x = nn.Dense(c, name=f"fc2_{i}_{j}")(x)
                x = x + s if x.shape == s.shape else x
        return jnp.sum(x)


def run(name, **kw):
    m = Variant(**kw)
    img = jax.device_put(
        np.random.rand(1, 800, 800, 3).astype(np.float32))
    p = jax.jit(lambda: m.init(jax.random.PRNGKey(0), img))()
    jax.block_until_ready(p)
    fn = jax.jit(lambda v, x: m.apply(v, x))
    timeit(name, fn, p, img)


def main():
    run("full (dw+ln+mlp)")
    run("no dw conv", use_dw=False)
    run("no mlp", use_mlp=False)
    run("no ln", use_ln=False)
    run("dw only", use_ln=False, use_mlp=False)

    # bf16 full
    m = Variant()
    img = jax.device_put(
        np.random.rand(1, 800, 800, 3).astype(np.bfloat16))
    p = jax.jit(lambda: m.init(jax.random.PRNGKey(0), img))()
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
    fn = jax.jit(lambda v, x: m.apply(v, x))
    timeit("full bf16", fn, p, img)


if __name__ == "__main__":
    main()
