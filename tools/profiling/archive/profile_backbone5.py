#!/usr/bin/env python
"""Dense ConvNeXt substrate ablation at bench shapes (2x800x800 bf16):
which primitive eats the 15.9 ms? Carry-chained timing."""
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

K = 8


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


class Variant(nn.Module):
    use_dw: bool = True
    use_ln: bool = True
    use_mlp: bool = True
    use_gelu: bool = True

    @nn.compact
    def __call__(self, x):
        depths = [3, 3, 9, 3]
        chans = [96, 192, 384, 768]
        for i, (dep, c) in enumerate(zip(depths, chans)):
            if i == 0:
                x = nn.Conv(c, (4, 4), strides=4, padding="VALID",
                            name=f"down{i}")(x)
            else:
                x = nn.Conv(c, (2, 2), strides=2, padding="VALID",
                            name=f"down{i}")(x)
            for j in range(dep):
                s = x
                if self.use_dw:
                    x = nn.Conv(c, (7, 7), padding=3,
                                feature_group_count=c,
                                name=f"dw{i}_{j}")(x)
                if self.use_ln:
                    x = nn.LayerNorm(name=f"ln{i}_{j}")(x)
                if self.use_mlp:
                    x = nn.Dense(4 * c, name=f"fc1_{i}_{j}")(x)
                    if self.use_gelu:
                        x = nn.gelu(x, approximate=False)
                    x = nn.Dense(c, name=f"fc2_{i}_{j}")(x)
                x = x + s if x.shape == s.shape else x
        return jnp.sum(x.astype(jnp.float32)) * 1e-6


def run(name, **kw):
    m = Variant(**kw)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 800, 800, 3).astype(np.float32)
                      ).astype(jnp.bfloat16)
    p = jax.jit(lambda: m.init(jax.random.PRNGKey(0), img))()
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)

    def fn(c, p, x):
        return c + m.apply(p, x + c.astype(x.dtype) * 1e-9)

    timed(name, fn, p, img)


def main():
    run("full (dw+ln+mlp+gelu) bf16 2x800")
    run("no dw conv", use_dw=False)
    run("no ln", use_ln=False)
    run("no mlp", use_mlp=False)
    run("mlp without gelu", use_gelu=False)
    run("dw only", use_ln=False, use_mlp=False)


if __name__ == "__main__":
    main()
