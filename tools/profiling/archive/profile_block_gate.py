#!/usr/bin/env python
"""In-process A/B at stage-1 shapes (4x200x200x96, bf16): ConvNeXtBlock
via flax apply vs the raw fused Pallas call vs the unfused jnp math —
locates whether the fused gate actually fires and what each route
costs."""
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
    from sm3det_tpu.models.backbones.convnext import (ConvNeXtBlock,
                                                      _dense, _dwconv7,
                                                      _policy_gelu,
                                                      layernorm_math)
    from sm3det_tpu.ops.pallas.convnext_block_kernel import (
        fused_block_supported, fused_convnext_block)

    log(f"default_backend = {jax.default_backend()!r}")

    rng = np.random.RandomState(0)
    b, h, w, c = 4, 200, 200, 96
    hidden = 4 * c
    x = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32)
                    ).astype(jnp.bfloat16)
    log(f"fused_block_supported({h},{w},{c},{hidden}) = "
        f"{fused_block_supported(h, w, c, hidden)}")

    blk = ConvNeXtBlock(dim=c, drop_path_rate=0.0)
    vp = blk.init(jax.random.PRNGKey(0), x, train=False)
    vp = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, vp)

    def pert(a, eps):
        return (a[0] + eps * jnp.asarray(1e-9, a[0].dtype),) + \
            tuple(a[1:])

    t = device_time(lambda xx, v: blk.apply(v, xx, train=False)[0],
                    (x, vp), iters=32, perturb=pert)
    log(f"block.apply (train=False)      {t:7.3f} ms")

    p = vp["params"]
    dwk, dwb = p["dwconv"]["kernel"], p["dwconv"]["bias"]
    lns, lnb = p["norm"]["scale"], p["norm"]["bias"]
    w1, b1 = p["pwconv1"]["kernel"], p["pwconv1"]["bias"]
    w2, b2 = p["pwconv2"]["kernel"], p["pwconv2"]["bias"]
    gamma = p["gamma"]

    t = device_time(
        lambda xx: fused_convnext_block(xx, dwk, dwb, lns, lnb, w1, b1,
                                        w2, b2, gamma) + xx,
        (x,), iters=32, perturb=pert)
    log(f"raw fused_convnext_block+res   {t:7.3f} ms")

    def unfused(xx):
        y = _dwconv7(xx, dwk, dwb)
        y = layernorm_math(y, lns, lnb)
        y = _dense(y, w1, b1)
        y = _policy_gelu(y)
        y = _dense(y, w2, b2)
        return xx + y * gamma

    t = device_time(unfused, (x,), iters=32, perturb=pert)
    log(f"unfused jnp math               {t:7.3f} ms")


if __name__ == "__main__":
    main()
