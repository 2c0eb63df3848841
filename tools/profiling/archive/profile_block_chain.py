#!/usr/bin/env python
"""Self-chained (y -> block(y)) timing of ConvNeXtBlock.apply vs the raw
fused Pallas call at stage-1 shapes — the structure real network
execution has, immune to the carry-harness artifact documented in
docs/PERF.md (MoE hunt)."""
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
    from sm3det_tpu.models.backbones.convnext import ConvNeXtBlock
    from sm3det_tpu.ops.pallas.convnext_block_kernel import \
        fused_convnext_block

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(4, 200, 200, 96).astype(np.float32)
                    ).astype(jnp.bfloat16)
    blk = ConvNeXtBlock(dim=96, drop_path_rate=0.0)
    vp = blk.init(jax.random.PRNGKey(0), x, train=False)
    vp = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, vp)

    t = chain_time(lambda y, v: blk.apply(v, y, train=False)[0], x, vp)
    log(f"block.apply chained        {t:7.3f} ms")

    p = vp["params"]
    args = (p["dwconv"]["kernel"], p["dwconv"]["bias"],
            p["norm"]["scale"], p["norm"]["bias"],
            p["pwconv1"]["kernel"], p["pwconv1"]["bias"],
            p["pwconv2"]["kernel"], p["pwconv2"]["bias"], p["gamma"])
    t = chain_time(lambda y, a: fused_convnext_block(y, *a), x, args)
    log(f"raw fused chained          {t:7.3f} ms")


if __name__ == "__main__":
    main()
