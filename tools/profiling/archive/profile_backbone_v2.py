#!/usr/bin/env python
"""Device-true backbone decomposition (tools/ptime.py methodology):
flagship MoE backbone vs dense substrate vs GELU/LN variants, 2x800^2
bf16 — identifies where the 12 ms backbone+neck stage goes."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import copy

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from ptime import device_time  # noqa: E402

IMG = 800


def log(m):
    print(m, flush=True)


def bench_backbone(tag, backbone_cfg):
    from sm3det_tpu.models.backbones.convnext import ConvNeXtMoE

    model = ConvNeXtMoE(**backbone_cfg)
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(2, IMG, IMG, 3).astype(np.float32))
    ids = jnp.zeros((2,), jnp.int32)
    v = model.init(jax.random.PRNGKey(0), x[:, :64, :64, :],
                   train=False, dataset_ids=ids)
    v = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16)
        if p.dtype == jnp.float32 else p, v)

    def fn(vv, xx):
        feats, _ = model.apply(vv, xx.astype(jnp.bfloat16), train=False,
                               dataset_ids=ids)
        return [f.astype(jnp.float32) for f in feats]

    dt = device_time(fn, (v, x), iters=8,
                     perturb=lambda a, e: (a[0], a[1] + e * 1e-9))
    log(f"{tag:44s} {dt:8.2f} ms")
    return dt


def main():
    base = dict(arch="tiny", drop_path_rate=0.0, num_experts=8, top_k=3,
                gate="cosine", capacity_factor=1.5)
    flagship = dict(base,
                    moe_block_inds=((), (), (0, 2, 4, 6, 8), (0, 2)))
    dense = dict(base, moe_block_inds=((), (), (), ()))

    bench_backbone("ConvNeXt-T MoE flagship (2x800^2)", flagship)
    bench_backbone("ConvNeXt-T dense (2x800^2)", dense)


if __name__ == "__main__":
    main()
