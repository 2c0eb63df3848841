#!/usr/bin/env python
"""Backbone decomposition on the real TPU at bench shapes (2x 800x800
bf16): where do the 26.7 ms go? Ablate MoE (vs dense FFN), isolate the
MoE dispatch scatter/gather, and the depthwise+LN substrate."""
import copy
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


def bench_backbone(name, bcfg):
    from sm3det_tpu.models.detectors.trisource import \
        build_multi_input_backbone

    bb = build_multi_input_backbone(bcfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 800, 800, 3).astype(np.float32))
    ids = jnp.zeros((2,), jnp.int32)
    p = jax.jit(lambda: bb.init(jax.random.PRNGKey(0), x,
                                dataset_ids=ids, train=False))()
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                     if a.dtype == jnp.float32 else a, p)

    def fn(c, p, x):
        feats, aux = bb.apply(p, x + c * 1e-9, dataset_ids=ids,
                              train=False)
        return c + sum(jnp.sum(f.astype(jnp.float32)) * 1e-6
                       for f in feats)

    timed(name, fn, p, x)


def main():
    base = dict(arch="tiny", drop_path_rate=0.0,
                moe_block_inds=((), (), (0, 2, 4, 6, 8), (0, 2)),
                num_experts=8, top_k=3, gate="cosine",
                capacity_factor=1.5, compute_dtype="bfloat16")

    bench_backbone("ConvNeXt-T MoE (flagship, 2 imgs bf16)", base)

    dense = dict(base)
    dense["moe_block_inds"] = ((), (), (), ())
    bench_backbone("ConvNeXt-T dense (no MoE blocks)", dense)

    # isolated MoE layer at stage-2 size: 2 imgs x 50x50 tokens, d=384
    from sm3det_tpu.models.moe import MoELayer
    n, d = 2 * 50 * 50, 384
    layer = MoELayer(dim=d, hidden=4 * d, num_experts=8, top_k=3,
                     gating="cosine", capacity_factor=1.5)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(n, d).astype(np.float32)).astype(jnp.bfloat16)
    p = layer.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                     if a.dtype == jnp.float32 else a, p)

    def moe_fn(c, p, x):
        y, aux = layer.apply(p, x + c.astype(x.dtype) * 1e-9, train=False)
        return c + jnp.sum(y.astype(jnp.float32)) * 1e-6

    timed("MoELayer stage-2 size (5000 tok, d=384, E8 k3)", moe_fn, p, x)

    # dispatch-only: the capacity-bucketed scatter + gather without FFN
    e, k = 8, 3
    cap = int(np.ceil(n * k / 8 * 1.5))
    gates = jnp.asarray(rng.rand(n, k).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, e, (n, k)), jnp.int32)

    def dispatch_fn(c, x, idx, gates):
        x = x + c.astype(x.dtype) * 1e-9
        flat_expert = idx.reshape(-1)
        flat_gate = gates.reshape(-1)
        token_of = jnp.repeat(jnp.arange(n), k)
        onehot = jax.nn.one_hot(flat_expert, e, dtype=jnp.int32)
        pos = jnp.cumsum(onehot, axis=0) - onehot
        position = jnp.sum(pos * onehot, axis=1)
        keep = position < cap
        slot = flat_expert * cap + jnp.minimum(position, cap - 1)
        buf = jnp.zeros((e * cap, d), x.dtype)
        src = jnp.where(keep[:, None], x[token_of], 0)
        buf = buf.at[jnp.where(keep, slot, e * cap - 1)].add(src)
        out_buf = buf * 1.000001   # stand-in for the expert FFN
        gathered = out_buf[slot]
        weighted = gathered * (flat_gate * keep)[:, None].astype(x.dtype)
        y = jnp.zeros((n, d), x.dtype).at[token_of].add(weighted)
        return c + jnp.sum(y.astype(jnp.float32)) * 1e-6

    timed("MoE dispatch only (scatter+gather, no FFN)", dispatch_fn,
          x, idx, gates)

    # expert FFN einsum only at the same capacity
    w1 = jnp.asarray(rng.rand(e, d, 4 * d).astype(np.float32) * 0.01
                     ).astype(jnp.bfloat16)
    w2 = jnp.asarray(rng.rand(e, 4 * d, d).astype(np.float32) * 0.01
                     ).astype(jnp.bfloat16)
    buf0 = jnp.asarray(rng.rand(e, cap, d).astype(np.float32)
                       ).astype(jnp.bfloat16)

    def ffn_fn(c, w1, w2, b):
        b = b + c.astype(b.dtype) * 1e-9
        y = jnp.einsum("ecd,edh->ech", b, w1,
                       preferred_element_type=jnp.float32)
        y = jax.nn.gelu(y.astype(jnp.bfloat16), approximate=False)
        y = jnp.einsum("ech,ehd->ecd", y, w2,
                       preferred_element_type=jnp.float32)
        return c + jnp.sum(y) * 1e-6

    timed("expert FFN einsums only (E8 x cap x 384)", ffn_fn, w1, w2,
          buf0)


if __name__ == "__main__":
    main()
