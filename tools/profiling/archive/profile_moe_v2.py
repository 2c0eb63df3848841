#!/usr/bin/env python
"""Device-true MoE-layer decomposition at stage-3 bench shape
(N=5000 tokens, d=384, E=8, k=3): gate/top-k, aux-loss block,
sort-based dispatch indexing, expert FFN, combine — standalone replicas
of the moe.py blocks, timed with tools/ptime.py."""
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

N, D, E, K = 5000, 384, 8, 3
CAP = int(np.ceil(N * K / E * 1.5))


def log(m):
    print(m, flush=True)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(N, D).astype(np.float32)).astype(
        jnp.bfloat16)
    logits = jnp.asarray(rng.randn(N, E).astype(np.float32))
    w1 = jnp.asarray(rng.rand(E, D, 4 * D).astype(np.float32) * 0.02
                     ).astype(jnp.bfloat16)
    w2 = jnp.asarray(rng.rand(E, 4 * D, D).astype(np.float32) * 0.02
                     ).astype(jnp.bfloat16)

    def topk_gate(lg):
        tl, ti = jax.lax.top_k(lg, K + 1)
        return jax.nn.softmax(tl[:, :K], -1), ti[:, :K]

    def aux_block(lg):
        g, ti = topk_gate(lg)
        gates = jnp.zeros((N, E), lg.dtype)
        gates = gates.at[jnp.arange(N)[:, None], ti].set(g)
        imp = gates.sum(0)
        load = (gates > 0).sum(0).astype(jnp.float32)
        return jnp.sum(imp) + jnp.sum(load)

    def sort_dispatch(lg, xx):
        g, ti = topk_gate(lg)
        fe = ti.reshape(-1)
        fg = g.reshape(-1)
        counts = jnp.sum(jax.nn.one_hot(fe, E, dtype=jnp.int32), 0)
        starts = jnp.cumsum(counts) - counts
        order = jnp.argsort(fe, stable=True)
        inv = jnp.argsort(order, stable=True)
        position = inv - starts[fe]
        keep = position < CAP
        slot = fe * CAP + jnp.minimum(position, CAP - 1)
        rank_grid = starts[:, None] + jnp.arange(CAP)[None, :]
        valid = jnp.arange(CAP)[None, :] < counts[:, None]
        flat_idx = order[jnp.clip(rank_grid, 0, N * K - 1)]
        buf = xx[flat_idx // K] * valid[..., None].astype(xx.dtype)
        return buf, slot, fg, keep

    def ffn(buf):
        h = jnp.einsum("ecd,edh->ech", buf, w1)
        h = jax.nn.gelu(h, approximate=True)
        return jnp.einsum("ech,ehd->ecd", h, w2)

    def full(lg, xx):
        buf, slot, fg, keep = sort_dispatch(lg, xx)
        ob = ffn(buf).reshape(E * CAP, D)
        gath = ob[slot]
        w = gath * (fg * keep.astype(jnp.float32))[:, None].astype(
            gath.dtype)
        return jnp.sum(w.reshape(N, K, D).sum(1).astype(jnp.float32))

    cases = [
        ("top_k+softmax only", lambda lg, xx: jnp.sum(topk_gate(lg)[0])),
        ("aux block (gates scatter+sums)",
         lambda lg, xx: aux_block(lg)),
        ("sort dispatch (no FFN)",
         lambda lg, xx: jnp.sum(sort_dispatch(lg, xx)[0]
                                .astype(jnp.float32))),
        ("expert FFN only (E,cap,d)",
         lambda lg, xx: jnp.sum(ffn(
             jnp.broadcast_to(xx[:CAP][None], (E, CAP, D))
         ).astype(jnp.float32))),
        ("full moe (dispatch+ffn+combine)", full),
    ]
    for name, fn in cases:
        dt = device_time(fn, (logits, x), iters=16,
                         perturb=lambda a, e: (a[0] + e * 1e-9, a[1]))
        log(f"{name:36s} {dt:8.3f} ms")


if __name__ == "__main__":
    main()
