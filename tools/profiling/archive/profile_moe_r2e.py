#!/usr/bin/env python
"""TPU: optimized MoE inference composition A/B — cumsum+1D-scatter
dispatch, bf16 end-to-end FFN, and combine variants — against the
current sort-based composition, with output parity."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from ptime import device_time  # noqa: E402


def log(m):
    print(m, flush=True)


def pert(a, eps):
    return (a[0] + eps * jnp.asarray(1e-9, a[0].dtype),) + tuple(a[1:])


N, D, E, K, HID = 10000, 384, 8, 3, 1536
CAP = int(np.ceil(N * K / E * 1.5))
M = N * K


def gate_fn(x, wp, sim, temp):
    proj = x @ wp
    proj = proj / jnp.maximum(
        jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-12)
    simn = sim / jnp.maximum(
        jnp.linalg.norm(sim, axis=0, keepdims=True), 1e-12)
    logits = (proj @ simn) * jnp.exp(jnp.minimum(temp, 4.6))
    top_logits, top_idx = jax.lax.top_k(logits, min(K + 1, E))
    return (jax.nn.softmax(top_logits[:, :K], axis=-1),
            top_idx[:, :K])


@jax.jit
def moe_sorted(x, wp, sim, temp, w1, b1, w2, b2):
    top_k_gates, top_k_idx = gate_fn(x, wp, sim, temp)
    flat_expert = top_k_idx.reshape(-1)
    flat_gate = top_k_gates.reshape(-1)
    counts = jnp.sum(jax.nn.one_hot(flat_expert, E, dtype=jnp.int32),
                     axis=0)
    starts = jnp.cumsum(counts) - counts
    order = jnp.argsort(flat_expert, stable=True)
    inv = jnp.argsort(order, stable=True)
    position = inv - starts[flat_expert]
    keep = position < CAP
    slot = flat_expert * CAP + jnp.minimum(position, CAP - 1)
    rank_grid = starts[:, None] + jnp.arange(CAP)[None, :]
    valid = jnp.arange(CAP)[None, :] < counts[:, None]
    flat_idx = order[jnp.clip(rank_grid, 0, M - 1)]
    buf = (x[flat_idx // K] * valid[..., None].astype(x.dtype)
           ).reshape(E, CAP, D)
    y = jnp.einsum("ecd,edh->ech", buf, w1,
                   preferred_element_type=jnp.float32) + b1[:, None]
    y = jax.nn.gelu(y.astype(x.dtype), approximate=True)
    y = jnp.einsum("ech,ehd->ecd", y, w2,
                   preferred_element_type=jnp.float32) + b2[:, None]
    gathered = y.reshape(E * CAP, D)[slot]
    weighted = gathered * (flat_gate * keep)[:, None].astype(
        gathered.dtype)
    return weighted.reshape(N, K, D).sum(axis=1).astype(x.dtype)


@jax.jit
def moe_opt(x, wp, sim, temp, w1, b1, w2, b2):
    top_k_gates, top_k_idx = gate_fn(x, wp, sim, temp)
    flat_expert = top_k_idx.reshape(-1).astype(jnp.int32)
    flat_gate = top_k_gates.reshape(-1)
    onehot = (flat_expert[:, None]
              == jnp.arange(E, dtype=jnp.int32)[None, :])
    pos_grid = jnp.cumsum(onehot.astype(jnp.int32), axis=0)
    position = jnp.take_along_axis(
        pos_grid, flat_expert[:, None], 1)[:, 0] - 1
    keep = position < CAP
    slot = flat_expert * CAP + jnp.minimum(position, CAP - 1)
    tgt = jnp.where(keep, slot, E * CAP)
    slot_src = jnp.full((E * CAP,), M, jnp.int32).at[tgt].set(
        jnp.arange(M, dtype=jnp.int32), mode="drop",
        unique_indices=True)
    vmask = slot_src < M
    buf = (x[jnp.minimum(slot_src, M - 1) // K]
           * vmask[:, None].astype(x.dtype)).reshape(E, CAP, D)
    y = jnp.einsum("ecd,edh->ech", buf, w1) + b1[:, None]
    y = jax.nn.gelu(y, approximate=True)
    y = jnp.einsum("ech,ehd->ecd", y, w2) + b2[:, None]
    gathered = y.reshape(E * CAP, D)[slot]
    weighted = gathered * (flat_gate * keep)[:, None].astype(
        gathered.dtype)
    return weighted.reshape(N, K, D).sum(axis=1).astype(x.dtype)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(N, D).astype(np.float32)).astype(jnp.bfloat16)
    wp = jnp.asarray(rng.randn(D, 192).astype(np.float32) * 0.05
                     ).astype(jnp.bfloat16)
    sim = jnp.asarray(rng.randn(192, E).astype(np.float32) * 0.01
                      ).astype(jnp.bfloat16)
    temp = jnp.asarray([0.7], jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(E, D, HID).astype(np.float32) * 0.05
                     ).astype(jnp.bfloat16)
    b1 = jnp.zeros((E, HID), jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(E, HID, D).astype(np.float32) * 0.05
                     ).astype(jnp.bfloat16)
    b2 = jnp.zeros((E, D), jnp.bfloat16)
    args = (x, wp, sim, temp, w1, b1, w2, b2)

    a = np.asarray(moe_sorted(*args), np.float32)
    b = np.asarray(moe_opt(*args), np.float32)
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    log(f"sorted-vs-opt output rel diff = {rel:.2e} "
        f"(bf16 FFN rounding expected)")

    for name, fn in (("sorted (current comp)", moe_sorted),
                     ("opt cumsum+bf16     ", moe_opt)):
        t = device_time(fn, args, iters=32, perturb=pert)
        log(f"{name}   {t:7.3f} ms")


if __name__ == "__main__":
    main()
