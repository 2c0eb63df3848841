"""Exact sort-free top-k selection for NMS prefilters.

``jax.lax.top_k`` on TPU lowers to a variadic (value, index) bitonic
sort of the FULL input — the device trace of the bench joint step
attributed ~10 ms/iter to the GFL/multiclass-NMS prefilter sorts
(s32[180k]-scale sort passes). But an NMS prefilter only needs the
top-k *set*; full sorted order of all N is wasted work.

``exact_topk`` computes the same (values, indices) contract as
``lax.top_k`` (descending values, ties broken by lower index) in
O(iters * N) elementwise work with no large sort:

1. binary-search the kth-largest value t over a bounded score range
   (``iters`` halvings of [lo, hi]; each step is one vectorized
   count — the whole search is a fori_loop over VMEM-resident data);
2. mask = s >= t selects >= k survivors (ties at t may overshoot);
3. compact the first k survivor indices in ascending index order with
   cumsum + searchsorted (18 binary-search gathers of k elements —
   no scatter, no N-sized sort);
4. order the k survivors by a k-sized stable argsort (ties keep
   ascending index order, matching ``lax.top_k``).

Precision: the search resolves value differences larger than
``(hi - lo) / 2**iters`` (defaults: 2e4 / 2**64 ~ 1e-15, far below
f32 ULP for any score above ~1e-5). Scores are clipped to [lo, hi]
for the search only; returned values are gathered from the original
input, so -inf padding rows come back as -inf exactly like
``lax.top_k``.

Parity anchor: reference prefilters use torch.topk on score tensors
(mmdet anchor_head get_bboxes nms_pre path; mmrotate
``rotated_anchor_head.py`` same), whose selection this reproduces
exactly for bounded scores.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["exact_topk"]


@functools.partial(jax.jit,
                   static_argnames=("k", "iters", "lo", "hi", "ordered"))
def exact_topk(scores, k: int, *, iters: int = 64,
               lo: float = -1.0e4, hi: float = 1.0e4,
               ordered: bool = True):
    """Drop-in ``lax.top_k(scores, k)`` for 1-D bounded scores.

    Args:
        scores: (N,) array; values meaningfully compared only within
            [lo, hi] (detection scores are sigmoids/logits — far
            inside the default bounds). -inf/+inf are clipped for the
            threshold search but returned verbatim.
        k: static number of elements to select (0 < k <= N).
        ordered: if False, skip the final k-sized sort and return the
            top-k set in ascending-index order (callers that re-sort
            downstream, e.g. greedy NMS, don't need it twice).

    Returns:
        (values (k,), indices (k,) int32) — with ``ordered=True``,
        identical to ``lax.top_k`` up to tie order (both break ties
        by lower index).
    """
    n = scores.shape[-1]
    if scores.ndim != 1:
        raise ValueError("exact_topk is 1-D; vmap for batches")
    if k >= n:
        return lax.top_k(scores, k)
    s = jnp.clip(scores.astype(jnp.float32), lo, hi)

    def body(_, bounds):
        blo, bhi = bounds
        mid = (blo + bhi) * 0.5
        c = jnp.sum(s >= mid)
        take = c >= k        # mid still admits k: tighten lower bound
        return jnp.where(take, mid, blo), jnp.where(take, bhi, mid)

    tlo, thi = lax.fori_loop(
        0, iters, body,
        (jnp.float32(lo), jnp.nextafter(jnp.float32(hi), jnp.inf)))
    # loop invariants: count(s >= tlo) >= k, count(s >= thi) < k.
    # Everything >= thi is definitely top-k; the remaining slots are
    # filled by ascending index from the boundary band [tlo, thi)
    # (exact ties at the kth value — lax.top_k breaks them the same
    # way; sub-ULP near-ties follow the precision note above).
    sure = s >= thi
    band = (s >= tlo) & ~sure
    n_sure = jnp.sum(sure.astype(jnp.int32))
    band_rank = jnp.cumsum(band.astype(jnp.int32))
    mask = sure | (band & (band_rank <= k - n_sure))
    csum = jnp.cumsum(mask.astype(jnp.int32))
    idx = jnp.searchsorted(
        csum, jnp.arange(1, k + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    vals = scores[idx].astype(scores.dtype)
    if ordered:
        order = jnp.argsort(-vals, stable=True)   # ties: ascending idx
        idx = idx[order]
        vals = vals[order]
    return vals, idx
