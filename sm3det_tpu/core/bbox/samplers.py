"""Static-shape random pos/neg sampler (mmdet ``RandomSampler`` /
mmrotate ``RRandomSampler`` semantics).

The reference samples a dynamic number of positives
(``min(#pos, num*pos_fraction)``) and fills the rest with random negatives.
Here the output is a fixed ``num``-slot index vector plus masks: slot ``i``
holds the i-th sampled positive while ``i < n_pos``, then negatives. Unfilled
slots are masked out, which downstream loss code treats as zero-weight — the
loss values match the reference's dynamic sampling exactly in expectation
and per-draw given the same candidate sets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_sample(rng, assigned_gt_inds, num: int, pos_fraction: float):
    """Sample ``num`` priors with at most ``num*pos_fraction`` positives.

    Args:
        rng: PRNG key.
        assigned_gt_inds: (P,) mmdet-style assignment (0 neg, >0 pos).
        num: total samples (static).
        pos_fraction: positive fraction cap.

    Returns:
        dict with
          inds: (num,) int32 indices into the P priors (clipped; check masks)
          pos_mask: (num,) bool — slot holds a sampled positive
          neg_mask: (num,) bool — slot holds a sampled negative
    """
    p = assigned_gt_inds.shape[0]
    rng_pos, rng_neg = jax.random.split(rng)
    is_pos = assigned_gt_inds > 0
    is_neg = assigned_gt_inds == 0
    num_pos_exp = int(num * pos_fraction)

    # only the first ``num`` entries of the random order are ever read,
    # so a k=num partial top-k replaces the full (P log P) stable sort —
    # at RPN scale (P ~ 160k anchors, num = 256) the four per-stream
    # full sorts were ~7.7 ms/step of the training step (device trace)
    k = min(num, p)
    key_pos = jax.random.uniform(rng_pos, (p,)) + \
        jnp.where(is_pos, 0.0, 10.0)
    pos_order = jax.lax.top_k(-key_pos, k)[1]
    n_pos = jnp.minimum(jnp.sum(is_pos), num_pos_exp)

    key_neg = jax.random.uniform(rng_neg, (p,)) + \
        jnp.where(is_neg, 0.0, 10.0)
    neg_order = jax.lax.top_k(-key_neg, k)[1]
    n_neg = jnp.minimum(jnp.sum(is_neg), num - n_pos)

    slots = jnp.arange(num)
    pos_take = pos_order[jnp.clip(slots, 0, k - 1)]
    neg_take = neg_order[jnp.clip(slots - n_pos, 0, k - 1)]
    inds = jnp.where(slots < n_pos, pos_take, neg_take).astype(jnp.int32)
    pos_mask = slots < n_pos
    neg_mask = (slots >= n_pos) & (slots < n_pos + n_neg)
    return {"inds": inds, "pos_mask": pos_mask, "neg_mask": neg_mask}
