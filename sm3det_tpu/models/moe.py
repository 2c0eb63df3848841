"""Grid-level sparse Mixture-of-Experts, TPU-first.

Re-design of the reference MoE layer
(``mmrotate/models/backbones/convnext_moe.py:108-293``): noisy top-k gating
with linear or cosine gates, CV² importance/load balance loss, and per-
spatial-token expert FFNs. The reference's ``SparseDispatcher``
(``nonzero``+``sort``+``split``+``index_add``, :250-293) is replaced by
two static-shape TPU dispatchers:

- **training**: capacity-bucketed dispatch — every (token, choice) is
  assigned a slot in a fixed ``(E, capacity)`` buffer via a
  cumulative-count, experts run as ONE batched einsum on the MXU
  (``(E, cap, d) x (E, d, h)``), and results are combined by a gather
  weighted with the gate probabilities. Tokens overflowing an expert's
  capacity are dropped from that expert (residual connections keep them
  on the identity path) — the standard static-shape MoE training
  contract on TPU (static grad shapes, expert-axis sharding).
- **inference** (FFN experts): no-drop group-aligned grouped GEMM
  (``ops/pallas/moe_groupgemm_kernel.py``) — routes sorted by expert,
  each group padded only to the matmul tile, fused Pallas expert FFN.
  Exactly the reference dispatcher's unbounded semantics (zero drops)
  at ~2/3 of the capacity path's dispatch+compute cost
  (docs/PERF.md round 5; disable with ``SM3DET_MOE_GROUPGEMM=0``).

The gating math (noisy top-k, ``_prob_in_top_k`` smooth load estimator,
CV² aux loss) matches ``convnext_moe.py:140-224`` exactly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import GRN, gelu as _policy_gelu


@jax.custom_vjp
def _inv_gather(x, idx, inv_idx, inv_w):
    """``x[idx]`` whose backward is ALSO a gather.

    XLA differentiates a gather into a scatter-add, which the TPU
    row-serializes (the same pathology the forward dispatch avoided,
    see the dispatch comment below — 7.4 ms/layer at bench sizes). The
    MoE routing has a cheap exact inverse, so the caller provides it:
    ``inv_idx[j, r]`` lists (padded) the output rows that read input
    row ``j`` and ``inv_w[j, r]`` masks the padding. The cotangent is
    then ``g_x[j] = sum_r g[inv_idx[j, r]] * inv_w[j, r]`` — one gather
    plus a tiny-axis reduce, no scatter anywhere in the train step.

    x: (N, d); idx: (M,) int; inv_idx/inv_w: (N, R). Returns (M, d).
    """
    return x[idx]


def _inv_gather_fwd(x, idx, inv_idx, inv_w):
    return x[idx], (idx, inv_idx, inv_w)


def _inv_gather_bwd(res, g):
    idx, inv_idx, inv_w = res
    n, r = inv_idx.shape
    gx = (g[inv_idx.reshape(-1)].reshape(n, r, g.shape[-1])
          * inv_w[..., None].astype(g.dtype)).sum(axis=1)
    return (gx,
            np.zeros(idx.shape, jax.dtypes.float0),
            np.zeros(inv_idx.shape, jax.dtypes.float0),
            jnp.zeros_like(inv_w))


_inv_gather.defvjp(_inv_gather_fwd, _inv_gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _bf16_dot(spec, dspec, wspec, x, w):
    """Batched einsum with f32 accumulation whose backward matmuls stay
    at the compute dtype.

    The forward outputs f32 (``preferred_element_type``), so XLA's
    transpose rule sees an f32 cotangent and runs BOTH backward dots as
    f32 matmuls. Here the cotangent is cast once to the operand dtype
    and both dgrad (``dspec``) and wgrad (``wspec``) run as bf16 MXU
    dots with f32 accumulation, rounding the results to the operand
    dtypes — the same contract as every other activation/param tensor
    on the bf16 policy path. Honest measurement (docs/PERF.md round 4):
    at the flagship bench shapes (E=4, cap≈1.2k, d=384) the step-time
    effect is ZERO — the expert dots are small enough to be
    layout/latency-bound, not dtype-bound (wgrad micro-bench: every
    formulation ≤0.35 ms/layer). Kept because it pins the
    backward dtype contract explicitly (no silent f32 promotion when
    expert counts/dims grow) and is grad-parity-tested
    (tests/test_models.py::test_bf16_dot_grads_match_einsum).
    """
    return jnp.einsum(spec, x, w, preferred_element_type=jnp.float32)


def _bf16_dot_fwd(spec, dspec, wspec, x, w):
    return _bf16_dot(spec, dspec, wspec, x, w), (x, w)


def _bf16_dot_bwd(spec, dspec, wspec, res, g):
    x, w = res
    gb = g.astype(x.dtype)
    gx = jnp.einsum(dspec, gb, w,
                    preferred_element_type=jnp.float32).astype(x.dtype)
    gw = jnp.einsum(wspec, x, gb,
                    preferred_element_type=jnp.float32).astype(w.dtype)
    return gx, gw


_bf16_dot.defvjp(_bf16_dot_fwd, _bf16_dot_bwd)


def cv_squared(x, eps: float = 1e-10):
    """Coefficient of variation squared (``convnext_moe.py:140``)."""
    if x.shape[-1] == 1:
        return jnp.zeros(())
    mean = jnp.mean(x)
    var = jnp.var(x, ddof=1)
    return var / (mean ** 2 + eps)


def _normal_cdf(x):
    return 0.5 * (1.0 + jax.lax.erf(x / np.sqrt(2.0)))


def prob_in_top_k(clean_logits, noisy_logits, noise_stddev,
                  noisy_top_values, k: int):
    """Smooth estimate of P[token routed to each expert] under the gate
    noise (``convnext_moe.py:152-191``), used for the load-balance loss."""
    n = clean_logits.shape[0]
    m = noisy_top_values.shape[1]
    # threshold per token: the (k+1)-th noisy value if the expert is "in",
    # else the k-th
    threshold_if_in = noisy_top_values[:, k][:, None] \
        if m > k else noisy_top_values[:, -1][:, None]
    threshold_if_out = noisy_top_values[:, k - 1][:, None]
    is_in = noisy_logits > threshold_if_in
    prob_if_in = _normal_cdf((clean_logits - threshold_if_in) / noise_stddev)
    prob_if_out = _normal_cdf(
        (clean_logits - threshold_if_out) / noise_stddev)
    return jnp.where(is_in, prob_if_in, prob_if_out)


class CosineTopKGate(nn.Module):
    """Cosine-similarity gate (``convnext_moe.py:88-106``)."""

    dim: int
    num_experts: int
    init_t: float = 0.5

    @nn.compact
    def __call__(self, x):
        proj_dim = min(self.dim // 2, 256)
        temperature = self.param(
            "temperature",
            nn.initializers.constant(float(np.log(1.0 / self.init_t))),
            (1,))
        proj = nn.Dense(proj_dim, name="cosine_projector")(x)
        sim_matrix = self.param(
            "sim_matrix", nn.initializers.normal(0.01),
            (proj_dim, self.num_experts))
        proj = proj / jnp.maximum(
            jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-12)
        sim = sim_matrix / jnp.maximum(
            jnp.linalg.norm(sim_matrix, axis=0, keepdims=True), 1e-12)
        logits = proj @ sim
        clamp_max = float(np.log(1.0 / 0.01))
        scale = jnp.exp(jnp.minimum(temperature, clamp_max))
        return logits * scale


class ExpertFFN(nn.Module):
    """All experts' FFN weights stacked on a leading expert axis so the
    forward is one batched MXU einsum per layer."""

    num_experts: int
    dim: int
    hidden: int
    use_grn: bool = False

    def setup(self):
        e, d, h = self.num_experts, self.dim, self.hidden
        self.w1 = self.param("w1", nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal"), (e, d, h))
        self.b1 = self.param("b1", nn.initializers.zeros, (e, h))
        self.w2 = self.param("w2", nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal"), (e, h, d))
        self.b2 = self.param("b2", nn.initializers.zeros, (e, d))
        if self.use_grn:
            self.grn = GRN(self.hidden, name="grn")

    def __call__(self, x):
        """x: (E, cap, d) -> (E, cap, d)."""
        e, h = self.num_experts, self.hidden
        y = _bf16_dot("ecd,edh->ech", "ech,edh->ecd", "ecd,ech->edh",
                      x, self.w1) + self.b1[:, None]
        # f32 matmul accumulation; activation at the compute dtype
        y = _policy_gelu(y.astype(x.dtype))
        if self.use_grn:
            # per-token GRN over channel only reduces to identity-ish for
            # 1D tokens; ConvNeXt-V2 GRN operates on spatial dims, applied
            # upstream. Kept for config parity.
            y = self.grn(y.reshape(e, -1, 1, h)).reshape(e, -1, h)
        y = _bf16_dot("ech,ehd->ecd", "ecd,ehd->ech", "ech,ecd->ehd",
                      y, self.w2) + self.b2[:, None]
        # back to the compute dtype HERE: f32 accumulation happened in
        # the einsum; leaving the (E, cap, d) buffer f32 doubles the
        # HBM traffic of the gather+combine that follows (and silently
        # promoted the combine to f32 despite the gate cast)
        return y.astype(x.dtype)

    def grouped(self, x_slots, tile_expert):
        """No-drop grouped inference FFN over the group-aligned sorted
        slot layout (``ops/pallas/moe_groupgemm_kernel.py``): Pallas on
        TPU (weights VMEM-resident per expert group, hidden never hits
        HBM), jnp tile-gathered einsum elsewhere. Same numeric contract
        as ``__call__``."""
        from ..ops.pallas.moe_groupgemm_kernel import (moe_ffn_grouped,
                                                      moe_ffn_grouped_ref)
        # the Pallas kernel only on the TPU bf16-policy path: the fp32
        # path's exact-erf GELU (models/layers.py::gelu) has no Pallas
        # TPU lowering (erfc unimplemented). The jnp fallback keeps the
        # same no-drop semantics everywhere else: its (T, d, h) weight
        # tile-gather is a few hundred wide descriptors
        # (bandwidth-bound), not a per-row gather.
        if jax.default_backend() == "tpu" and \
                x_slots.dtype == jnp.bfloat16:
            return moe_ffn_grouped(x_slots, tile_expert, self.w1, self.b1,
                                   self.w2, self.b2)
        return moe_ffn_grouped_ref(x_slots, tile_expert, self.w1, self.b1,
                                   self.w2, self.b2)


class ExpertLinear(nn.Module):
    """Per-expert single projection (the 1x1-conv experts of the LSK/VAN
    MoE variants, ``lsk_moe.py:92``), stacked for one batched einsum."""

    num_experts: int
    dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        """x: (E, cap, d) -> (E, cap, out)."""
        e, d, o = self.num_experts, self.dim, self.out_dim
        w = self.param("w", nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal"), (e, d, o))
        b = self.param("b", nn.initializers.zeros, (e, o))
        y = _bf16_dot("ecd,edo->eco", "eco,edo->ecd", "ecd,eco->edo",
                      x, w) + b[:, None]
        return y.astype(x.dtype)   # f32 accumulated; combine at x.dtype


class MoELayer(nn.Module):
    """Grid-level sparse MoE over flattened spatial tokens.

    Returns ``(y, aux_loss)`` like ``MoE_layer.forward``
    (``convnext_moe.py:226-248``). ``expert_kind='ffn'`` uses two-layer
    FFN experts (ConvNeXt/Swin); ``'linear'`` uses single-projection
    experts with ``out_dim`` output channels (LSKNet/VAN fc1/fc2 MoE).
    """

    dim: int
    hidden: int
    num_experts: int = 8
    top_k: int = 2
    gating: str = "cosine"             # 'cosine' | 'linear'
    noisy_gating: bool = True
    capacity_factor: float = 1.5
    loss_coef: float = 1e-2
    use_grn: bool = False
    expert_kind: str = "ffn"           # 'ffn' | 'linear'
    out_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (N, d) flattened tokens -> (N, d), scalar aux loss."""
        n, d = x.shape
        e, k = self.num_experts, self.top_k

        # ---- gating -------------------------------------------------------
        if self.gating == "linear":
            w_gate = self.param("w_gate", nn.initializers.zeros, (d, e))
            clean_logits = x @ w_gate
        else:
            clean_logits = CosineTopKGate(
                d, e, name="w_gate")(x)

        if self.noisy_gating and train:
            w_noise = self.param("w_noise", nn.initializers.zeros, (d, e))
            raw_noise = x @ w_noise
            noise_std = jax.nn.softplus(raw_noise) + 1e-2
            noise = jax.random.normal(
                self.make_rng("moe_noise"), clean_logits.shape)
            logits = clean_logits + noise * noise_std
        else:
            logits = clean_logits

        m = min(k + 1, e)
        top_logits, top_idx = jax.lax.top_k(logits, m)       # (N, m)
        top_k_logits = top_logits[:, :k]
        top_k_idx = top_idx[:, :k]                           # (N, k)
        top_k_gates = jax.nn.softmax(top_k_logits, axis=-1)  # (N, k)
        # expert-routing visualization hook (tools/view.py): captured when
        # apply() is called with mutable=['intermediates']
        self.sow("intermediates", "expert_ids", top_k_idx)

        if train:
            # dense gates matrix for the aux loss, composed scatter-free
            # as a one-hot multiply-reduce (an .at[].set scatter would
            # row-serialize on TPU, and its backward is another gather)
            gates = jnp.einsum(
                "nke,nk->ne",
                jax.nn.one_hot(top_k_idx, e, dtype=logits.dtype),
                top_k_gates)
            importance = gates.sum(0)
            if self.noisy_gating and k < e:
                load = prob_in_top_k(
                    clean_logits, logits, noise_std, top_logits, k).sum(0)
            else:
                load = (gates > 0).sum(0).astype(jnp.float32)
            aux = (cv_squared(importance) + cv_squared(load)) * \
                self.loss_coef
        else:
            # inference: the balance loss is unused — skip its scatter
            # and reductions entirely (reference computes it
            # unconditionally; the value is identical, just dead)
            aux = jnp.zeros((), jnp.float32)

        # ---- dispatch ------------------------------------------------------
        # Shared routing arithmetic (sort-based, scatter-free — TPU: XLA
        # scatter-add is the dominant cost of the naive formulation,
        # 7.4 ms/layer at bench sizes, tools/profiling/archive/
        # profile_backbone3.py): a stable argsort by expert id yields
        # each (token, choice)'s rank; rank - expert_start is its
        # position in the expert's bucket.
        m = n * k

        flat_expert = top_k_idx.reshape(-1)                  # (N*k,)
        flat_gate = top_k_gates.reshape(-1)

        oh = jax.nn.one_hot(flat_expert, e, dtype=jnp.int32)  # (N*k, E)
        counts = jnp.sum(oh, axis=0)                          # (E,)
        starts = jnp.cumsum(counts) - counts                  # (E,)
        order = jnp.argsort(flat_expert, stable=True)         # (N*k,)
        # position-in-expert straight from the running per-expert count
        # (== rank - expert_start, but without the second argsort the
        # rank recovery cost: one (N*k, E) i32 cumsum is ~10x cheaper
        # than argsort(order) at bench sizes)
        pos_all = jnp.cumsum(oh, axis=0) - oh                 # (N*k, E)
        # select the routed expert's running count with a one-hot
        # multiply-reduce over the tiny E axis: take_along_axis lowers to
        # a per-row gather the TPU serializes (~5 ms/iter at bench sizes)
        position = jnp.sum(pos_all * oh, axis=1)              # (N*k,)

        experts_mod = None
        if self.expert_kind == "ffn":
            experts_mod = ExpertFFN(e, d, self.hidden,
                                    use_grn=self.use_grn, name="experts")

        import os
        if (not train and experts_mod is not None and not self.use_grn
                and os.environ.get("SM3DET_MOE_GROUPGEMM", "1") != "0"):
            # ---- no-drop grouped inference dispatch ------------------------
            # Group-ALIGNED sorted layout: expert e's tokens occupy
            # [astart_e, astart_e + counts_e) with astart_e a TILE
            # multiple, so every TILE-row tile belongs to one expert and
            # the fused grouped GEMM (moe_groupgemm_kernel) selects its
            # weights by tile. vs the capacity path this (a) drops NO
            # routes — exactly the reference SparseDispatcher's
            # unbounded semantics (convnext_moe.py:250-293) — and
            # (b) cuts dispatch descriptors + expert FLOPs from
            # cf * N*k to N*k + E*TILE (-29% at the flagship cf=1.5,
            # docs/PERF.md round 5).
            tile = 256 if d > 512 else 512
            aligned = ((counts + tile - 1) // tile) * tile     # (E,)
            astart = jnp.cumsum(aligned) - aligned             # (E,)
            s_static = int(-(-m // tile) * tile) + e * tile
            n_tiles = s_static // tile
            ends = jnp.cumsum(aligned)
            tile_e = jnp.clip(
                jnp.searchsorted(ends, jnp.arange(n_tiles) * tile,
                                 side="right"),
                0, e - 1).astype(jnp.int32)
            slot_e = jnp.repeat(tile_e, tile)                  # (S,)
            local = jnp.arange(s_static) - astart[slot_e]
            src_route = order[jnp.clip(starts[slot_e] + local, 0, m - 1)]
            x_slots = x[src_route // k]                        # (S, d)
            y_slots = experts_mod.grouped(x_slots, tile_e)
            # combine: every route is kept; group-padding slots are
            # simply never read
            pos_route = astart[flat_expert] + position         # (N*k,)
            gathered = y_slots[pos_route]
            weighted = gathered * flat_gate[:, None].astype(gathered.dtype)
            y = weighted.reshape(n, k, d).sum(axis=1)
            self.sow("intermediates", "drop_fraction", jnp.zeros(()))
            return y.astype(x.dtype), aux

        # ---- capacity-bucketed dispatch (training; linear/GRN experts) -----
        # The (E, capacity) buffer is ONE gather and the combine is a
        # (N, k, d) reshape-sum. Drop semantics identical to the cumsum
        # formulation (earlier flat index -> earlier position; overflow
        # dropped).
        capacity = int(np.ceil(n * k / e * self.capacity_factor))
        capacity = max(capacity, 4)
        keep = position < capacity
        # capacity A/B instrument (SURVEY §7): fraction of (token, choice)
        # routes dropped by the static capacity — capture via
        # mutable=['intermediates'] to tune capacity_factor against the
        # reference's unbounded dispatcher
        self.sow("intermediates", "drop_fraction",
                 1.0 - jnp.mean(keep.astype(jnp.float32)))

        slot = flat_expert * capacity + jnp.minimum(
            position, capacity - 1)                           # (N*k,)
        # slot (e, pos) holds the (pos+1)-th occurrence of expert e
        rank_grid = starts[:, None] + jnp.arange(capacity)[None, :]
        valid = jnp.arange(capacity)[None, :] < counts[:, None]
        flat_idx = order[jnp.clip(rank_grid, 0, m - 1)]       # (E, cap)
        # dispatch gather. Its exact inverse (for the scatter-free
        # backward, see _inv_gather): token t is read at buf position
        # slot[t*k + c] for each KEPT choice c (a kept route i fills
        # position starts[e_i] + position_i == slot[i]; invalid buf
        # rows are masked by `valid` so their cotangent is already 0).
        keep_w = keep.astype(jnp.float32).reshape(n, k)
        buf = _inv_gather(x, (flat_idx // k).reshape(-1),
                          slot.reshape(n, k), keep_w)
        buf = buf.reshape(e, capacity, d) * valid[..., None].astype(x.dtype)

        if self.expert_kind == "linear":
            out_d = self.out_dim or d
            out_buf = ExpertLinear(e, d, out_d, name="experts")(buf)
        else:
            out_d = d
            out_buf = experts_mod(buf)
        out_buf = out_buf.reshape(e * capacity, out_d)

        # combine gather; inverse: buf position (e, pos) is read (with a
        # nonzero cotangent — dropped routes' reads are zeroed by the
        # keep factor in `weighted` below) only by its owner route
        # flat_idx[e, pos], valid positions only
        gathered = _inv_gather(
            out_buf, slot, flat_idx.reshape(-1, 1),
            valid.reshape(-1, 1).astype(jnp.float32))             # (N*k, o)
        # combine in the compute dtype: an f32 gate vector would promote
        # the whole (N*k, o) combine to f32 (2x memory traffic on the
        # bf16 policy path)
        weighted = gathered * (flat_gate * keep)[:, None].astype(
            gathered.dtype)
        # flat index i = token*k + choice, so the combine is a reshape-sum
        y = weighted.reshape(n, k, out_d).sum(axis=1)
        return y.astype(x.dtype), aux
