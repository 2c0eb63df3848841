"""Grouped expert-FFN GEMM for no-drop MoE inference.

The capacity-bucketed dispatch (models/moe.py) pads every expert's
bucket to ``capacity = N*k/E * cf`` — at the flagship cf=1.5 a third of
the dispatch-gather descriptors and expert MXU FLOPs are *always*
padding, and the (E, cap, hidden) activation round-trips HBM between
the two expert einsums. This kernel computes the expert FFN over a
**group-aligned sorted slot layout** instead: tokens sorted by expert,
each expert's group padded only to the matmul tile size, so every
``TILE``-row tile belongs to exactly one expert (``tile_expert``,
scalar-prefetched). Per grid step it keeps the current expert's
weights in VMEM (re-DMA'd only when the expert id changes — E times
per layer, not per tile) and fuses dot1 + bias + GELU + dot2 + bias,
so the hidden activation never leaves VMEM.

This is the TPU analog of the reference's unbounded ragged dispatcher
(``mmrotate/models/backbones/convnext_moe.py:250-293`` SparseDispatcher):
like the reference — and unlike the capacity path — it drops NO routes,
at ~(N*k + E*TILE)/(N*k*cf) of the capacity path's dispatch/compute
cost. Numeric contract matches ``moe.py::ExpertFFN`` exactly:
f32-accumulated dots, bias in f32, GELU at the compute dtype
(dtype-gated tanh approximation, ``models/layers.py::gelu``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from flax import linen as nn


def _gelu_policy(x):
    # models/layers.py::gelu — tanh approx iff bf16 (exact erf costs
    # ~6 ms/step at bench shapes, error below bf16 quantization noise)
    return nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))


def _kernel(te_ref, x_ref, b1_ref, b2_ref, w1_hbm, w2_hbm, out_ref,
            w1_s, w2_s, sems, *, compute_dtype):
    i = pl.program_id(0)
    e = te_ref[i]
    prev = te_ref[jnp.maximum(i - 1, 0)]   # clamped: no OOB read at i=0

    def w_dma():
        return (pltpu.make_async_copy(w1_hbm.at[e], w1_s, sems.at[0]),
                pltpu.make_async_copy(w2_hbm.at[e], w2_s, sems.at[1]))

    @pl.when((i == 0) | (e != prev))
    def _():
        # expert changed (<= E times over the whole grid: tiles are
        # group-aligned and sorted by expert) — blocking weight reload
        c1, c2 = w_dma()
        c1.start()
        c2.start()
        c1.wait()
        c2.wait()

    def bias_row(b_ref):
        # dynamic-row VMEM reads need sublane-aligned indices Mosaic
        # can't prove for a scalar expert id; the (E, .) bias buffers
        # are tiny, so select the row with an iota-mask reduce instead
        nume = b_ref.shape[0]
        mask = (jax.lax.broadcasted_iota(jnp.int32, (nume, 1), 0) == e)
        return jnp.sum(jnp.where(mask, b_ref[...].astype(jnp.float32),
                                 0.0), axis=0)

    x = x_ref[...]
    h = jnp.dot(x.astype(compute_dtype), w1_s[...].astype(compute_dtype),
                preferred_element_type=jnp.float32)
    h = h + bias_row(b1_ref)[None, :]
    h = _gelu_policy(h.astype(x.dtype))
    y = jnp.dot(h.astype(compute_dtype), w2_s[...].astype(compute_dtype),
                preferred_element_type=jnp.float32)
    y = y + bias_row(b2_ref)[None, :]
    out_ref[...] = y.astype(out_ref.dtype)


def moe_ffn_grouped_ref(x_slots, tile_expert, w1, b1, w2, b2):
    """jnp reference (and CPU production path): per-tile weight gather.

    Memory-hungry at device scale ((T, d, h) gathered weights) but exact
    and cheap at test/CPU sizes; the Pallas kernel must match it
    bit-for-bit in f32 and to bf16 rounding on the policy path.
    """
    s, d = x_slots.shape
    t = tile_expert.shape[0]
    tile = s // t
    xt = x_slots.reshape(t, tile, d)
    h = jnp.einsum("tbd,tdh->tbh", xt, w1[tile_expert],
                   preferred_element_type=jnp.float32)
    h = h + b1[tile_expert][:, None].astype(jnp.float32)
    h = _gelu_policy(h.astype(x_slots.dtype))
    y = jnp.einsum("tbh,thd->tbd", h, w2[tile_expert],
                   preferred_element_type=jnp.float32)
    y = y + b2[tile_expert][:, None].astype(jnp.float32)
    return y.astype(x_slots.dtype).reshape(s, d)


@functools.partial(jax.jit, static_argnames=("interpret",))
def moe_ffn_grouped(x_slots, tile_expert, w1, b1, w2, b2,
                    interpret: bool = False):
    """Fused grouped expert FFN: ``y[s] = FFN_{e(s)}(x_slots[s])``.

    Args:
        x_slots: (S, d) group-aligned expert-sorted tokens; every
            ``S // len(tile_expert)``-row tile belongs to one expert.
        tile_expert: (T,) int32 expert id per tile, ascending.
        w1/b1/w2/b2: stacked expert weights (E,d,h)/(E,h)/(E,h,d)/(E,d).

    Returns:
        (S, d) in ``x_slots.dtype``.
    """
    s, d = x_slots.shape
    t = tile_expert.shape[0]
    tile = s // t
    assert tile * t == s, (s, t)
    h = w1.shape[-1]
    compute_dtype = x_slots.dtype if x_slots.dtype == jnp.bfloat16 \
        else jnp.float32

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i, te: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w1.shape[0], h), lambda i, te: (0, 0),
                         memory_space=pltpu.VMEM),      # b1, full
            pl.BlockSpec((w1.shape[0], d), lambda i, te: (0, 0),
                         memory_space=pltpu.VMEM),      # b2, full
            pl.BlockSpec(memory_space=pltpu.ANY),       # w1 (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),       # w2 (HBM)
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i, te: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((d, h), w1.dtype),
            pltpu.VMEM((h, d), w2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, compute_dtype=compute_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, d), x_slots.dtype),
        interpret=interpret,
    )(tile_expert.astype(jnp.int32), x_slots, b1, b2, w1, w2)
