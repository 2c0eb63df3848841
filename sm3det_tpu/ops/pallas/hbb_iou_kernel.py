"""Pallas TPU kernel: tiled pairwise horizontal (axis-aligned) IoU.

The RPN/GFL NMS suppression matrices are built from ``bbox_overlaps``
(mmdet semantics, mirrored by ``sm3det_tpu.ops.nms.bbox_overlaps``). At
bench scale XLA materializes the broadcasted (B, L, N, N, 2) min/max
intermediates (~5 ms/iter of fusions at [8:4:4] in the device trace).
This kernel computes (BLK, BLK) output tiles straight from the (4, N)
transposed box params — one HBM pass for the output, nothing else —
and supports the same ``triu`` skip as the rotated kernel: greedy NMS
(``ops/nms.py::greedy_keep``) reads only the strict upper triangle of
the score-ordered matrix.

Parity: exact same formula as ``bbox_overlaps`` (iou mode, eps=1e-6),
asserted in tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128


def _hbb_block_kernel(b1_ref, b2_ref, out_ref, *, eps: float,
                      triu: bool):
    def compute():
        p1 = b1_ref[...]                   # (4/8, BLK) sublane-padded
        p2 = b2_ref[...]
        x1a, y1a, x2a, y2a = (p1[i].reshape(-1, 1) for i in range(4))
        x1b, y1b, x2b, y2b = (p2[i].reshape(1, -1) for i in range(4))
        area1 = (x2a - x1a) * (y2a - y1a)
        area2 = (x2b - x1b) * (y2b - y1b)
        iw = jnp.maximum(jnp.minimum(x2a, x2b) - jnp.maximum(x1a, x1b),
                         0.0)
        ih = jnp.maximum(jnp.minimum(y2a, y2b) - jnp.maximum(y1a, y1b),
                         0.0)
        inter = iw * ih
        union = area1 + area2 - inter
        out_ref[...] = inter / jnp.maximum(union, eps)

    if not triu:
        compute()
        return
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j < i)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(j >= i)
    def _():
        compute()


@functools.partial(jax.jit, static_argnames=("eps", "triu", "interpret"))
def hbb_iou_pallas(boxes1, boxes2, eps: float = 1e-6,
                   triu: bool = False, interpret: bool = False):
    """(N, 4) x (M, 4) xyxy -> (N, M) IoU via the tiled Pallas kernel.

    ``triu=True`` zeroes blocks strictly below the diagonal without
    computing them (score-ordered NMS suppression use).
    """
    n, m = boxes1.shape[0], boxes2.shape[0]
    pad_n = (-n) % BLK
    pad_m = (-m) % BLK
    b1 = jnp.pad(boxes1.astype(jnp.float32), ((0, pad_n), (0, 0))).T
    b2 = jnp.pad(boxes2.astype(jnp.float32), ((0, pad_m), (0, 0))).T
    np_, mp_ = n + pad_n, m + pad_m

    out = pl.pallas_call(
        functools.partial(_hbb_block_kernel, eps=eps, triu=triu),
        grid=(np_ // BLK, mp_ // BLK),
        in_specs=[
            pl.BlockSpec((4, BLK), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, BLK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, BLK), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, mp_), jnp.float32),
        interpret=interpret,
    )(b1, b2)
    return out[:n, :m]
