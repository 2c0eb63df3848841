"""Pallas TPU kernel: tiled pairwise rotated IoU.

The NMS suppression matrix is the hottest geometry workload (N x M pairs
x ~100 flops of interval clipping). This kernel tiles the (N, M) output
into (BLK, BLK) VMEM blocks; each program computes one block fully on the
VPU with the same Green's-theorem interval-clipping algorithm as
``sm3det_tpu.ops.rotated_iou`` (the correctness oracle in tests).

Layout notes (Pallas TPU):
- boxes are passed TRANSPOSED as (5, N) so the lane dim is the box index
  (last-dim 128 tiling); the 5 param rows sit in sublanes.
- all per-pair math is (BLK, BLK) elementwise; the 2x4x4 edge-clip loops
  are unrolled at trace time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128
_EPS = 1e-8
# group id marking entries whose IoU rows/cols are never read (padding or
# NMS-ineligible candidates); blocks made entirely of such entries are
# skipped without computing. Kept far below int32 overflow when block
# min/max are taken.
INERT_GROUP = 1 << 20


def _corners_rowcol(params, row: bool):
    """params (5, BLK) -> lists of 4 corner coordinate grids.

    Row boxes broadcast along axis 1 ((BLK, 1)); col boxes along axis 0.
    """
    x, y, w, h, a = (params[i] for i in range(5))
    ca, sa = jnp.cos(a), jnp.sin(a)
    wx, wy = 0.5 * w * ca, 0.5 * w * sa
    hx, hy = -0.5 * h * sa, 0.5 * h * ca
    cx = [x - wx - hx, x + wx - hx, x + wx + hx, x - wx + hx]
    cy = [y - wy - hy, y + wy - hy, y + wy + hy, y - wy + hy]

    def shape(v):
        return v.reshape(-1, 1) if row else v.reshape(1, -1)

    return [shape(v) for v in cx], [shape(v) for v in cy]


def _clip_contrib(sub_x, sub_y, clip_x, clip_y, eps_inside):
    """Green's contribution of sub edges clipped inside clip; all grids
    broadcast to (BLK, BLK)."""
    total = None
    for i in range(4):
        px, py = sub_x[i], sub_y[i]
        qx, qy = sub_x[(i + 1) % 4], sub_y[(i + 1) % 4]
        dx, dy = qx - px, qy - py
        t_lo = jnp.zeros((BLK, BLK), jnp.float32)
        t_hi = jnp.ones((BLK, BLK), jnp.float32)
        for k in range(4):
            ox, oy = clip_x[k], clip_y[k]
            ex = clip_x[(k + 1) % 4] - ox
            ey = clip_y[(k + 1) % 4] - oy
            el = jnp.maximum(jnp.sqrt(ex * ex + ey * ey), _EPS)
            a0 = (ex * (py - oy) - ey * (px - ox)) / el + eps_inside
            b0 = (ex * dy - ey * dx) / el
            safe_b = jnp.where(jnp.abs(b0) < _EPS, _EPS, b0)
            tc = -a0 / safe_b
            degenerate = jnp.abs(b0) < _EPS
            t_lo = jnp.where((b0 > _EPS) & (tc > t_lo), tc, t_lo)
            t_lo = jnp.where(degenerate & (a0 < 0), 1.0, t_lo)
            t_hi = jnp.where((b0 < -_EPS) & (tc < t_hi), tc, t_hi)
            t_hi = jnp.where(degenerate & (a0 < 0), 0.0, t_hi)
        valid = t_hi > t_lo
        x0 = px + t_lo * dx
        y0 = py + t_lo * dy
        x1 = px + t_hi * dx
        y1 = py + t_hi * dy
        c = 0.5 * (x0 * y1 - y0 * x1)
        c = jnp.where(valid, c, 0.0)
        total = c if total is None else total + c
    return total


def _iou_block_compute(b1_ref, b2_ref, out_ref):
    p1 = b1_ref[...]                   # (5/8, BLK) sublane-padded
    p2 = b2_ref[...]
    rx, ry = _corners_rowcol(p1, row=True)
    cx, cy = _corners_rowcol(p2, row=False)
    inter = _clip_contrib(rx, ry, cx, cy, 1e-4) + \
        _clip_contrib(cx, cy, rx, ry, -1e-4)
    inter = jnp.maximum(inter, 0.0)
    area1 = (p1[2] * p1[3]).reshape(-1, 1)
    area2 = (p2[2] * p2[3]).reshape(1, -1)
    union = area1 + area2 - inter
    out_ref[...] = jnp.where(union > _EPS,
                             inter / jnp.maximum(union, _EPS), 0.0)


def _iou_block_kernel(b1_ref, b2_ref, out_ref, *, triu: bool = False):
    if not triu:
        _iou_block_compute(b1_ref, b2_ref, out_ref)
        return
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j < i)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(j >= i)
    def _():
        _iou_block_compute(b1_ref, b2_ref, out_ref)


def _iou_block_kernel_banded(gmin1_ref, gmax1_ref, gmin2_ref, gmax2_ref,
                             b1_ref, b2_ref, out_ref, *, triu: bool):
    """Group-banded variant: a (BLK, BLK) tile is computed only when the
    row block's and column block's group-id ranges overlap AND neither
    block is entirely inert (group >= INERT_GROUP). Callers guarantee
    cross-group pairs are never read as suppressors (NMS with class
    offsets) so skipped tiles are exactly zero."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    need = jnp.logical_and(gmax1_ref[i] >= gmin2_ref[j],
                           gmax2_ref[j] >= gmin1_ref[i])
    need = jnp.logical_and(need, gmin1_ref[i] < INERT_GROUP)
    need = jnp.logical_and(need, gmin2_ref[j] < INERT_GROUP)
    if triu:
        need = jnp.logical_and(need, j >= i)

    @pl.when(jnp.logical_not(need))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(need)
    def _():
        _iou_block_compute(b1_ref, b2_ref, out_ref)


def _block_bounds(groups, n, pad):
    g = jnp.pad(groups.astype(jnp.int32), (0, pad),
                constant_values=INERT_GROUP)
    g = g.reshape(-1, BLK)
    return jnp.min(g, axis=1), jnp.max(g, axis=1)


@functools.partial(jax.jit, static_argnames=("triu", "interpret"))
def box_iou_rotated_pallas(boxes1, boxes2, triu: bool = False,
                           groups1=None, groups2=None,
                           interpret: bool = False):
    """(N, 5) x (M, 5) -> (N, M) rotated IoU via the tiled Pallas kernel.

    N, M are padded to 128 internally; callers slice the result.
    ``triu=True`` zeroes (without computing) every block strictly below
    the diagonal — for score-ordered NMS suppression matrices, whose
    consumers only read the strict upper triangle (ops/nms.py
    ``greedy_keep``), this halves the pairwise-clip work.

    ``groups1``/``groups2`` (optional, int32 (N,)/(M,), sorted ascending):
    group-banded mode for multi-class NMS. A 128x128 tile is computed only
    when the row/col group ranges overlap and neither block is entirely
    inert (group >= INERT_GROUP); other tiles are written as zeros without
    touching the polygon clipper. Safe only when cross-group pairs are
    known-zero (class-offset NMS) or never read as suppressors.
    """
    n, m = boxes1.shape[0], boxes2.shape[0]
    pad_n = (-n) % BLK
    pad_m = (-m) % BLK
    b1 = jnp.pad(boxes1.astype(jnp.float32), ((0, pad_n), (0, 0))).T
    b2 = jnp.pad(boxes2.astype(jnp.float32), ((0, pad_m), (0, 0))).T
    np_, mp_ = n + pad_n, m + pad_m

    if groups1 is None:
        out = pl.pallas_call(
            functools.partial(_iou_block_kernel, triu=triu),
            grid=(np_ // BLK, mp_ // BLK),
            in_specs=[
                pl.BlockSpec((5, BLK), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((5, BLK), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, BLK), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((np_, mp_), jnp.float32),
            interpret=interpret,
        )(b1, b2)
        return out[:n, :m]

    gmin1, gmax1 = _block_bounds(groups1, n, pad_n)
    if groups2 is groups1 and m == n:
        gmin2, gmax2 = gmin1, gmax1
    else:
        gmin2, gmax2 = _block_bounds(groups2, m, pad_m)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(np_ // BLK, mp_ // BLK),
        in_specs=[
            pl.BlockSpec((5, BLK), lambda i, j, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, BLK), lambda i, j, *_: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, BLK), lambda i, j, *_: (i, j),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_iou_block_kernel_banded, triu=triu),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((np_, mp_), jnp.float32),
        interpret=interpret,
    )(gmin1, gmax1, gmin2, gmax2, b1, b2)
    return out[:n, :m]
