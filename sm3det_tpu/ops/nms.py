"""Static-shape NMS (horizontal + rotated) for TPU.

Replaces the reference CUDA ops ``nms`` / ``nms_rotated``
(``mmcv/mmcv/ops/csrc/pytorch/nms.cpp``, ``nms_rotated.cpp``) and the
post-processing wrapper ``multiclass_nms_rotated``
(``mmrotate/core/post_processing/bbox_nms_rotated.py:7``) with a fully
static-shaped design: every function returns fixed-size outputs with a
validity mask, so it compiles once under ``jit`` and never syncs to host.

Algorithm: compute the pairwise suppression matrix (IoU > thr) in score
order, then resolve greedy-NMS keep decisions by fixpoint iteration —
``keep[i] = eligible[i] and no kept j<i suppresses i``. After iteration
``t`` all prefix decisions ``i <= t`` are exact, and in practice the
fixpoint is reached in a handful of sweeps, each a dense (N,N)x(N) masked
reduction that the VPU eats; this avoids the O(N)-deep scalar loop of a
naive port.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rotated_iou import box_iou_rotated_chunked


def _pairwise_rotated_iou(boxes1, boxes2, row_chunk: int = 256,
                          triu: bool = False, groups=None):
    """Pairwise rotated IoU, dispatched to the tiled Pallas TPU kernel on
    TPU backends (1.6x the jnp chunked path at N=2000 on-chip; see
    tools/profiling/profile_micro.py) and the jnp path elsewhere. Both implement the
    same Green's-theorem interval clipping; parity is asserted in
    tests/test_pallas_kernels.py.

    ``triu=True`` (suppression-matrix callers): blocks strictly below the
    diagonal are zeroed without computing — ``greedy_keep`` only reads
    the strict upper triangle.

    ``groups`` (int32 (N,), ascending, boxes1 is boxes2): group-banded
    suppression matrix — cross-group pairs are DEFINED as zero. On TPU the
    kernel skips 128x128 tiles whose row/col group ranges don't overlap
    (multi-class NMS: ~4% of tiles are same-class at 26 classes); the jnp
    path computes densely then masks."""
    if jax.default_backend() == "tpu":
        from .pallas.rotated_iou_kernel import box_iou_rotated_pallas
        return box_iou_rotated_pallas(boxes1, boxes2, triu=triu,
                                      groups1=groups, groups2=groups)
    iou = box_iou_rotated_chunked(boxes1, boxes2, row_chunk=row_chunk)
    if groups is not None:
        iou = iou * (groups[:, None] == groups[None, :])
    return iou

__all__ = [
    "bbox_overlaps",
    "greedy_keep",
    "nms",
    "soft_nms",
    "batched_nms",
    "nms_rotated",
    "multiclass_nms_rotated",
    "multiclass_nms",
    "aug_multiclass_nms_rotated",
]

NEG_INF = -1e10


def _topk_scores(flat_scores, k: int):
    """``lax.top_k`` for NMS prefilters.

    The sort-free ``exact_topk`` selection (same results;
    tests/test_topk.py) is available behind SM3DET_EXACT_TOPK_MIN
    (trace-time size gate) but OFF by default: the end-to-end bench
    A/B showed its 64-step sequential threshold search costs more than
    the variadic bitonic sort it replaces at bench shapes
    (97.2 vs 90.9 img/s) — the earlier per-op trace attribution did
    not survive whole-graph measurement."""
    import os
    gate = os.environ.get("SM3DET_EXACT_TOPK_MIN")
    if gate is not None and flat_scores.shape[0] >= int(gate):
        from .topk import exact_topk
        return exact_topk(flat_scores, k)
    return jax.lax.top_k(flat_scores, k)


def bbox_overlaps(boxes1, boxes2, mode: str = "iou", aligned: bool = False,
                  eps: float = 1e-6):
    """Horizontal IoU/IoF, mirroring mmdet ``bbox_overlaps`` semantics."""
    area1 = (boxes1[..., 2] - boxes1[..., 0]) * \
        (boxes1[..., 3] - boxes1[..., 1])
    area2 = (boxes2[..., 2] - boxes2[..., 0]) * \
        (boxes2[..., 3] - boxes2[..., 1])
    if not aligned:
        b1 = boxes1[..., :, None, :]
        b2 = boxes2[..., None, :, :]
        area1 = area1[..., :, None]
        area2 = area2[..., None, :]
    else:
        b1, b2 = boxes1, boxes2
    lt = jnp.maximum(b1[..., :2], b2[..., :2])
    rb = jnp.minimum(b1[..., 2:4], b2[..., 2:4])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    if mode == "iou":
        union = area1 + area2 - inter
    elif mode == "iof":
        union = area1
    else:
        raise ValueError(mode)
    return inter / jnp.maximum(union, eps)


def _fixpoint_keep(supf: jnp.ndarray, eligible: jnp.ndarray) -> jnp.ndarray:
    """Fixpoint resolution of greedy keep on a pre-masked (strictly upper
    triangular, f32) suppression matrix. After sweep ``t`` all prefix
    decisions ``i <= t`` are exact; converges in a handful of sweeps."""
    n = supf.shape[0]

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < n)

    def body(state):
        keep, _, it = state
        # suppressed[i] = any_j keep[j] & sup[j, i]  — one matvec on the VPU
        suppressed = (keep.astype(jnp.float32) @ supf) > 0.5
        new_keep = eligible & ~suppressed
        return new_keep, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (eligible, jnp.zeros_like(eligible), 0))
    return keep


def greedy_keep(sup: jnp.ndarray, eligible: jnp.ndarray,
                block: int = 256) -> jnp.ndarray:
    """Greedy-NMS keep mask given a score-ordered suppression matrix.

    Blocked-exact algorithm: score-ordered blocks of ``block`` rows are
    resolved sequentially (``lax.scan``); within a block the keep decisions
    come from a small fixpoint iteration, then ONE (block, N) masked matvec
    propagates the block's suppression to all later boxes. This reads the
    suppression matrix exactly once (vs. once per sweep for a global
    fixpoint — 4.3 ms -> sub-ms at N=2000 on TPU, tools/profiling/profile_micro.py)
    and is exactly equal to sequential greedy NMS
    (``mmcv/mmcv/ops/csrc/common/box_iou_rotated_utils.hpp`` semantics).

    Args:
        sup: (N, N) bool, ``sup[j, i]`` True if box j (higher score)
            suppresses box i. Only the strict upper triangle (j < i) is used.
        eligible: (N,) bool, candidates that may be kept at all.

    Returns:
        (N,) bool keep mask identical to sequential greedy NMS.
    """
    import os
    block = int(os.environ.get("SM3DET_NMS_KEEP_BLOCK", block))
    n = sup.shape[0]
    if n <= block:
        tri = jnp.tril(jnp.ones((n, n), bool), k=-1).T  # True iff j < i
        return _fixpoint_keep((sup & tri).astype(jnp.float32), eligible)

    # The (N, N) matrix stays bool end to end (the round-2 version
    # materialized a full f32 copy — 670 MB/iter at RPN bench shapes,
    # docs/PERF.md r3 trace). No global triangle mask is needed:
    # within a block the (block, block) sub is masked locally, and a
    # lower-triangle entry sup[j, i] with i <= row0+block can only
    # spuriously clear an ``alive`` column that the scan never slices
    # again (blocks are consumed in ascending row order), while every
    # LATER column automatically has j < i.
    pad = (-n) % block
    m = n + pad
    supb = sup
    if pad:
        supb = jnp.pad(sup, ((0, pad), (0, pad)))
        eligible = jnp.pad(eligible, (0, pad))
    nb = m // block
    tri_b = jnp.tril(jnp.ones((block, block), bool), k=-1).T

    def body(alive, b):
        row0 = b * block
        rows = jax.lax.dynamic_slice(supb, (row0, 0), (block, m))
        sub = jax.lax.dynamic_slice(rows, (0, row0), (block, block))
        elig_b = jax.lax.dynamic_slice(alive, (row0,), (block,))
        keep_b = _fixpoint_keep((sub & tri_b).astype(jnp.float32), elig_b)
        # bf16 matvec: 0/1 values, counts <= block = 256 are exact in
        # bf16 (8 mantissa bits); the convert fuses into the matmul so
        # the bool rows are the only HBM read
        suppressed = jnp.matmul(
            keep_b.astype(jnp.bfloat16), rows.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32) > 0.5
        return alive & ~suppressed, keep_b

    _, keeps = jax.lax.scan(body, eligible,
                            jnp.arange(nb, dtype=jnp.int32))
    return keeps.reshape(m)[:n]


def _finalize(boxes_sorted, scores_sorted, order, keep, max_out):
    """Pack kept entries first, padded to max_out, preserving score order."""
    # kept entries already in score order; bring them to the front
    rank = jnp.cumsum(keep) - 1
    n = keep.shape[0]
    slot = jnp.where(keep, rank, n)            # invalid -> scratch slot n
    inv = jnp.full((max(max_out, n) + 1,), n, jnp.int32)
    inv = inv.at[slot].set(jnp.arange(n, dtype=jnp.int32))
    inv = inv.at[n].set(n)                     # clear the scratch slot
    take = inv[:max_out]
    valid = take < n
    take_safe = jnp.where(valid, take, 0)
    out_idx = jnp.where(valid, order[take_safe], -1)
    out_boxes = boxes_sorted[take_safe] * valid[:, None]
    out_scores = jnp.where(valid, scores_sorted[take_safe], 0.0)
    return out_boxes, out_scores, out_idx, valid


def nms(boxes, scores, iou_threshold: float, max_out: int,
        score_thr: float = float("-inf")):
    """Horizontal greedy NMS with static output size.

    Args:
        boxes: (N, 4) xyxy.
        scores: (N,). Entries with score <= score_thr (or -inf padding)
            are ignored.

    Returns:
        (dets, idx, valid): dets (max_out, 5) [x1,y1,x2,y2,score]; idx
        (max_out,) indices into the input (or -1); valid (max_out,) bool.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    scores_s = scores[order]
    eligible = scores_s > score_thr
    import os
    hbb_gate = int(os.environ.get("SM3DET_HBB_IOU_PALLAS_MIN", "256"))
    if jax.default_backend() == "tpu" and n >= hbb_gate:
        # tiled kernel skips sub-diagonal blocks; XLA materializes the
        # broadcasted (N, N, 2) min/max intermediates (device trace)
        from .pallas.hbb_iou_kernel import hbb_iou_pallas
        iou = hbb_iou_pallas(boxes_s, boxes_s, triu=True)
    else:
        iou = bbox_overlaps(boxes_s, boxes_s)
    keep = greedy_keep(iou > iou_threshold, eligible)
    ob, os, oi, ov = _finalize(boxes_s, scores_s, order, keep, max_out)
    dets = jnp.concatenate([ob, os[:, None]], axis=-1)
    return dets, oi, ov


def soft_nms(boxes, scores, iou_threshold: float = 0.3, max_out: int = 100,
             sigma: float = 0.5, min_score: float = 1e-3,
             method: str = "linear"):
    """Soft-NMS with static output size (mmcv ``ops/nms.py soft_nms``;
    CPU kernel ``csrc/pytorch/nms.cpp softnms_impl``).

    Instead of hard suppression, each selected box decays the scores of
    its overlaps — ``linear``: ``s *= 1 - iou`` when ``iou > thr``;
    ``gaussian``: ``s *= exp(-iou^2 / sigma)``; ``naive``: hard zeroing.
    Sequential max-selection is an ``lax.scan`` of ``max_out`` O(N) steps
    over a precomputed (N, N) IoU matrix — no host sync, one compile.

    Returns:
        (dets, idx, valid): dets (max_out, 5) with the *decayed* score;
        idx (max_out,) indices into the input (or -1); valid (max_out,).
    """
    n = boxes.shape[0]
    iou = bbox_overlaps(boxes, boxes)
    iou = iou * (1.0 - jnp.eye(n, dtype=iou.dtype))

    def step(cur, _):
        i = jnp.argmax(cur)
        s_i = cur[i]
        row = iou[i]
        if method == "gaussian":
            w = jnp.exp(-(row * row) / sigma)
        elif method == "naive":
            w = jnp.where(row > iou_threshold, 0.0, 1.0)
        else:   # linear
            w = jnp.where(row > iou_threshold, 1.0 - row, 1.0)
        nxt = (cur * w).at[i].set(NEG_INF)
        return nxt, (i, s_i)

    _, (sel, sel_scores) = jax.lax.scan(
        step, scores.astype(jnp.float32), None, length=max_out)
    valid = sel_scores > min_score
    sel_safe = jnp.where(valid, sel, 0)
    out_boxes = boxes[sel_safe] * valid[:, None]
    out_scores = jnp.where(valid, sel_scores, 0.0)
    dets = jnp.concatenate([out_boxes, out_scores[:, None]], axis=-1)
    return dets, jnp.where(valid, sel, -1), valid


def batched_nms(boxes, scores, idxs, iou_threshold: float, max_out: int,
                score_thr: float = float("-inf")):
    """Class/level-aware NMS via the coordinate-offset trick.

    Mirrors mmcv ``batched_nms``: boxes of different ``idxs`` never
    suppress each other.
    """
    max_coord = jnp.max(jnp.abs(boxes)) + 1.0
    offsets = idxs.astype(boxes.dtype) * (2.0 * max_coord)
    shifted = boxes + offsets[:, None]
    dets, oi, ov = nms(shifted, scores, iou_threshold, max_out, score_thr)
    # undo the offset on the returned boxes
    safe = jnp.where(oi >= 0, oi, 0)
    out_boxes = jnp.where(ov[:, None], boxes[safe], 0.0)
    dets = jnp.concatenate([out_boxes, dets[:, 4:5]], axis=-1)
    return dets, oi, ov


def nms_rotated(boxes, scores, iou_threshold: float, max_out: int,
                score_thr: float = float("-inf"), row_chunk: int = 256,
                groups=None):
    """Rotated greedy NMS with static output size.

    Args:
        boxes: (N, 5) (cx, cy, w, h, theta).
        groups: optional int32 (N,) in [0, 2**15): boxes of different
            groups never suppress each other (``batched_nms`` semantics
            for rotated boxes). Enables the group-banded IoU kernel:
            candidates are re-ordered group-major (score order within a
            group — provably the same greedy result, since suppression is
            intra-group only) so the suppression matrix is block-diagonal
            and cross-group 128x128 tiles are skipped. Output order and
            values are identical to the ungrouped offset-trick path.

    Returns:
        (dets, idx, valid): dets (max_out, 6) [cx,cy,w,h,theta,score].
    """
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    scores_s = scores[order]
    eligible = scores_s > score_thr
    if groups is None:
        iou = _pairwise_rotated_iou(boxes_s, boxes_s, row_chunk=row_chunk,
                                    triu=True)
        keep = greedy_keep(iou > iou_threshold, eligible)
    else:
        from .pallas.rotated_iou_kernel import INERT_GROUP
        n = boxes.shape[0]
        groups_s = groups[order].astype(jnp.int32)
        # ineligible entries go to an inert band the kernel skips entirely
        g_eff = jnp.where(eligible, groups_s, INERT_GROUP)
        # group-major permutation; arange tiebreak keeps score order
        # within each group (boxes_s is already score-sorted)
        g_key = jnp.where(eligible, groups_s, 1 << 15)
        perm = jnp.argsort(g_key * n + jnp.arange(n, dtype=jnp.int32))
        iou = _pairwise_rotated_iou(boxes_s[perm], boxes_s[perm],
                                    row_chunk=row_chunk, triu=True,
                                    groups=g_eff[perm])
        keep_g = greedy_keep(iou > iou_threshold, eligible[perm])
        keep = jnp.zeros_like(keep_g).at[perm].set(keep_g)
    ob, os, oi, ov = _finalize(boxes_s, scores_s, order, keep, max_out)
    dets = jnp.concatenate([ob, os[:, None]], axis=-1)
    return dets, oi, ov


def multiclass_nms_rotated(multi_bboxes, multi_scores, score_thr: float,
                           iou_thr: float, max_num: int,
                           pre_nms: int = 2000):
    """Multi-class rotated NMS (``bbox_nms_rotated.py:7`` semantics).

    Args:
        multi_bboxes: (N, 5) class-agnostic or (N, C*5) per-class OBBs.
        multi_scores: (N, C+1); the last column is background and dropped.
        pre_nms: static number of (box, class) candidates kept by score
            before NMS (replaces the reference's dynamic score filtering).

    Returns:
        (dets, labels, valid): dets (max_num, 6), labels (max_num,),
        valid (max_num,) bool.
    """
    num_classes = multi_scores.shape[1] - 1
    scores = multi_scores[:, :-1]                       # (N, C)
    n = multi_bboxes.shape[0]
    if multi_bboxes.shape[-1] > 5:
        bboxes = multi_bboxes.reshape(n, num_classes, 5)
    else:
        bboxes = jnp.broadcast_to(
            multi_bboxes[:, None, :], (n, num_classes, 5))

    flat_scores = scores.reshape(-1)
    k = min(pre_nms, flat_scores.shape[0])
    top_scores, top_idx = _topk_scores(flat_scores, k)
    box_idx = top_idx // num_classes
    cls_idx = top_idx % num_classes
    cand_boxes = bboxes[box_idx, cls_idx]               # (k, 5)
    cand_scores = jnp.where(top_scores > score_thr, top_scores, NEG_INF)

    # class-offset trick: translate centers so different classes never overlap
    max_coord = jnp.max(jnp.abs(cand_boxes[:, :2])) + \
        jnp.max(cand_boxes[:, 2:4]) + 1.0
    offset = cls_idx.astype(cand_boxes.dtype) * (2.0 * max_coord)
    shifted = cand_boxes.at[:, :2].add(offset[:, None])

    # groups=cls_idx enables the block-diagonal banded IoU kernel: at 26
    # classes ~96% of the (pre_nms, pre_nms) polygon-clip pairs are
    # cross-class (zero by the offset construction) and are skipped.
    dets, oi, ov = nms_rotated(
        shifted, cand_scores, iou_thr, max_num, score_thr=score_thr,
        groups=cls_idx)
    safe = jnp.where(oi >= 0, oi, 0)
    out_boxes = jnp.where(ov[:, None], cand_boxes[safe], 0.0)
    out_labels = jnp.where(ov, cls_idx[safe], -1)
    dets = jnp.concatenate([out_boxes, dets[:, 5:6]], axis=-1)
    return dets, out_labels, ov


def multiclass_nms(multi_bboxes, multi_scores, score_thr: float,
                   iou_thr: float, max_num: int, pre_nms: int = 2000):
    """Multi-class horizontal NMS (mmdet ``multiclass_nms`` semantics)."""
    num_classes = multi_scores.shape[1] - 1
    scores = multi_scores[:, :-1]
    n = multi_bboxes.shape[0]
    if multi_bboxes.shape[-1] > 4:
        bboxes = multi_bboxes.reshape(n, num_classes, 4)
    else:
        bboxes = jnp.broadcast_to(
            multi_bboxes[:, None, :], (n, num_classes, 4))
    flat_scores = scores.reshape(-1)
    k = min(pre_nms, flat_scores.shape[0])
    top_scores, top_idx = _topk_scores(flat_scores, k)
    box_idx = top_idx // num_classes
    cls_idx = top_idx % num_classes
    cand_boxes = bboxes[box_idx, cls_idx]
    cand_scores = jnp.where(top_scores > score_thr, top_scores, NEG_INF)
    dets, oi, ov = batched_nms(
        cand_boxes, cand_scores, cls_idx, iou_thr, max_num,
        score_thr=score_thr)
    safe = jnp.where(oi >= 0, oi, 0)
    out_labels = jnp.where(ov, cls_idx[safe], -1)
    return dets, out_labels, ov


def aug_multiclass_nms_rotated(dets_list, labels_list, valid_list,
                               iou_thr: float, max_out: int,
                               box_dim: int = 5):
    """Merge multi-augmentation detection sets through one joint
    class-offset NMS (``mmrotate/core/post_processing/
    bbox_nms_rotated.py:113`` ``aug_multiclass_nms_rotated``).

    Inputs: per-augmentation dets ``(N_i, box_dim+1)`` with the score in
    the last column, int labels ``(N_i,)`` and validity masks ``(N_i,)``,
    all already mapped back to original-image coordinates. Static shapes:
    returns ``(dets (max_out, box_dim+1), labels (max_out,),
    valid (max_out,))``. ``box_dim=4`` gives the horizontal variant used
    by the SAR branch's TTA merge.
    """
    boxes = jnp.concatenate([d[:, :box_dim] for d in dets_list])
    scores = jnp.concatenate([
        jnp.where(v, d[:, box_dim], NEG_INF)
        for d, v in zip(dets_list, valid_list)])
    labels = jnp.concatenate(list(labels_list))
    # class-offset trick: different classes never suppress each other
    off = labels.astype(boxes.dtype) * 2e4
    shifted = boxes.at[:, 0].add(off)
    if box_dim == 4:
        dets, idx, valid = nms(shifted, scores, iou_thr, max_out)
    else:
        dets, idx, valid = nms_rotated(shifted, scores, iou_thr, max_out)
    # masked-out input slots carry NEG_INF scores; they must not surface
    # as valid outputs
    valid = valid & (dets[:, box_dim] > NEG_INF / 2)
    safe = jnp.where(idx >= 0, idx, 0)
    out_b = jnp.where(valid[:, None], boxes[safe], 0.0)
    out_l = jnp.where(valid, labels[safe], -1)
    out = jnp.concatenate([out_b, dets[:, box_dim:box_dim + 1]], -1)
    return out, out_l, valid
