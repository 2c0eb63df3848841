"""Rotated mAP evaluation (VOC-style, ``eval_map.py:128`` parity).

``eval_rbbox_map``: per-class tp/fp over score-sorted detections with
greedy gt matching at each IoU threshold (0.50:0.05:0.95 grid like
``eval_map.py:131``), area-interpolated AP, per-class table. The reference
parallelizes with a multiprocessing pool + CUDA IoU; here the IoU matrices
run through the same jnp polygon-clip op (device- or CPU-executed) and the
bookkeeping is vectorized numpy — no process pool needed.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

import jax

from ...ops.nms import bbox_overlaps
from ...ops.rotated_iou import box_iou_rotated


def _bucket(n: int) -> int:
    """Next power-of-two bucket (min 32) so the jnp fallback's jit cache
    hits across the per-image/per-class shape zoo instead of retracing
    every unique (N, G)."""
    b = 32
    while b < n:
        b *= 2
    return b


def _pairwise_iou(dets: np.ndarray, gts: np.ndarray,
                  box_dim: int) -> np.ndarray:
    if len(dets) == 0 or len(gts) == 0:
        return np.zeros((len(dets), len(gts)), np.float32)
    if box_dim == 5:
        # native C++ fast path (tools/build_native.sh); jnp fallback
        from ...native import box_iou_rotated_native
        out = box_iou_rotated_native(dets[:, :5], gts)
        if out is not None:
            return out
    n, g = len(dets), len(gts)
    bn, bg = _bucket(n), _bucket(g)
    db = np.zeros((bn, box_dim), np.float32)
    gb = np.zeros((bg, box_dim), np.float32)
    db[:n] = dets[:, :box_dim]
    gb[:g] = gts
    with jax.default_device(jax.devices("cpu")[0]):
        if box_dim == 5:
            full = np.asarray(box_iou_rotated(db, gb))
        else:
            full = np.asarray(bbox_overlaps(db, gb))
    return full[:n, :g]


def _tpfp(det: np.ndarray, gt_len: int, ious: Optional[np.ndarray],
          iou_thr: float):
    """tp/fp flags for one image-class (``eval_map.py:14`` semantics);
    ``ious`` is the precomputed (N, G) matrix (shared across the IoU
    threshold grid)."""
    nd = len(det)
    tp = np.zeros(nd, np.float32)
    fp = np.zeros(nd, np.float32)
    if gt_len == 0:
        fp[:] = 1
        return tp, fp
    if nd == 0:
        return tp, fp
    order = np.argsort(-det[:, -1])
    matched = np.zeros(gt_len, bool)
    for i in order:
        j = int(np.argmax(ious[i]))
        if ious[i, j] >= iou_thr and not matched[j]:
            matched[j] = True
            tp[i] = 1
        else:
            fp[i] = 1
    return tp, fp


def average_precision(recalls: np.ndarray, precisions: np.ndarray,
                      mode: str = "area") -> float:
    if mode == "area":
        mrec = np.concatenate([[0.0], recalls, [1.0]])
        mpre = np.concatenate([[0.0], precisions, [0.0]])
        for i in range(len(mpre) - 2, -1, -1):
            mpre[i] = max(mpre[i], mpre[i + 1])
        idx = np.where(mrec[1:] != mrec[:-1])[0]
        return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))
    # 11-point
    ap = 0.0
    for t in np.arange(0, 1.1, 0.1):
        prec = precisions[recalls >= t]
        ap += (prec.max() if len(prec) else 0.0) / 11.0
    return float(ap)


def eval_rbbox_map(det_results: List[List[np.ndarray]],
                   annotations: List[Dict],
                   iou_thrs: Optional[Sequence[float]] = None,
                   box_dim: int = 5,
                   logger=print) -> Dict:
    """Compute mAP.

    Args:
        det_results: per image, per class array (N, box_dim+1) with score
            in the last column.
        annotations: per image dict with 'bboxes' (G, box_dim) and
            'labels' (G,).
        iou_thrs: defaults to 0.50:0.05:0.95.

    Returns:
        dict(mAP50, mAP75, mAP, per_class={cls: ap50}).
    """
    if iou_thrs is None:
        iou_thrs = [round(0.5 + 0.05 * i, 2) for i in range(10)]
    num_classes = len(det_results[0])
    num_imgs = len(det_results)

    ap_table = np.zeros((len(iou_thrs), num_classes))
    valid_class = np.zeros(num_classes, bool)
    for c in range(num_classes):
        cls_dets = [det_results[i][c] for i in range(num_imgs)]
        cls_gts = []
        for ann in annotations:
            sel = ann["labels"] == c
            cls_gts.append(ann["bboxes"][sel])
        num_gts = sum(len(g) for g in cls_gts)
        if num_gts == 0 and sum(len(d) for d in cls_dets) == 0:
            continue
        valid_class[c] = num_gts > 0
        # one IoU matrix per image, shared across the whole threshold
        # grid (the reference recomputes per thr through its pool;
        # eval_map.py:131)
        cls_ious = [_pairwise_iou(d, g, box_dim) if len(d) and len(g)
                    else None for d, g in zip(cls_dets, cls_gts)]
        for ti, thr in enumerate(iou_thrs):
            tps, fps, scores = [], [], []
            for d, g, io in zip(cls_dets, cls_gts, cls_ious):
                tp, fp = _tpfp(d, len(g), io, thr)
                tps.append(tp)
                fps.append(fp)
                scores.append(d[:, -1] if len(d) else
                              np.zeros(0, np.float32))
            scores = np.concatenate(scores)
            order = np.argsort(-scores)
            tp = np.cumsum(np.concatenate(tps)[order])
            fp = np.cumsum(np.concatenate(fps)[order])
            if num_gts == 0:
                continue
            recalls = tp / num_gts
            precisions = tp / np.maximum(tp + fp, 1e-9)
            ap_table[ti, c] = average_precision(recalls, precisions)

    def mean_over_valid(row):
        return float(row[valid_class].mean()) if valid_class.any() else 0.0

    def row_for(thr):
        # look thresholds up by value, not position, so custom iou_thrs
        # (e.g. [0.5, 0.75]) still label mAP50/mAP75 correctly
        for ti, t in enumerate(iou_thrs):
            if abs(t - thr) < 1e-6:
                return ap_table[ti]
        return None

    row50, row75 = row_for(0.5), row_for(0.75)
    result = {
        "mAP50": mean_over_valid(row50) if row50 is not None else 0.0,
        "mAP75": mean_over_valid(row75) if row75 is not None else 0.0,
        "mAP": float(np.mean([mean_over_valid(ap_table[t])
                              for t in range(len(iou_thrs))])),
        "per_class_ap50": {c: float(row50[c]) if row50 is not None else 0.0
                           for c in range(num_classes) if valid_class[c]},
    }
    if logger:
        logger(f"mAP50={result['mAP50']:.4f} mAP75={result['mAP75']:.4f} "
               f"mAP={result['mAP']:.4f}")
    return result
