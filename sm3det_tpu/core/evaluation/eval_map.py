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


def _box_areas(boxes: np.ndarray, box_dim: int) -> np.ndarray:
    if len(boxes) == 0:
        return np.zeros(0, np.float32)
    if box_dim == 5:
        return boxes[:, 2] * boxes[:, 3]
    return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])


def _tpfp(det: np.ndarray, gts: np.ndarray, gts_ignore: np.ndarray,
          ious: Optional[np.ndarray], iou_thr: float,
          area_ranges=None, box_dim: int = 5):
    """tp/fp flags for one image-class (reference ``tpfp_default``,
    ``eval_map.py:14-126``): a detection whose best-IoU gt is an IGNORED
    gt (and IoU >= thr) is neither tp nor fp; ignored gts never enter
    num_gts. ``ious`` is the precomputed (N, G+K) matrix against the
    STACKED [gts; gts_ignore] (shared across the IoU threshold grid).
    ``area_ranges`` implements the mmdet scale-range semantics via w*h
    areas (the reference's rotated tpfp raises NotImplementedError on
    that path, ``eval_map.py:76-78``; we implement it properly).
    Returns (num_scales, nd) tp/fp arrays."""
    nd = len(det)
    n_gt, n_ign = len(gts), len(gts_ignore)
    if area_ranges is None:
        area_ranges = [(None, None)]
    ns = len(area_ranges)
    tp = np.zeros((ns, nd), np.float32)
    fp = np.zeros((ns, nd), np.float32)
    if n_gt + n_ign == 0:
        for k, (mn, mx) in enumerate(area_ranges):
            if mn is None:
                fp[k] = 1
            else:
                da = _box_areas(det[:, :box_dim], box_dim)
                fp[k] = ((da >= mn) & (da < mx)).astype(np.float32)
        return tp, fp
    if nd == 0:
        return tp, fp
    ignore_flag = np.concatenate(
        [np.zeros(n_gt, bool), np.ones(n_ign, bool)])
    gt_all = np.concatenate([gts, gts_ignore], 0) if n_ign else gts
    gareas = _box_areas(gt_all, box_dim)
    ious_max = ious.max(1)
    ious_argmax = ious.argmax(1)
    order = np.argsort(-det[:, -1])
    dareas = None
    for k, (mn, mx) in enumerate(area_ranges):
        covered = np.zeros(n_gt + n_ign, bool)
        area_ignore = np.zeros(n_gt + n_ign, bool) if mn is None else \
            (gareas < mn) | (gareas >= mx)
        for i in order:
            if ious_max[i] >= iou_thr:
                j = int(ious_argmax[i])
                if not (ignore_flag[j] or area_ignore[j]):
                    if not covered[j]:
                        covered[j] = True
                        tp[k, i] = 1
                    else:
                        fp[k, i] = 1
                # else: det covers an ignored gt -> neither tp nor fp
            elif mn is None:
                fp[k, i] = 1
            else:
                if dareas is None:
                    dareas = _box_areas(det[:, :box_dim], box_dim)
                if mn <= dareas[i] < mx:
                    fp[k, i] = 1
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


_EMPTY5 = np.zeros((0, 5), np.float32)


def eval_rbbox_map(det_results: List[List[np.ndarray]],
                   annotations: List[Dict],
                   iou_thrs: Optional[Sequence[float]] = None,
                   box_dim: int = 5,
                   scale_ranges: Optional[Sequence] = None,
                   logger=print) -> Dict:
    """Compute mAP.

    Args:
        det_results: per image, per class array (N, box_dim+1) with score
            in the last column.
        annotations: per image dict with 'bboxes' (G, box_dim) and
            'labels' (G,), plus optional 'bboxes_ignore'/'labels_ignore'
            (difficult gts — matched detections are neither tp nor fp,
            reference ``tpfp_default``, ``eval_map.py:14-126``).
        iou_thrs: defaults to 0.50:0.05:0.95.
        scale_ranges: optional [(min, max), ...] in PIXELS — a range
            (32, 64) means gt/det areas in [32^2, 64^2)
            (``eval_map.py:170-222``). Headline metrics always come from
            the all-areas pass; per-range AP50 is added under
            ``per_scale_ap50``.

    Returns:
        dict(mAP50, mAP75, mAP, per_class_ap50[, per_scale_ap50]).
    """
    if iou_thrs is None:
        iou_thrs = [round(0.5 + 0.05 * i, 2) for i in range(10)]
    num_classes = len(det_results[0])
    num_imgs = len(det_results)
    # row 0 is always the all-areas pass (headline metrics); per-scale
    # rows follow when scale_ranges is given
    area_ranges = [(None, None)] + (
        [(r[0] ** 2, r[1] ** 2) for r in scale_ranges]
        if scale_ranges else [])
    ns = len(area_ranges)

    ap_table = np.zeros((len(iou_thrs), ns, num_classes))
    valid_class = np.zeros(num_classes, bool)
    empty = _EMPTY5[:, :box_dim]
    for c in range(num_classes):
        cls_dets = [det_results[i][c] for i in range(num_imgs)]
        cls_gts, cls_gts_ign = [], []
        for ann in annotations:
            sel = ann["labels"] == c
            cls_gts.append(ann["bboxes"][sel])
            li = ann.get("labels_ignore")
            cls_gts_ign.append(ann["bboxes_ignore"][li == c]
                               if li is not None and len(li) else empty)
        # per-scale gt counts; ignored gts never counted
        # (eval_map.py:197-207)
        num_gts = np.zeros(ns, np.int64)
        for g in cls_gts:
            num_gts[0] += len(g)
            if ns > 1 and len(g):
                ga = _box_areas(g, box_dim)
                for k, (mn, mx) in enumerate(area_ranges[1:], 1):
                    num_gts[k] += int(np.sum((ga >= mn) & (ga < mx)))
        if num_gts[0] == 0 and sum(len(d) for d in cls_dets) == 0:
            continue
        valid_class[c] = num_gts[0] > 0
        # one IoU matrix per image vs the STACKED [gt; gt_ignore], shared
        # across the whole threshold grid (the reference recomputes per
        # thr through its pool; eval_map.py:131)
        cls_ious = []
        for d, g, gi in zip(cls_dets, cls_gts, cls_gts_ign):
            both = np.concatenate([g, gi], 0) if len(gi) else g
            cls_ious.append(_pairwise_iou(d, both, box_dim)
                            if len(d) and len(both) else None)
        for ti, thr in enumerate(iou_thrs):
            tps, fps, scores = [], [], []
            for d, g, gi, io in zip(cls_dets, cls_gts, cls_gts_ign,
                                    cls_ious):
                tp, fp = _tpfp(d, g, gi, io, thr,
                               area_ranges=area_ranges, box_dim=box_dim)
                tps.append(tp)
                fps.append(fp)
                scores.append(d[:, -1] if len(d) else
                              np.zeros(0, np.float32))
            scores = np.concatenate(scores)
            order = np.argsort(-scores)
            tp = np.cumsum(np.concatenate(tps, 1)[:, order], 1)
            fp = np.cumsum(np.concatenate(fps, 1)[:, order], 1)
            for k in range(ns):
                if num_gts[k] == 0:
                    continue
                recalls = tp[k] / num_gts[k]
                precisions = tp[k] / np.maximum(tp[k] + fp[k], 1e-9)
                ap_table[ti, k, c] = average_precision(recalls, precisions)

    def mean_over_valid(row):
        return float(row[valid_class].mean()) if valid_class.any() else 0.0

    def row_for(thr, k=0):
        # look thresholds up by value, not position, so custom iou_thrs
        # (e.g. [0.5, 0.75]) still label mAP50/mAP75 correctly
        for ti, t in enumerate(iou_thrs):
            if abs(t - thr) < 1e-6:
                return ap_table[ti, k]
        return None

    row50, row75 = row_for(0.5), row_for(0.75)
    result = {
        "mAP50": mean_over_valid(row50) if row50 is not None else 0.0,
        "mAP75": mean_over_valid(row75) if row75 is not None else 0.0,
        "mAP": float(np.mean([mean_over_valid(ap_table[t, 0])
                              for t in range(len(iou_thrs))])),
        "per_class_ap50": {c: float(row50[c]) if row50 is not None else 0.0
                           for c in range(num_classes) if valid_class[c]},
    }
    if scale_ranges:
        result["per_scale_ap50"] = {
            f"{lo}-{hi}": mean_over_valid(row_for(0.5, k))
            for k, (lo, hi) in enumerate(scale_ranges, 1)}
    if logger:
        logger(f"mAP50={result['mAP50']:.4f} mAP75={result['mAP75']:.4f} "
               f"mAP={result['mAP']:.4f}")
    return result
