"""OBB grounding evaluation (BabelRS eval-format contract,
``BabelRS_pretrain/eval/obb/evaluate_obb.py`` + ``f1_metric.py``):
precision/recall/F1 between predicted and gt oriented boxes at an IoU
threshold, with greedy one-to-one matching."""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def obb_grounding_f1(pred_obbs: List[np.ndarray],
                     gt_obbs: List[np.ndarray],
                     iou_thr: float = 0.5) -> Dict[str, float]:
    """Per-sample lists of (N, 5) predicted and (M, 5) gt OBBs."""
    from ...native import box_iou_rotated_native
    tp = fp = fn = 0
    for pred, gt in zip(pred_obbs, gt_obbs):
        if len(pred) == 0:
            fn += len(gt)
            continue
        if len(gt) == 0:
            fp += len(pred)
            continue
        iou = box_iou_rotated_native(
            pred.astype(np.float32), gt.astype(np.float32))
        if iou is None:
            import jax
            from ...ops.rotated_iou import box_iou_rotated
            with jax.default_device(jax.devices("cpu")[0]):
                iou = np.asarray(box_iou_rotated(
                    pred.astype(np.float32), gt.astype(np.float32)))
        matched = np.zeros(len(gt), bool)
        for i in range(len(pred)):
            j = int(np.argmax(iou[i]))
            if iou[i, j] >= iou_thr and not matched[j]:
                matched[j] = True
                tp += 1
            else:
                fp += 1
        fn += int((~matched).sum())
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    return {"precision": precision, "recall": recall, "f1": f1,
            "tp": tp, "fp": fp, "fn": fn}
