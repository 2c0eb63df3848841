#!/usr/bin/env python
"""Confusion matrix from detections vs ground truths (parity:
tools/analysis_tools/confusion_matrix.py): rows = gt classes (+miss),
cols = predicted classes (+background/FP), matched at an IoU threshold."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def confusion_matrix(det_results, annotations, num_classes,
                     iou_thr=0.5, score_thr=0.3, box_dim=5):
    from sm3det_tpu.core.evaluation.eval_map import _pairwise_iou
    cm = np.zeros((num_classes + 1, num_classes + 1), np.int64)
    for per_class, ann in zip(det_results, annotations):
        gts = ann["bboxes"]
        gt_labels = ann["labels"]
        dets, det_labels = [], []
        for c, d in enumerate(per_class):
            d = d[d[:, -1] >= score_thr] if len(d) else d
            dets.append(d)
            det_labels.extend([c] * len(d))
        dets = np.concatenate(dets) if dets else np.zeros((0, box_dim + 1))
        det_labels = np.asarray(det_labels, np.int64)
        matched_gt = np.zeros(len(gts), bool)
        if len(dets) and len(gts):
            iou = _pairwise_iou(dets, gts, box_dim)
            order = np.argsort(-dets[:, -1])
            for i in order:
                j = int(np.argmax(iou[i]))
                if iou[i, j] >= iou_thr and not matched_gt[j]:
                    matched_gt[j] = True
                    cm[gt_labels[j], det_labels[i]] += 1
                else:
                    cm[num_classes, det_labels[i]] += 1   # FP row
        elif len(dets):
            for lab in det_labels:
                cm[num_classes, lab] += 1
        for j, m in enumerate(matched_gt):
            if not m:
                cm[gt_labels[j], num_classes] += 1        # missed col
    return cm


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-images", type=int, default=8)
    args = p.parse_args()
    # synthetic demonstration: perfect detections -> diagonal matrix
    rng = np.random.RandomState(0)
    nc = 4
    det_results, annotations = [], []
    for _ in range(args.num_images):
        g = rng.randint(1, 5)
        gts = np.stack([rng.uniform(40, 200, g), rng.uniform(40, 200, g),
                        rng.uniform(20, 50, g), rng.uniform(10, 20, g),
                        rng.uniform(-1, 1, g)], -1).astype(np.float32)
        labels = rng.randint(0, nc, g)
        per_class = []
        for c in range(nc):
            sel = labels == c
            d = np.concatenate([gts[sel],
                                np.full((sel.sum(), 1), 0.9)], -1)
            per_class.append(d.astype(np.float32))
        det_results.append(per_class)
        annotations.append(dict(bboxes=gts, labels=labels))
    cm = confusion_matrix(det_results, annotations, nc)
    print(cm)


if __name__ == "__main__":
    main()
