"""Rotated mAP evaluation correctness on analytic fixtures."""

import numpy as np

from sm3det_tpu.core.evaluation.eval_map import (average_precision,
                                                 eval_rbbox_map)


def test_average_precision_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert abs(average_precision(rec, prec) - 1.0) < 1e-6


def test_eval_map_perfect_detection():
    # detections exactly equal gts -> mAP 1.0
    gts = np.array([[50, 50, 20, 10, 0.3],
                    [120, 120, 30, 15, -0.5]], np.float32)
    dets_cls0 = np.concatenate(
        [gts[:1], np.array([[0.9]], np.float32)], axis=1)
    dets_cls1 = np.concatenate(
        [gts[1:], np.array([[0.8]], np.float32)], axis=1)
    det_results = [[dets_cls0, dets_cls1]]
    annotations = [dict(bboxes=gts, labels=np.array([0, 1]))]
    res = eval_rbbox_map(det_results, annotations, box_dim=5, logger=None)
    assert abs(res["mAP50"] - 1.0) < 1e-6
    assert abs(res["mAP"] - 1.0) < 1e-6


def test_eval_map_false_positive_penalty():
    gts = np.array([[50, 50, 20, 10, 0.0]], np.float32)
    # one perfect det + one higher-scored false positive far away
    dets = np.array([[200, 200, 20, 10, 0.0, 0.95],
                     [50, 50, 20, 10, 0.0, 0.9]], np.float32)
    det_results = [[dets]]
    annotations = [dict(bboxes=gts, labels=np.array([0]))]
    res = eval_rbbox_map(det_results, annotations, box_dim=5, logger=None)
    # precision at recall 1.0 is 0.5; area AP = 0.5
    assert abs(res["mAP50"] - 0.5) < 1e-6


def test_eval_map_miss():
    gts = np.array([[50, 50, 20, 10, 0.0],
                    [150, 150, 20, 10, 0.0]], np.float32)
    dets = np.array([[50, 50, 20, 10, 0.0, 0.9]], np.float32)
    det_results = [[dets]]
    annotations = [dict(bboxes=gts, labels=np.array([0, 0]))]
    res = eval_rbbox_map(det_results, annotations, box_dim=5, logger=None)
    assert abs(res["mAP50"] - 0.5) < 1e-6   # recall caps at 0.5
