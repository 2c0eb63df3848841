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


def test_eval_map_ignore_semantics():
    """Reference tpfp_default (eval_map.py:14-126): a detection covering
    an IGNORED gt is neither tp nor fp; the ignored gt never enters
    num_gts. Removing the ignore flag turns that detection into a TP;
    dropping the ignore metadata entirely turns it into an FP."""
    gt = np.array([[50, 50, 20, 10, 0.0]], np.float32)
    ign = np.array([[150, 150, 20, 10, 0.0]], np.float32)
    dets = np.array([[150, 150, 20, 10, 0.0, 0.95],   # on the ignored gt
                     [50, 50, 20, 10, 0.0, 0.9]], np.float32)
    ann_ign = dict(bboxes=gt, labels=np.array([0]),
                   bboxes_ignore=ign, labels_ignore=np.array([0]))
    res = eval_rbbox_map([[dets]], [ann_ign], box_dim=5, logger=None)
    assert abs(res["mAP50"] - 1.0) < 1e-6     # ignored det changes nothing
    # un-ignoring: both dets are TPs on counted gts
    ann_full = dict(bboxes=np.concatenate([gt, ign]),
                    labels=np.array([0, 0]))
    res2 = eval_rbbox_map([[dets]], [ann_full], box_dim=5, logger=None)
    assert abs(res2["mAP50"] - 1.0) < 1e-6
    # dropping the ignore gt entirely (the old behavior): higher-scored
    # det becomes a false positive -> AP50 = 0.5
    ann_drop = dict(bboxes=gt, labels=np.array([0]))
    res3 = eval_rbbox_map([[dets]], [ann_drop], box_dim=5, logger=None)
    assert abs(res3["mAP50"] - 0.5) < 1e-6


def test_eval_map_scale_ranges():
    """per-scale AP via mmdet-style w*h area ranges (the reference's
    plumbing, eval_map.py:170-222; its rotated tpfp raises
    NotImplementedError there - we implement the ranges properly)."""
    gts = np.array([[50, 50, 16, 16, 0.0],
                    [200, 200, 80, 80, 0.0]], np.float32)
    dets = np.array([[50, 50, 16, 16, 0.0, 0.9],
                     [200, 200, 80, 80, 0.0, 0.8]], np.float32)
    ann = dict(bboxes=gts, labels=np.array([0, 0]))
    res = eval_rbbox_map([[dets]], [ann], box_dim=5,
                         scale_ranges=[(0, 32), (32, 96)], logger=None)
    assert abs(res["mAP50"] - 1.0) < 1e-6
    assert abs(res["per_scale_ap50"]["0-32"] - 1.0) < 1e-6
    assert abs(res["per_scale_ap50"]["32-96"] - 1.0) < 1e-6
    # an unmatched small det penalizes only the small-scale pass
    dets2 = np.concatenate(
        [np.array([[300, 300, 10, 10, 0.0, 0.95]], np.float32), dets])
    res2 = eval_rbbox_map([[dets2]], [ann], box_dim=5,
                          scale_ranges=[(0, 32), (32, 96)], logger=None)
    assert res2["per_scale_ap50"]["0-32"] < 1.0 - 1e-6
    assert abs(res2["per_scale_ap50"]["32-96"] - 1.0) < 1e-6


def test_tpfp_reference_oracle():
    """Exec the reference tpfp_default (eval_map.py:14) with its CUDA IoU
    monkeypatched to our golden-verified rotated-IoU op and assert our
    _tpfp produces identical tp/fp vectors on random fixtures with
    ignore boxes."""
    import pytest
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from reference_torch import load_reference_source
    import types as _types
    from sm3det_tpu.ops.rotated_iou import box_iou_rotated as our_iou

    def mod(name):
        m = sys.modules.get(name)
        if m is None:
            m = _types.ModuleType(name)
            sys.modules[name] = m
        return m

    def iou_t(a, b, mode="iou", aligned=False):
        return torch.from_numpy(
            np.asarray(our_iou(a.numpy(), b.numpy())).astype(np.float32))

    mod("mmcv.ops").box_iou_rotated = iou_t
    mod("mmcv.utils").print_log = lambda *a, **k: None
    from sm3det_tpu.core.evaluation.eval_map import (_tpfp,
                                                     average_precision)
    mod("mmdet.core").average_precision = average_precision
    mod("terminaltables").AsciiTable = object

    ref = load_reference_source(
        "/root/reference/mmrotate/core/evaluation/eval_map.py",
        "ref_eval_map")

    rng = np.random.RandomState(3)
    for trial in range(6):
        g = rng.randint(0, 6)
        k = rng.randint(0, 4)
        nd = rng.randint(0, 12)
        def boxes(n):
            return np.stack([
                rng.uniform(0, 200, n), rng.uniform(0, 200, n),
                rng.uniform(8, 40, n), rng.uniform(8, 40, n),
                rng.uniform(-1.5, 1.5, n)], -1).astype(np.float32)
        gts, igns = boxes(g), boxes(k)
        base = np.concatenate([gts, igns], 0) if g + k else boxes(1)
        picks = base[rng.randint(0, len(base), nd)] if nd else boxes(0)
        jitter = rng.normal(0, 2.0, picks.shape).astype(np.float32)
        dets = np.concatenate(
            [picks + jitter,
             rng.uniform(0.05, 1.0, (nd, 1)).astype(np.float32)], -1)
        for thr in (0.3, 0.5, 0.75):
            ref_tp, ref_fp = ref.tpfp_default(dets, gts, igns, thr)
            both = np.concatenate([gts, igns], 0)
            ious = np.asarray(our_iou(dets[:, :5], both)).astype(
                np.float32) if nd and len(both) else None
            tp, fp = _tpfp(dets, gts, igns, ious, thr, box_dim=5)
            np.testing.assert_array_equal(tp, ref_tp,
                                          f"tp trial={trial} thr={thr}")
            np.testing.assert_array_equal(fp, ref_fp,
                                          f"fp trial={trial} thr={thr}")
