"""COCO-protocol bbox AP tests.

Two layers of evidence (pycocotools is not installed here):
1. Analytic fixtures — AP values derived BY HAND from the published
   COCOeval protocol (101-point interpolation over recall thresholds
   0:.01:1, monotone precision envelope, maxDets truncation, area
   ranges, crowd semantics). These pin the true protocol, independent
   of any implementation.
2. Randomized differential tests against ``tests/coco_oracle.py`` — a
   literal, loop-for-loop transcription of pycocotools cocoeval.py —
   catching vectorization bugs in the production implementation
   (``sm3det_tpu/core/evaluation/coco_eval.py``).

Reference contract: mmdet ``CocoDataset.evaluate('bbox')`` as consumed
by ``/root/reference/mmrotate/datasets/sardet_hbb_trisource.py:6`` and
``/root/reference/local_configs/main_SM3Det.py:286``.
"""
import numpy as np
import pytest

from sm3det_tpu.core.evaluation.coco_eval import coco_eval_bbox

from coco_oracle import coco_eval_oracle


def _img(dets_per_class, gt_boxes, gt_labels, **kw):
    """Build (det_results row, annotation) for one image.

    dets_per_class: list per class of (N, 5) xyxy+score arrays.
    gt_boxes: (G, 4) xyxy.
    """
    ann = dict(bboxes=np.asarray(gt_boxes, np.float64).reshape(-1, 4),
               labels=np.asarray(gt_labels, np.int64), **kw)
    return [np.asarray(d, np.float64).reshape(-1, 5)
            for d in dets_per_class], ann


def test_perfect_detections_ap_one():
    dets, ann = _img(
        [[[10, 10, 50, 50, 0.9], [100, 100, 180, 160, 0.8]]],
        [[10, 10, 50, 50], [100, 100, 180, 160]], [0, 0])
    res = coco_eval_bbox([dets], [ann], logger=None)
    assert res["bbox_mAP"] == 1.0
    assert res["bbox_mAP_50"] == 1.0
    assert res["bbox_mAP_75"] == 1.0


def test_single_tp_half_recall_101pt():
    """2 gts, 1 perfect det: recall 0.5, precision 1. 101-pt
    interpolated AP = 51/101 (recThrs 0.00..0.50 inclusive get q=1,
    the rest 0) ≈ 0.50495 — distinguishes COCO interpolation from
    VOC-style continuous area (which gives exactly 0.5)."""
    dets, ann = _img(
        [[[10, 10, 50, 50, 0.9]]],
        [[10, 10, 50, 50], [100, 100, 180, 160]], [0, 0])
    res = coco_eval_bbox([dets], [ann], logger=None)
    expected = round(51 / 101, 3)
    assert res["bbox_mAP_50"] == expected, res
    assert res["bbox_mAP"] == expected


def test_fp_before_tp_envelope():
    """1 gt; FP at score .9, perfect TP at score .8 → pr curve
    [(r=0, p=0), (r=1, p=.5)]; envelope lifts the first point to .5;
    all 101 recall points read q=.5 → AP=0.5 exactly."""
    dets, ann = _img(
        [[[300, 300, 340, 340, 0.9],     # no gt there: FP
          [10, 10, 50, 50, 0.8]]],
        [[10, 10, 50, 50]], [0])
    res = coco_eval_bbox([dets], [ann], logger=None)
    assert res["bbox_mAP_50"] == 0.5


def test_iou_threshold_splits_ap50_ap75():
    """det IoU vs gt = 0.6: TP at IoU .50/.55/.60, FP at .65+.
    AP_50 = 1, AP_75 = 0, mAP = 3/10."""
    # gt [0,0,100,10] (w=100,h=10); det [0,0,75,10] → inter 750,
    # union 1000+750-750=1000 → IoU 0.75? use a cleaner 0.6:
    # det [0,0,60,10]: inter=600, union=1000 → IoU 0.6
    dets, ann = _img([[[0, 0, 60, 10, 0.9]]],
                     [[0, 0, 100, 10]], [0])
    res = coco_eval_bbox([dets], [ann], logger=None)
    assert res["bbox_mAP_50"] == 1.0
    assert res["bbox_mAP_75"] == 0.0
    assert res["bbox_mAP"] == 0.3


def test_max_dets_truncation():
    """maxDets=1 keeps only the top-scored det per image: with gt
    matched by the SECOND-scored det, AP@maxDets=1 is 0 but
    AR@higher maxDets recovers it."""
    dets, ann = _img(
        [[[300, 300, 340, 340, 0.9],     # FP, higher score
          [10, 10, 50, 50, 0.8]]],       # TP
        [[10, 10, 50, 50]], [0])
    res = coco_eval_bbox([dets], [ann], max_dets=(1, 10, 100),
                         logger=None)
    assert res["bbox_AR@1"] == 0.0
    assert res["bbox_AR@10"] == 1.0
    # headline AP uses maxDets[-1]=100 → envelope 0.5 as above
    assert res["bbox_mAP_50"] == 0.5


def test_area_ranges():
    """small gt (16x16=256 < 32²) counts only in 'small'+'all';
    large gt (200x200 > 96²) only in 'large'+'all'."""
    dets, ann = _img(
        [[[0, 0, 16, 16, 0.9], [300, 300, 500, 500, 0.8]]],
        [[0, 0, 16, 16], [300, 300, 500, 500]], [0, 0])
    res = coco_eval_bbox([dets], [ann], logger=None)
    assert res["bbox_mAP"] == 1.0
    assert res["bbox_mAP_s"] == 1.0
    assert res["bbox_mAP_l"] == 1.0
    assert res["bbox_mAP_m"] == -1.0   # no medium gt: excluded (-1)


def test_det_matched_to_out_of_range_gt_is_ignored():
    """In the 'small' pass a det matched to a large (out-of-range) gt
    is IGNORED — not an FP — so the small-range AP of the remaining
    small gt stays 1.0."""
    dets, ann = _img(
        [[[300, 300, 500, 500, 0.95],    # matches the large gt
          [0, 0, 16, 16, 0.9]]],
        [[0, 0, 16, 16], [300, 300, 500, 500]], [0, 0])
    res = coco_eval_bbox([dets], [ann], logger=None)
    assert res["bbox_mAP_s"] == 1.0
    assert res["bbox_mAP_l"] == 1.0


def test_unmatched_det_outside_range_ignored():
    """An unmatched det whose own area is outside the range is ignored
    (not an FP) in that range's pass."""
    dets, ann = _img(
        [[[0, 0, 16, 16, 0.7],           # TP small
          [600, 600, 900, 900, 0.9]]],   # unmatched large det
        [[0, 0, 16, 16]], [0])
    res = coco_eval_bbox([dets], [ann], logger=None)
    # small pass: the large unmatched det is ignored → AP_s = 1
    assert res["bbox_mAP_s"] == 1.0
    # all pass: it IS an FP with higher score → envelope 0.5
    assert res["bbox_mAP_50"] == 0.5


def test_crowd_regions():
    """Crowd gts are ignore-flagged and can absorb multiple dets (none
    become FPs); they contribute no positives."""
    dets, ann = _img(
        [[[10, 10, 20, 20, 0.9],         # inside crowd
          [30, 30, 40, 40, 0.8],         # inside crowd
          [200, 200, 240, 240, 0.7]]],   # TP on the real gt
        [[200, 200, 240, 240]], [0],
        bboxes_crowd=np.array([[0.0, 0.0, 100.0, 100.0]]),
        labels_crowd=np.array([0]))
    res = coco_eval_bbox([dets], [ann], logger=None)
    # both crowd-covered dets ignored; the TP gives AP 1.0
    assert res["bbox_mAP_50"] == 1.0


def test_non_ignored_gt_preferred_over_crowd():
    """A det overlapping both a real gt (IoU .6) and a crowd region
    (IoU-with-crowd higher) must match the REAL gt at t=.5 (ignored
    gts only considered when no real gt qualifies)."""
    dets, ann = _img(
        [[[0, 0, 60, 10, 0.9]]],
        [[0, 0, 100, 10]], [0],
        bboxes_crowd=np.array([[0.0, 0.0, 60.0, 10.0]]),
        labels_crowd=np.array([0]))
    res = coco_eval_bbox([dets], [ann], logger=None)
    assert res["bbox_mAP_50"] == 1.0    # counted as a real TP
    assert res["bbox_mAP_75"] == 0.0    # at .75 it falls to the crowd
    #                                     → ignored, and the gt unmatched
    #                                     → recall 0 but no FP


def test_second_det_on_same_gt_is_fp():
    """One gt, two dets both with IoU≥.5: the higher-scored matches,
    the second is an FP (gt already taken)."""
    dets, ann = _img(
        [[[10, 10, 50, 50, 0.9], [11, 11, 51, 51, 0.8]]],
        [[10, 10, 50, 50]], [0])
    res = coco_eval_bbox([dets], [ann], logger=None)
    # pr: [(r=1, p=1), (r=1, p=.5)] → q=1 at every recThr ≤ 1 → AP50=1
    assert res["bbox_mAP_50"] == 1.0


def test_classes_independent_and_empty_class_excluded():
    dets, ann = _img(
        [[[10, 10, 50, 50, 0.9]], [[10, 10, 50, 50, 0.8]], []],
        [[10, 10, 50, 50]], [0])
    res = coco_eval_bbox([dets], [ann], classwise=True, logger=None,
                         class_names=["a", "b", "c"])
    # class 0: perfect. class 1: det on a class-0 gt → FP, but class 1
    # has no gt → npig=0 → excluded. class 2: nothing → excluded.
    assert res["bbox_mAP"] == 1.0
    assert res["per_class_ap"]["a"] == 1.0
    assert np.isnan(res["per_class_ap"]["b"])


def _rand_case(rng, num_imgs=6, num_classes=3, crowd=True):
    det_results, annotations, images_oracle = [], [], []
    for _ in range(num_imgs):
        gts, dts = [], []
        G = rng.randint(0, 6)
        boxes, labels, areas = [], [], []
        for _ in range(G):
            x, y = rng.uniform(0, 400, 2)
            w, h = rng.uniform(5, 200, 2)
            c = rng.randint(num_classes)
            boxes.append([x, y, x + w, y + h])
            labels.append(c)
            areas.append(w * h)
            gts.append(dict(bbox=[x, y, w, h], category_id=int(c),
                            area=w * h, iscrowd=0, ignore=0))
        ann = dict(bboxes=np.asarray(boxes, np.float64).reshape(-1, 4),
                   labels=np.asarray(labels, np.int64),
                   areas=np.asarray(areas, np.float64))
        if crowd and rng.rand() < 0.5:
            x, y = rng.uniform(0, 300, 2)
            w, h = rng.uniform(50, 250, 2)
            c = rng.randint(num_classes)
            ann["bboxes_crowd"] = np.array([[x, y, x + w, y + h]])
            ann["labels_crowd"] = np.array([c])
            ann["areas_crowd"] = np.array([w * h])
            gts.append(dict(bbox=[x, y, w, h], category_id=int(c),
                            area=w * h, iscrowd=1, ignore=1))
        per_class = [[] for _ in range(num_classes)]
        D = rng.randint(0, 12)
        for _ in range(D):
            if G and rng.rand() < 0.6:     # perturb a gt box
                gi = rng.randint(G)
                x1, y1, x2, y2 = boxes[gi]
                jitter = rng.uniform(-15, 15, 4)
                bx = [x1 + jitter[0], y1 + jitter[1],
                      max(x1 + jitter[0] + 4, x2 + jitter[2]),
                      max(y1 + jitter[1] + 4, y2 + jitter[3])]
                c = labels[gi] if rng.rand() < 0.8 else rng.randint(
                    num_classes)
            else:                          # random box
                x, y = rng.uniform(0, 400, 2)
                w, h = rng.uniform(5, 200, 2)
                bx = [x, y, x + w, y + h]
                c = rng.randint(num_classes)
            s = float(np.round(rng.rand(), 6))
            per_class[int(c)].append(bx + [s])
            dts.append(dict(
                bbox=[bx[0], bx[1], bx[2] - bx[0], bx[3] - bx[1]],
                category_id=int(c), score=s,
                area=(bx[2] - bx[0]) * (bx[3] - bx[1])))
        det_results.append([np.asarray(p, np.float64).reshape(-1, 5)
                            for p in per_class])
        annotations.append(ann)
        images_oracle.append((gts, dts))
    return det_results, annotations, images_oracle


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_differential_vs_cocoeval_transcription(seed):
    rng = np.random.RandomState(seed)
    num_classes = 3
    det_results, annotations, images = _rand_case(
        rng, num_imgs=8, num_classes=num_classes)
    got = coco_eval_bbox(det_results, annotations,
                         max_dets=(2, 5, 100), logger=None)
    ref = coco_eval_oracle(images, max_dets=(2, 5, 100),
                           num_classes=num_classes)
    pairs = [("bbox_mAP", "mAP"), ("bbox_mAP_50", "mAP_50"),
             ("bbox_mAP_75", "mAP_75"), ("bbox_mAP_s", "mAP_s"),
             ("bbox_mAP_m", "mAP_m"), ("bbox_mAP_l", "mAP_l"),
             ("bbox_AR@2", "AR@0"), ("bbox_AR@5", "AR@1"),
             ("bbox_AR@100", "AR@2"), ("bbox_AR_small@100", "AR_s"),
             ("bbox_AR_medium@100", "AR_m"),
             ("bbox_AR_large@100", "AR_l")]
    for gk, rk in pairs:
        assert abs(got[gk] - round(ref[rk], 3)) < 2e-3, (
            seed, gk, got[gk], ref[rk])


@pytest.mark.parametrize("seed", [10, 11])
def test_differential_small_maxdets(seed):
    """maxDets truncation differential at tiny caps (1, 3)."""
    rng = np.random.RandomState(seed)
    det_results, annotations, images = _rand_case(
        rng, num_imgs=5, num_classes=2, crowd=False)
    got = coco_eval_bbox(det_results, annotations, max_dets=(1, 3, 7),
                         logger=None)
    ref = coco_eval_oracle(images, max_dets=(1, 3, 7), num_classes=2)
    assert abs(got["bbox_mAP"] - round(ref["mAP"], 3)) < 2e-3
    assert abs(got["bbox_AR@1"] - round(ref["AR@0"], 3)) < 2e-3
    assert abs(got["bbox_AR@3"] - round(ref["AR@1"], 3)) < 2e-3
