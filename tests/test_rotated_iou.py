"""Golden tests for rotated IoU — analytic fixtures in the style of
``mmcv/tests/test_ops/test_box_iou_rotated.py`` (the correctness spec for
the polygon-clip algorithm)."""

import numpy as np

from sm3det_tpu.ops import (bbox_overlaps, box_iou_rotated,
                            box_iou_rotated_chunked)


def test_identical_boxes():
    b = np.array([[10.0, 10.0, 4.0, 2.0, 0.3]], np.float32)
    iou = np.asarray(box_iou_rotated(b, b))
    assert np.isclose(iou[0, 0], 1.0, atol=1e-4)


def test_axis_aligned_matches_hbb():
    rng = np.random.RandomState(0)
    n, m = 16, 24
    def make(k):
        cx = rng.uniform(20, 80, k)
        cy = rng.uniform(20, 80, k)
        w = rng.uniform(5, 30, k)
        h = rng.uniform(5, 30, k)
        obb = np.stack([cx, cy, w, h, np.zeros(k)], -1).astype(np.float32)
        hbb = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                       -1).astype(np.float32)
        return obb, hbb
    obb1, hbb1 = make(n)
    obb2, hbb2 = make(m)
    riou = np.asarray(box_iou_rotated(obb1, obb2))
    hiou = np.asarray(bbox_overlaps(hbb1, hbb2))
    assert np.allclose(riou, hiou, atol=1e-4)


def test_45deg_cross():
    # unit square vs itself rotated 45°: intersection is a regular octagon
    # with area 2*(sqrt(2)-1); union = 2 - inter.
    a = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]], np.float32)
    b = np.array([[0.0, 0.0, 1.0, 1.0, np.pi / 4]], np.float32)
    inter = 2 * (np.sqrt(2) - 1)
    expected = inter / (2 - inter)
    iou = np.asarray(box_iou_rotated(a, b))[0, 0]
    assert np.isclose(iou, expected, atol=1e-4)


def test_contained_box():
    outer = np.array([[0.0, 0.0, 10.0, 10.0, 0.2]], np.float32)
    inner = np.array([[0.0, 0.0, 2.0, 2.0, 1.0]], np.float32)
    iou = np.asarray(box_iou_rotated(outer, inner))[0, 0]
    assert np.isclose(iou, 4.0 / 100.0, atol=1e-4)
    iof = np.asarray(box_iou_rotated(inner, outer, mode="iof"))[0, 0]
    assert np.isclose(iof, 1.0, atol=1e-4)


def test_disjoint():
    a = np.array([[0.0, 0.0, 2.0, 2.0, 0.5]], np.float32)
    b = np.array([[100.0, 100.0, 2.0, 2.0, 1.2]], np.float32)
    iou = np.asarray(box_iou_rotated(a, b))[0, 0]
    assert iou == 0.0


def test_half_overlap_rotated_frame():
    # two equal squares sharing half their area, rotated consistently:
    # IoU invariant under joint rotation
    for ang in [0.0, 0.3, 1.0, -0.7]:
        c, s = np.cos(ang), np.sin(ang)
        # centers offset by half a side along the (rotated) x axis
        a = np.array([[0.0, 0.0, 4.0, 4.0, ang]], np.float32)
        b = np.array([[2.0 * c, 2.0 * s, 4.0, 4.0, ang]], np.float32)
        iou = np.asarray(box_iou_rotated(a, b))[0, 0]
        assert np.isclose(iou, 1.0 / 3.0, atol=1e-3), (ang, iou)


def test_aligned_mode():
    rng = np.random.RandomState(3)
    n = 8
    boxes1 = np.stack([
        rng.uniform(0, 50, n), rng.uniform(0, 50, n),
        rng.uniform(5, 20, n), rng.uniform(5, 20, n),
        rng.uniform(-1.5, 1.5, n)], -1).astype(np.float32)
    boxes2 = boxes1.copy()
    boxes2[:, 0] += 1.0
    full = np.asarray(box_iou_rotated(boxes1, boxes2))
    al = np.asarray(box_iou_rotated(boxes1, boxes2, aligned=True))
    assert np.allclose(al, np.diag(full), atol=1e-5)


def test_chunked_matches_direct():
    rng = np.random.RandomState(4)
    n, m = 300, 37
    def rand(k):
        return np.stack([
            rng.uniform(0, 100, k), rng.uniform(0, 100, k),
            rng.uniform(4, 25, k), rng.uniform(4, 25, k),
            rng.uniform(-1.5, 1.5, k)], -1).astype(np.float32)
    b1, b2 = rand(n), rand(m)
    direct = np.asarray(box_iou_rotated(b1, b2))
    chunked = np.asarray(box_iou_rotated_chunked(b1, b2, row_chunk=128))
    assert chunked.shape == (n, m)
    assert np.allclose(direct, chunked, atol=1e-5)
