"""Static-shape NMS tests against a python reference implementation
(golden-fixture style of ``mmcv/tests/test_ops/test_nms_rotated.py``)."""

import numpy as np

from sm3det_tpu.ops import (box_iou_rotated, bbox_overlaps, nms, nms_rotated,
                            multiclass_nms_rotated, batched_nms)


def _py_greedy_nms(iou, scores, thr, score_thr=-np.inf):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i] or scores[i] <= score_thr:
            continue
        keep.append(i)
        suppressed |= iou[i] > thr
    return keep


def test_nms_simple():
    boxes = np.array([
        [0, 0, 10, 10],
        [1, 1, 11, 11],     # heavy overlap with 0
        [20, 20, 30, 30],
        [21, 21, 31, 31],   # heavy overlap with 2
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7, 0.95], np.float32)
    dets, idx, valid = nms(boxes, scores, 0.5, max_out=4)
    idx = np.asarray(idx)[np.asarray(valid)]
    assert set(idx.tolist()) == {3, 0}
    # sorted by score
    assert idx.tolist() == [3, 0]
    assert np.isclose(np.asarray(dets)[0, 4], 0.95)


def test_nms_matches_python_reference():
    rng = np.random.RandomState(0)
    n = 100
    boxes = rng.uniform(0, 80, (n, 2)).astype(np.float32)
    wh = rng.uniform(10, 40, (n, 2)).astype(np.float32)
    boxes = np.concatenate([boxes, boxes + wh], -1)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    iou = np.asarray(bbox_overlaps(boxes, boxes))
    for thr in [0.3, 0.5, 0.7]:
        expected = _py_greedy_nms(iou, scores, thr)
        _, idx, valid = nms(boxes, scores, thr, max_out=n)
        got = np.asarray(idx)[np.asarray(valid)].tolist()
        assert got == expected, thr


def test_nms_rotated_matches_python_reference():
    rng = np.random.RandomState(1)
    n = 60
    boxes = np.stack([
        rng.uniform(0, 100, n), rng.uniform(0, 100, n),
        rng.uniform(10, 40, n), rng.uniform(10, 40, n),
        rng.uniform(-1.5, 1.5, n)], -1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    iou = np.asarray(box_iou_rotated(boxes, boxes))
    for thr in [0.1, 0.5]:
        expected = _py_greedy_nms(iou, scores, thr)
        _, idx, valid = nms_rotated(boxes, scores, thr, max_out=n)
        got = np.asarray(idx)[np.asarray(valid)].tolist()
        assert got == expected, thr


def test_nms_score_threshold():
    boxes = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
    scores = np.array([0.9, 0.01], np.float32)
    _, idx, valid = nms(boxes, scores, 0.5, max_out=2, score_thr=0.05)
    assert np.asarray(valid).sum() == 1
    assert np.asarray(idx)[0] == 0


def test_batched_nms_classes_dont_suppress():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    idxs = np.array([0, 1], np.int32)
    _, idx, valid = batched_nms(boxes, scores, idxs, 0.5, max_out=2)
    assert np.asarray(valid).sum() == 2


def test_multiclass_nms_rotated():
    # two classes; boxes overlap but different classes are both kept
    bboxes = np.array([
        [10, 10, 8, 8, 0.0],
        [10, 10, 8, 8, 0.1],
        [50, 50, 8, 8, 0.5],
    ], np.float32)
    scores = np.array([
        [0.9, 0.05, 0.0],
        [0.1, 0.85, 0.0],
        [0.8, 0.1, 0.0],
    ], np.float32)   # last col = background
    dets, labels, valid = multiclass_nms_rotated(
        bboxes, scores, score_thr=0.3, iou_thr=0.5, max_num=6, pre_nms=9)
    v = np.asarray(valid)
    labels = np.asarray(labels)[v]
    dets = np.asarray(dets)[v]
    assert len(labels) == 3
    # sorted by score: 0.9(cls0), 0.85(cls1), 0.8(cls0)
    assert np.allclose(dets[:, 5], [0.9, 0.85, 0.8], atol=1e-5)
    assert labels.tolist() == [0, 1, 0]


def test_soft_nms_matches_sequential_reference():
    """soft_nms (mmcv ops/nms.py): jitted scan output == a python
    sequential soft-NMS on the same inputs, for all three methods."""
    import jax, numpy as np
    import jax.numpy as jnp
    from sm3det_tpu.ops.nms import soft_nms, bbox_overlaps

    rng = np.random.RandomState(7)
    n = 60
    x1 = rng.uniform(0, 200, n); y1 = rng.uniform(0, 200, n)
    boxes = np.stack([x1, y1, x1 + rng.uniform(5, 60, n),
                      y1 + rng.uniform(5, 60, n)], -1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    iou = np.array(bbox_overlaps(boxes, boxes))
    np.fill_diagonal(iou, 0.0)

    for method in ("linear", "gaussian", "naive"):
        cur = scores.astype(np.float64).copy()
        ref_sel, ref_scores = [], []
        for _ in range(20):
            i = int(np.argmax(cur)); s = cur[i]
            ref_sel.append(i); ref_scores.append(s)
            row = iou[i]
            if method == "gaussian":
                w = np.exp(-(row ** 2) / 0.5)
            elif method == "naive":
                w = np.where(row > 0.3, 0.0, 1.0)
            else:
                w = np.where(row > 0.3, 1.0 - row, 1.0)
            cur = cur * w
            cur[i] = -1e10
        dets, idx, valid = jax.jit(
            lambda b, s: soft_nms(b, s, 0.3, 20, method=method))(
                boxes, scores)
        idx = np.asarray(idx); dets = np.asarray(dets)
        got_valid = np.asarray(valid)
        exp_valid = np.asarray(ref_scores) > 1e-3
        assert (got_valid == exp_valid).all(), method
        assert (idx[got_valid] == np.asarray(ref_sel)[exp_valid]).all(), method
        assert np.allclose(dets[got_valid, 4],
                           np.asarray(ref_scores)[exp_valid],
                           atol=1e-4), method


def test_nms_rotated_groups_matches_offset_trick():
    """nms_rotated(groups=cls) must reproduce the class-offset path
    bit-exactly: identical keep set, order, dets and valid mask. The
    grouped path re-orders candidates group-major internally
    (ops/nms.py nms_rotated) which must not leak into outputs."""
    rng = np.random.RandomState(11)
    n, c = 400, 7
    boxes = np.stack([
        rng.uniform(0, 512, n), rng.uniform(0, 512, n),
        rng.uniform(8, 64, n), rng.uniform(8, 64, n),
        rng.uniform(-1.5, 1.5, n)], -1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    cls = rng.randint(0, c, n).astype(np.int32)
    shifted = boxes.copy()
    shifted[:, :2] += (cls.astype(np.float32) * 2 * 600.0)[:, None]

    d0, i0, v0 = nms_rotated(shifted, scores, 0.1, 100, score_thr=0.05)
    d1, i1, v1 = nms_rotated(shifted, scores, 0.1, 100, score_thr=0.05,
                             groups=cls)
    assert np.array_equal(np.asarray(v0), np.asarray(v1))
    assert np.array_equal(np.asarray(i0), np.asarray(i1))
    assert np.abs(np.asarray(d0) - np.asarray(d1)).max() == 0.0


def test_aug_multiclass_nms_rotated_merges_across_augs():
    """Reusable TTA merge op (aug_multiclass_nms_rotated, ref
    bbox_nms_rotated.py:113): overlapping same-class boxes from two aug
    sets collapse to the higher score; different classes never suppress
    each other; invalid slots never win."""
    import jax
    import jax.numpy as jnp

    from sm3det_tpu.ops.nms import aug_multiclass_nms_rotated

    d1 = jnp.array([[50., 50., 20., 10., 0.0, 0.9],
                    [100., 100., 20., 10., 0.0, 0.8],
                    [0., 0., 0., 0., 0., 0.99]])       # invalid slot
    l1 = jnp.array([0, 1, 2])
    v1 = jnp.array([True, True, False])
    # aug 2: same object as d1[0] (class 0, lower score), plus a class-1
    # box exactly on top of it (must NOT be suppressed by class 0)
    d2 = jnp.array([[50.5, 50., 20., 10., 0.0, 0.7],
                    [50., 50., 20., 10., 0.0, 0.6]])
    l2 = jnp.array([0, 1])
    v2 = jnp.array([True, True])

    out, labels, valid = jax.jit(
        lambda: aug_multiclass_nms_rotated(
            (d1, d2), (l1, l2), (v1, v2), iou_thr=0.1, max_out=4))()
    out, labels, valid = map(np.asarray, (out, labels, valid))
    kept = [(tuple(np.round(out[i, :2], 1)), int(labels[i]),
             round(float(out[i, 5]), 2))
            for i in range(4) if valid[i]]
    assert ((50.0, 50.0), 0, 0.9) in kept          # winner of class-0 pair
    assert ((100.0, 100.0), 1, 0.8) in kept
    assert ((50.0, 50.0), 1, 0.6) in kept          # cross-class survives
    assert len(kept) == 3                          # dup + invalid dropped
    assert not any(s == 0.99 for (_, _, s) in kept)


def test_aug_merge_small_max_out_keeps_top_scores_post_nms():
    """TTA-merge cap semantics at small ``max_out``: the full union is
    suppressed first (a cross-variant duplicate must NOT consume an
    output slot), then survivors are truncated to the top-``max_out`` by
    score — exactly the reference's post-NMS ``max_num`` truncation
    (``mmrotate/core/post_processing/bbox_nms_rotated.py:136-141``)."""
    import jax
    import jax.numpy as jnp

    from sm3det_tpu.ops.nms import aug_multiclass_nms_rotated

    # variant 1: four well-separated class-0 objects, scores desc
    d1 = jnp.array([[50., 50., 20., 10., 0.0, 0.9],
                    [150., 50., 20., 10., 0.0, 0.8],
                    [50., 150., 20., 10., 0.0, 0.7],
                    [150., 150., 20., 10., 0.0, 0.6]])
    l1 = jnp.zeros(4, jnp.int32)
    v1 = jnp.ones(4, bool)
    # variant 2: duplicate of the top box (suppressed by it) + two new
    # separated objects whose scores straddle variant 1's
    d2 = jnp.array([[50.2, 50., 20., 10., 0.0, 0.85],
                    [250., 50., 20., 10., 0.0, 0.75],
                    [250., 150., 20., 10., 0.0, 0.65]])
    l2 = jnp.zeros(3, jnp.int32)
    v2 = jnp.ones(3, bool)

    # union post-NMS = 6 distinct objects; cap at 3
    out, labels, valid = jax.jit(
        lambda: aug_multiclass_nms_rotated(
            (d1, d2), (l1, l2), (v1, v2), iou_thr=0.5, max_out=3))()
    out, labels, valid = map(np.asarray, (out, labels, valid))
    assert valid.all()
    scores = sorted((round(float(s), 3) for s in out[:, 5]),
                    reverse=True)
    # the duplicate (0.85) must NOT appear; the top-3 survivors are
    # 0.9, 0.8, 0.75 — NOT 0.9, 0.85, 0.8 (which would mean the
    # duplicate was truncated in instead of suppressed)
    assert scores == [0.9, 0.8, 0.75], scores
