"""The mmcv op-test golden fixtures, verbatim (public test data from
``mmcv/tests/test_ops/{test_nms_rotated,test_box_iou_rotated,
test_roi_align_rotated}.py``) — the correctness spec the reference CUDA
kernels are tested against (SURVEY §4), reproduced by the TPU ops."""
import jax
import jax.numpy as jnp
import numpy as np

from sm3det_tpu.ops.nms import nms_rotated
from sm3det_tpu.ops.roi_align_rotated import roi_align_rotated
from sm3det_tpu.ops.rotated_iou import box_iou_rotated

NMS_BOXES = np.array(
    [[6.0, 3.0, 8.0, 7.0, 0.5, 0.7], [3.0, 6.0, 9.0, 11.0, 0.6, 0.8],
     [3.0, 7.0, 10.0, 12.0, 0.3, 0.5], [1.0, 4.0, 13.0, 7.0, 0.6, 0.9]],
    np.float32)
NMS_EXPECT_DETS = np.array(
    [[1.0, 4.0, 13.0, 7.0, 0.6], [3.0, 6.0, 9.0, 11.0, 0.6],
     [6.0, 3.0, 8.0, 7.0, 0.5]], np.float32)
NMS_EXPECT_KEEP = np.array([3, 1, 0], np.int64)


def test_nms_rotated_golden_cw_and_ccw():
    boxes = jnp.asarray(NMS_BOXES[:, :5])
    scores = jnp.asarray(NMS_BOXES[:, 5])
    dets, idx, valid = nms_rotated(boxes, scores, 0.5, max_out=4)
    n = int(valid.sum())
    assert n == 3
    np.testing.assert_allclose(np.asarray(dets)[:3, :5],
                               NMS_EXPECT_DETS, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx)[:3], NMS_EXPECT_KEEP)
    # mmcv's clockwise=False path negates theta internally before the
    # same kernel; feeding pre-negated thetas reproduces that call
    boxes_ccw = boxes.at[:, 4].multiply(-1.0)
    dets2, idx2, valid2 = nms_rotated(boxes_ccw, scores, 0.5, max_out=4)
    assert int(valid2.sum()) == 3
    np.testing.assert_array_equal(np.asarray(idx2)[:3], NMS_EXPECT_KEEP)


def test_ml_nms_rotated_golden():
    """The reference's multi-label nms_rotated IGNORES labels: the CUDA
    kernel's multi_label branch reads 6-wide boxes but never compares
    box[5] (``nms_rotated_cuda.cuh:30-75``) — suppression is all-pairs,
    so the ml fixture's expectation equals plain NMS. True class-aware
    rotated NMS lives in ``multiclass_nms_rotated`` (per-class), both
    here and in mmrotate."""
    dets, idx, valid = nms_rotated(jnp.asarray(NMS_BOXES[:, :5]),
                                   jnp.asarray(NMS_BOXES[:, 5]), 0.5,
                                   max_out=4)
    assert int(valid.sum()) == 3
    np.testing.assert_array_equal(np.asarray(idx)[:3], NMS_EXPECT_KEEP)
    # a genuinely class-aware variant (per-label center offsets) keeps
    # box 2 as well: its only same-label rival has IoU 0.257 < 0.5
    labels = np.array([1, 0, 1, 0], np.float32)
    boxes = NMS_BOXES[:, :5].copy()
    boxes[:, 0] += labels * 100.0
    _, idx2, valid2 = nms_rotated(jnp.asarray(boxes),
                                  jnp.asarray(NMS_BOXES[:, 5]), 0.5,
                                  max_out=4)
    assert int(valid2.sum()) == 4


IOU_BOXES1 = np.asarray(
    [[1.0, 1.0, 3.0, 4.0, 0.5], [2.0, 2.0, 3.0, 4.0, 0.6],
     [7.0, 7.0, 8.0, 8.0, 0.4]], np.float32)
IOU_BOXES2 = np.asarray(
    [[0.0, 2.0, 2.0, 5.0, 0.3], [2.0, 1.0, 3.0, 3.0, 0.5],
     [5.0, 5.0, 6.0, 7.0, 0.4]], np.float32)
IOU_EXPECT = np.asarray(
    [[0.3708, 0.4351, 0.0000], [0.1104, 0.4487, 0.0424],
     [0.0000, 0.0000, 0.3622]], np.float32)
IOU_EXPECT_ALIGNED = np.asarray([0.3708, 0.4487, 0.3622], np.float32)


def test_box_iou_rotated_golden():
    ious = box_iou_rotated(jnp.asarray(IOU_BOXES1),
                           jnp.asarray(IOU_BOXES2))
    np.testing.assert_allclose(np.asarray(ious), IOU_EXPECT, atol=1e-4)
    ious_a = box_iou_rotated(jnp.asarray(IOU_BOXES1),
                             jnp.asarray(IOU_BOXES2), aligned=True)
    np.testing.assert_allclose(np.asarray(ious_a), IOU_EXPECT_ALIGNED,
                               atol=1e-4)
    # symmetric-mode check from the same fixture family: iof vs iou
    ious_f = box_iou_rotated(jnp.asarray(IOU_BOXES1),
                             jnp.asarray(IOU_BOXES1))
    np.testing.assert_allclose(np.asarray(jnp.diagonal(ious_f)),
                               np.ones(3), atol=1e-5)


ROI_INPUTS = [
    ([[[[1., 2.], [3., 4.]]]], [[0., 0.5, 0.5, 1., 1., 0]]),
    ([[[[1., 2.], [3., 4.]]]], [[0., 0.5, 0.5, 1., 1., np.pi / 2]]),
    ([[[[1., 2.], [3., 4.]], [[4., 3.], [2., 1.]]]],
     [[0., 0.5, 0.5, 1., 1., 0]]),
    ([[[[1., 2., 5., 6.], [3., 4., 7., 8.],
        [9., 10., 13., 14.], [11., 12., 15., 16.]]]],
     [[0., 1.5, 1.5, 3., 3., 0]]),
    ([[[[1., 2., 5., 6.], [3., 4., 7., 8.],
        [9., 10., 13., 14.], [11., 12., 15., 16.]]]],
     [[0., 1.5, 1.5, 3., 3., np.pi / 2]]),
]
ROI_OUTPUTS = [
    ([[[[1.0, 1.25], [1.5, 1.75]]]],
     [[[[3.0625, 0.4375], [0.4375, 0.0625]]]]),
    ([[[[1.5, 1], [1.75, 1.25]]]],
     [[[[3.0625, 0.4375], [0.4375, 0.0625]]]]),
    ([[[[1.0, 1.25], [1.5, 1.75]], [[4.0, 3.75], [3.5, 3.25]]]],
     [[[[3.0625, 0.4375], [0.4375, 0.0625]],
       [[3.0625, 0.4375], [0.4375, 0.0625]]]]),
    ([[[[1.9375, 4.75], [7.5625, 10.375]]]],
     [[[[0.47265625, 0.42968750, 0.42968750, 0.04296875],
        [0.42968750, 0.39062500, 0.39062500, 0.03906250],
        [0.42968750, 0.39062500, 0.39062500, 0.03906250],
        [0.04296875, 0.03906250, 0.03906250, 0.00390625]]]]),
    ([[[[7.5625, 1.9375], [10.375, 4.75]]]],
     [[[[0.47265625, 0.42968750, 0.42968750, 0.04296875],
        [0.42968750, 0.39062500, 0.39062500, 0.03906250],
        [0.42968750, 0.39062500, 0.39062500, 0.03906250],
        [0.04296875, 0.03906250, 0.03906250, 0.00390625]]]]),
]


def test_roi_align_rotated_golden_forward_and_grad():
    for (feat_nchw, roi), (out_nchw, grad_nchw) in zip(ROI_INPUTS,
                                                       ROI_OUTPUTS):
        feat = jnp.asarray(np.asarray(feat_nchw, np.float32)
                           .transpose(0, 2, 3, 1))       # NCHW -> NHWC
        rois = jnp.asarray(np.asarray(roi, np.float32))
        expect = np.asarray(out_nchw, np.float32).transpose(0, 2, 3, 1)
        # mmcv's fixture runs RoIAlignRotated(clockwise=False); our
        # clockwise flag is named for the detector convention (le90
        # theta, y-down) and maps to the OPPOSITE mmcv flag value —
        # clockwise=True reproduces the fixture (and is the production
        # default used by the oriented RCNN paths)
        out = roi_align_rotated(feat, rois, 2, 1.0, sample_num=2,
                                aligned=True, clockwise=True)
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-4)
        # gradient of sum(out) wrt input features (the gradcheck arrays)
        g = jax.grad(lambda f: jnp.sum(roi_align_rotated(
            f, rois, 2, 1.0, sample_num=2, aligned=True,
            clockwise=True)))(feat)
        gexpect = np.asarray(grad_nchw, np.float32).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(g), gexpect, atol=1e-4)
