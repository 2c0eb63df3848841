"""rpn_get_proposals: the per-level-NMS + score-merge formulation must
be exactly equivalent to the level-offset batched-NMS formulation
(mmdet RPN semantics: boxes of different levels never suppress each
other — ``mmdet/models/dense_heads/rpn_head.py`` get_bboxes)."""
import jax
import jax.numpy as jnp
import numpy as np

from sm3det_tpu.core.anchor import AnchorGenerator
from sm3det_tpu.core.bbox.coders import MidpointOffsetCoder
from sm3det_tpu.models.dense_heads.oriented_rpn_head import \
    rpn_get_proposals
from sm3det_tpu.ops.box_convert import obb2xyxy
from sm3det_tpu.ops.nms import nms


def _reference_proposals(cls_scores, bbox_preds, gen, coder, nms_pre,
                         max_per_img, iou_thr):
    """Level-offset batched-NMS formulation (the round-1 code path)."""
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    anchors_l = gen.grid_anchors(featmap_sizes)
    b = cls_scores[0].shape[0]
    outs = []
    for bi in range(b):
        boxes_all, scores_all, level_all = [], [], []
        for lvl in range(len(cls_scores)):
            scores = jax.nn.sigmoid(cls_scores[lvl][bi].reshape(-1))
            deltas = bbox_preds[lvl][bi].reshape(-1, 6)
            k = min(nms_pre, scores.shape[0])
            top_vals, top_idx = jax.lax.top_k(scores, k)
            obbs = coder.decode(anchors_l[lvl][top_idx],
                                deltas[top_idx])
            boxes_all.append(obbs)
            scores_all.append(top_vals)
            level_all.append(jnp.full((k,), lvl, jnp.int32))
        obbs = jnp.concatenate(boxes_all, 0)
        scores = jnp.concatenate(scores_all, 0)
        levels = jnp.concatenate(level_all, 0)
        hbbs = obb2xyxy(obbs)
        max_coord = jnp.max(jnp.abs(hbbs)) + 1.0
        shifted = hbbs + (levels.astype(hbbs.dtype) *
                          2 * max_coord)[:, None]
        _, idx, valid = nms(shifted, scores, iou_thr,
                            max_out=max_per_img)
        safe = jnp.where(idx >= 0, idx, 0)
        outs.append((jnp.where(valid[:, None], obbs[safe], 0.0),
                     jnp.where(valid, scores[safe], 0.0), valid))
    return tuple(jnp.stack([o[i] for o in outs]) for i in range(3))


def test_per_level_nms_matches_level_offset_nms():
    rng = np.random.RandomState(7)
    strides = (4, 8, 16, 32)
    sizes = [(16, 16), (8, 8), (4, 4), (2, 2)]
    b = 2
    cls_scores = [jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
                  for h, w in sizes]
    bbox_preds = [jnp.asarray(
        (rng.randn(b, h, w, 18) * 0.3).astype(np.float32))
        for h, w in sizes]
    gen = AnchorGenerator(strides=list(strides),
                          ratios=[0.5, 1.0, 2.0], scales=[8])
    coder = MidpointOffsetCoder()
    kw = dict(nms_pre=100, max_per_img=60, iou_thr=0.7)

    got = rpn_get_proposals(cls_scores, bbox_preds, gen, coder,
                            img_shape=(64, 64), **kw)
    ref = _reference_proposals(cls_scores, bbox_preds, gen, coder, **kw)

    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(ref[2]))
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=1e-5)
