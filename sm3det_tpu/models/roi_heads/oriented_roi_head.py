"""Oriented Standard RoI head, TPU-native.

Parity targets:
- ``RotatedSingleRoIExtractor``
  (``mmrotate/models/roi_heads/roi_extractors/rotate_single_level_roi_extractor.py:68-149``):
  FPN level per RoI by ``floor(log2(sqrt(wh)/56))``, RoIAlignRotated 7x7 /
  2 samples / clockwise.
- ``RotatedShared2FCBBoxHead``
  (``mmrotate/models/roi_heads/bbox_heads/convfc_rbbox_head.py``):
  flatten -> 2xFC(1024) -> cls (C+1 softmax) + reg (5, class-agnostic).
- ``OrientedStandardRoIHead`` (``oriented_standard_roi_head.py:10``):
  MaxIoU assign on rotated IoU, RRandomSampler 512 @ pos_fraction .25 with
  gt-as-proposals, softmax CE + SmoothL1 on DeltaXYWHAOBBox targets.

Static-shape design: fixed proposal count with validity mask; the level
router runs RoIAlign on every level and selects per-RoI (4x compute for
full vectorization — each level's align is one fused gather batch; a
Pallas scatter-router is the planned upgrade).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.bbox.assigners import max_iou_assign
from ...core.bbox.coders import DeltaXYWHAOBBoxCoder
from ...core.bbox.samplers import random_sample
from ...ops.nms import multiclass_nms_rotated
from ...ops.roi_align_rotated import roi_align_rotated
from ...ops.rotated_iou import box_iou_rotated_chunked
from ..losses import smooth_l1_loss, softmax_cross_entropy


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _roi_feats_fused(feats, rois, out_size, featmap_strides, sample_num,
                     finest_scale, bucketed):
    """Pallas fused pyramid align (forward). ``bucketed=False`` (the
    training default) runs the exact worst-case-patch kernel;
    ``bucketed=True`` (inference paths) size-buckets: the big_k largest
    RoIs use the worst-case patch, the rest a ~5x-cheaper small patch
    with identical routing/sampling — exact unless >big_k RoIs exceed
    the small patch (then overflow RoIs sample one level coarser; see
    the kernel docstring). Training stays exact because its backward
    re-derives grads through the exact jnp formulation (autodiff
    scatter-add, matching the reference CUDA op's feature-only backward,
    ``roi_align_rotated_cuda_kernel.cuh``) and a bucket-degraded
    forward would disagree with it."""
    from ...ops.pallas.roi_align_kernel import (
        roi_align_rotated_pyramid_fused,
        roi_align_rotated_pyramid_fused_bucketed)
    fn = roi_align_rotated_pyramid_fused_bucketed if bucketed \
        else roi_align_rotated_pyramid_fused
    return fn(list(feats), rois, out_size, featmap_strides, sample_num,
              finest_scale=finest_scale)


def _roi_feats_fused_fwd(feats, rois, out_size, featmap_strides,
                         sample_num, finest_scale, bucketed):
    out = _roi_feats_fused(feats, rois, out_size, featmap_strides,
                           sample_num, finest_scale, bucketed)
    return out, (feats, rois)


def _roi_feats_fused_bwd(out_size, featmap_strides, sample_num,
                         finest_scale, bucketed, res, g):
    from ...ops.pallas.roi_align_kernel import (
        compute_patch_size, roi_align_rotated_pyramid_fused_bwd,
        route_levels)
    from ...ops.roi_align_rotated import roi_align_rotated_pyramid
    feats, rois = res
    if not bucketed and jax.default_backend() == "tpu":
        # Pallas windowed scatter backward: one MXU stencil matmul +
        # read-modify-write window DMA per RoI (XLA's scatter lowering
        # of the jnp VJP below is row-serialized — 14 ms/train step at
        # bench shapes; parity: tests/test_pallas_kernels.py::
        # test_fused_align_bwd_kernel_matches_jnp_vjp)
        gf = roi_align_rotated_pyramid_fused_bwd(
            tuple(feats), rois, g, out_size, tuple(featmap_strides),
            sample_num, finest_scale=finest_scale)
        return gf, jnp.zeros_like(rois)
    patch = compute_patch_size([f.shape[1] for f in feats],
                               [f.shape[2] for f in feats])
    lvls = route_levels(rois, patch, featmap_strides, finest_scale,
                        len(featmap_strides))
    out_inner, vjp = jax.vjp(
        lambda f: roi_align_rotated_pyramid(
            list(f), rois, lvls, out_size,
            featmap_strides=featmap_strides, sample_num=sample_num),
        feats)
    # the exact path promotes bf16 feats to f32 (f32 bilinear weights);
    # the cotangent must match ITS output dtype, not the feats dtype
    (gf,) = vjp(g.astype(out_inner.dtype))
    gf = tuple(a.astype(f.dtype) for a, f in zip(gf, feats))
    return gf, jnp.zeros_like(rois)


_roi_feats_fused.defvjp(_roi_feats_fused_fwd, _roi_feats_fused_bwd)


def extract_rotated_roi_feats(feats: Sequence[jnp.ndarray], rois,
                              out_size: int = 7, sample_num: int = 2,
                              featmap_strides=(4, 8, 16, 32),
                              finest_scale: int = 56,
                              bucketed: bool = False):
    """Multi-level RoIAlignRotated with per-RoI level routing.

    TPU-first design: on TPU backends this dispatches to the fused
    Pallas kernel (per-RoI double-buffered patch DMA + MXU one-hot
    bilinear matmul, ``ops/pallas/roi_align_kernel.py`` — ~10x the
    gather formulation at N=2000); elsewhere all pyramid levels are
    stacked into ONE row-concatenated buffer and every RoI gathers from
    its assigned level via a row offset. Level selection per
    ``RotatedSingleRoIExtractor.map_roi_levels``:
    ``floor(log2(sqrt(wh)/56))`` (the fused path adds an extent clamp
    for ultra-elongated boxes; see the kernel docstring).

    Args:
        feats: per-level (B, H, W, C).
        rois: (N, 6) (batch_idx, cx, cy, w, h, theta) in image coords.
    Returns:
        (N, out, out, C).
    """
    # fused kernel requires lane-aligned channels (Mosaic slices the
    # minor dim in 128-lane tiles); production FPN C=256 qualifies
    if jax.default_backend() == "tpu" and feats[0].shape[-1] % 128 == 0:
        return _roi_feats_fused(tuple(feats), rois, out_size,
                                tuple(featmap_strides), sample_num,
                                finest_scale, bucketed)
    from ...ops.roi_align_rotated import roi_align_rotated_pyramid
    scale = jnp.sqrt(jnp.maximum(rois[:, 3] * rois[:, 4], 1e-6))
    target_lvls = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    target_lvls = jnp.clip(target_lvls, 0,
                           len(featmap_strides) - 1).astype(jnp.int32)
    return roi_align_rotated_pyramid(
        feats, rois, target_lvls, out_size,
        featmap_strides=featmap_strides, sample_num=sample_num)


class RotatedShared2FCBBoxHead(nn.Module):
    num_classes: int = 26
    in_channels: int = 256
    fc_out_channels: int = 1024
    roi_feat_size: int = 7
    reg_class_agnostic: bool = True

    @nn.compact
    def __call__(self, roi_feats):
        """roi_feats (N, 7, 7, C) -> (cls_logits (N, C+1), deltas (N, 5))."""
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_out_channels, name="shared_fc0")(x))
        x = nn.relu(nn.Dense(self.fc_out_channels, name="shared_fc1")(x))
        cls = nn.Dense(self.num_classes + 1, name="fc_cls")(x)
        reg_dim = 5 if self.reg_class_agnostic else 5 * self.num_classes
        reg = nn.Dense(reg_dim, name="fc_reg")(x)
        return cls, reg


def sample_rois_for_training(rng, proposals, proposal_valid, gt_obbs,
                             gt_labels, gt_mask, num: int = 512,
                             pos_fraction: float = 0.25,
                             pos_iou_thr: float = 0.5,
                             neg_iou_thr: float = 0.5,
                             min_pos_iou: float = 0.5):
    """Assign + sample RoIs for one image (gt-as-proposals included).

    Returns dict of sampled rois (num, 5), labels (num,), reg targets flags.
    """
    props = jnp.concatenate([gt_obbs, proposals], axis=0)      # (G+P, 5)
    prop_valid = jnp.concatenate([gt_mask, proposal_valid], axis=0)
    ious = box_iou_rotated_chunked(props, gt_obbs)             # (G+P, G)
    ious = jnp.where(prop_valid[:, None] & gt_mask[None, :], ious, -1.0)
    assigned = max_iou_assign(
        ious, gt_mask, pos_iou_thr=pos_iou_thr, neg_iou_thr=neg_iou_thr,
        min_pos_iou=min_pos_iou, match_low_quality=False)
    assigned = jnp.where(prop_valid, assigned, -1)             # pads ignored
    sample = random_sample(rng, assigned, num, pos_fraction)
    inds = sample["inds"]
    sel_rois = props[inds]
    sel_assigned = assigned[inds]
    gt_idx = jnp.clip(sel_assigned - 1, 0)
    return {
        "rois": sel_rois,
        "pos_mask": sample["pos_mask"],
        "neg_mask": sample["neg_mask"],
        "gt_idx": gt_idx,
    }


def bbox_head_loss(cls_logits, reg_pred, sampled, gt_obbs, gt_labels,
                   coder: DeltaXYWHAOBBoxCoder, num_classes: int,
                   norm_ctx=None):
    """Softmax CE + SmoothL1 on sampled RoIs (masked, summed; caller divides
    by the cross-image avg factor).

    All args are per-image (vmapped by the caller) EXCEPT the final
    normalization which happens outside.
    """
    pos, neg = sampled["pos_mask"], sampled["neg_mask"]
    valid = pos | neg
    gt_idx = sampled["gt_idx"]
    labels = jnp.where(pos, gt_labels[gt_idx], num_classes)   # bg = C
    l_cls = softmax_cross_entropy(
        cls_logits, labels, weight=valid.astype(jnp.float32),
        avg_factor=1.0)
    targets = coder.encode(sampled["rois"], gt_obbs[gt_idx])  # (S, 5)
    l_reg = smooth_l1_loss(
        reg_pred, targets, beta=1.0,
        weight=pos[:, None].astype(jnp.float32), avg_factor=1.0)
    return l_cls, l_reg, jnp.sum(valid), jnp.sum(pos)


def roi_head_get_bboxes(cls_logits, reg_pred, rois, roi_valid,
                        coder: DeltaXYWHAOBBoxCoder, num_classes: int,
                        img_shape=None, score_thr: float = 0.05,
                        iou_thr: float = 0.1, max_per_img: int = 2000,
                        pre_nms: int = 2000):
    """Decode + multiclass rotated NMS for one image."""
    scores = jax.nn.softmax(cls_logits, axis=-1)               # (N, C+1)
    scores = jnp.where(roi_valid[:, None], scores, 0.0)
    obbs = coder.decode(rois, reg_pred, max_shape=img_shape)   # (N, 5)
    return multiclass_nms_rotated(
        obbs, scores, score_thr=score_thr, iou_thr=iou_thr,
        max_num=max_per_img, pre_nms=pre_nms)
