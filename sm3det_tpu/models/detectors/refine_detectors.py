"""Refinement-stage rotated detectors: R3Det and S2ANet.

Parity targets (SURVEY.md §2.2 detectors):
- ``R3Det`` (``mmrotate/models/detectors/r3det.py``): RotatedRetina first
  stage -> per-location best refined anchor -> ``rotated_feature_align``
  (our jnp op) -> refine head(s) regressing from refined anchors.
- ``S2ANet`` (``s2anet.py``): FAM head (single anchor/cell) -> align
  module -> ODM head. The reference's ORConv/``active_rotated_filter``
  orientation channels are provided by :mod:`sm3det_tpu.ops.orientation`;
  the align module here uses anchor-guided resampling via
  ``rotated_feature_align`` (AlignConv's sampling contract).

Both share the static-shape anchor/assign toolkit from the retina head.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.anchor import RotatedAnchorGenerator
from ...core.bbox.coders import DeltaXYWHAOBBoxCoder
from ...ops.geometry_extras import rotated_feature_align
from ...ops.orientation import arf_expand, rotation_invariant_pool
from ..dense_heads.rotated_retina_head import (RotatedRetinaHead,
                                               retina_get_bboxes,
                                               retina_loss)
from ..necks.fpn import MultitaskFPN
from .zoo import _build_backbone


def _refine_anchors(anchors, deltas, coder):
    """Decode per-location refined anchors from stage-1 regression."""
    return coder.decode(anchors, deltas)


class RefineHead(nn.Module):
    """Refinement stage: align features to refined anchors, then conv
    towers + cls/reg with ONE anchor per location (the refined one)."""

    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 2

    @nn.compact
    def __call__(self, feats, refined_anchors_maps, strides):
        """feats/refined_anchors_maps: per-level (B, H, W, C)/(B, H, W, 5).
        Returns per-level cls (B,H,W,num_classes), reg (B,H,W,5)."""
        cls_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        cls_out = nn.Conv(self.num_classes, (3, 3), padding=1,
                          name="refine_cls")
        reg_out = nn.Conv(5, (3, 3), padding=1, name="refine_reg")
        cls_scores, bbox_preds = [], []
        for x, anchors, stride in zip(feats, refined_anchors_maps,
                                      strides):
            x = rotated_feature_align(
                x, anchors, points=5, spatial_scale=1.0 / stride)
            cf, rf = x, x
            for conv in cls_convs:
                cf = nn.relu(conv(cf))
            for conv in reg_convs:
                rf = nn.relu(conv(rf))
            cls_scores.append(cls_out(cf))
            bbox_preds.append(reg_out(rf))
        return cls_scores, bbox_preds


class ORConv(nn.Module):
    """Oriented convolution (``mmrotate/models/utils/orconv.py:13``):
    one base filter per output plane, expanded into ``n_rot`` actively
    rotated copies (exact 45-degree index-table semantics via
    :func:`arf_expand`). Output channels are (out_channels, n_rot) with
    rotation fastest, like the torch op."""

    out_channels: int          # per-rotation output planes (Cout)
    n_orient: int = 1
    n_rot: int = 8
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1] // self.n_orient
        w = self.param(
            "weight",
            nn.initializers.normal(
                (2.0 / (cin * self.n_orient * k * k)) ** 0.5),
            (k, k, cin, self.n_orient, self.out_channels))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.out_channels * self.n_rot,))
        kernel = arf_expand(w, self.n_rot)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=(1, 1),
            padding=[(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(y.dtype)


class ODMRefineHead(nn.Module):
    """Oriented Detection Module head (S2ANet;
    ``mmrotate/models/dense_heads/odm_refine_head.py:62-124``):
    anchor-guided feature alignment (AlignConv contract), then ORConv
    producing orientation-sensitive features for regression and
    rotation-invariant-pooled features for classification."""

    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 2
    n_rot: int = 8

    @nn.compact
    def __call__(self, feats, refined_anchors_maps, strides):
        or_conv = ORConv(out_channels=self.feat_channels // self.n_rot,
                         n_rot=self.n_rot, name="or_conv")
        # first cls conv consumes the pooled C/n_rot channels (ref :87)
        cls_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        cls_out = nn.Conv(self.num_classes, (3, 3), padding=1,
                          name="odm_cls")
        reg_out = nn.Conv(5, (3, 3), padding=1, name="odm_reg")
        cls_scores, bbox_preds = [], []
        for x, anchors, stride in zip(feats, refined_anchors_maps,
                                      strides):
            x = rotated_feature_align(
                x, anchors, points=5, spatial_scale=1.0 / stride)
            or_feat = or_conv(x)                       # (B,H,W,C)
            rf = or_feat
            cf = rotation_invariant_pool(or_feat, self.n_rot)  # C/n_rot
            for conv in cls_convs:
                cf = nn.relu(conv(cf))
            for conv in reg_convs:
                rf = nn.relu(conv(rf))
            cls_scores.append(cls_out(cf))
            bbox_preds.append(reg_out(rf))
        return cls_scores, bbox_preds


class R3Det(nn.Module):
    """R3Det: retina stage + feature-refinement stage."""

    cfg: Dict[str, Any]
    num_refine_stages: int = 1
    refine_head_type: str = "generic"   # 'generic' (R3Det) | 'odm' (S2ANet)

    def setup(self):
        c = self.cfg
        self.backbone = _build_backbone(c["backbone"])
        n = c["neck"]
        self.neck = MultitaskFPN(
            in_channels=tuple(n["in_channels"]),
            out_channels=n["out_channels"], num_outs=n.get("num_outs", 5),
            extra_level=n.get("extra_level", 1), name="neck")
        self.bbox_head = RotatedRetinaHead(
            num_classes=c["num_classes"], num_anchors=1,
            name="bbox_head")
        head_cls = (ODMRefineHead if self.refine_head_type == "odm"
                    else RefineHead)
        self.refine_heads = [
            head_cls(num_classes=c["num_classes"],
                     feat_channels=n["out_channels"],
                     name=f"refine_head{i}")
            for i in range(self.num_refine_stages)]

    def _anchor_generator(self):
        # single square anchor per cell for the s1 stage (R3Det config)
        return RotatedAnchorGenerator(
            strides=[8, 16, 32, 64, 128], ratios=[1.0],
            octave_base_scale=4, scales_per_octave=1)

    def _coder(self):
        return DeltaXYWHAOBBoxCoder(
            angle_range=self.cfg.get("angle_version", "le90"),
            target_means=(0.,) * 5, target_stds=(1., 1., 1., 1., 1.))

    def extract_feat(self, imgs, train=False):
        feats, gate_loss = self.backbone(imgs, train=train)
        return self.neck(list(feats), start_level=1,
                         add_extra_convs="on_output"), gate_loss

    def __call__(self, batch, train=True):
        c = self.cfg
        x, gate_loss = self.extract_feat(batch["img"], train=train)
        gen = self._anchor_generator()
        coder = self._coder()
        losses = {}
        if gate_loss is not None:
            losses["gate_loss"] = gate_loss
        cls_scores, bbox_preds = self.bbox_head(x)
        s1 = retina_loss(cls_scores, bbox_preds, batch["gt_obbs"],
                         batch["gt_labels"], batch["gt_mask"], gen,
                         coder, c["num_classes"])
        losses.update({f"s0_{k}": v for k, v in s1.items()})

        # refined anchors per location (detached, like the reference)
        featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
        anchors_l = gen.grid_anchors(featmap_sizes)
        strides = (8, 16, 32, 64, 128)
        refined_maps, refined_flat = _refine_anchor_maps(
            bbox_preds, anchors_l, coder)
        for i, rh in enumerate(self.refine_heads):
            r_cls, r_reg = rh(x, refined_maps, strides)
            refined_anchors = jnp.concatenate(refined_flat, axis=1)

            def refine_loss(cls_s, reg_s, anchors_img, gts, labels, mask):
                from ...core.bbox.assigners import max_iou_assign
                from ...ops.rotated_iou import box_iou_rotated_chunked
                from ..losses import (kfiou_loss, sigmoid_focal_loss,
                                      smooth_l1_loss)
                ious = box_iou_rotated_chunked(anchors_img, gts)
                ious = jnp.where(mask[None, :], ious, -1.0)
                assigned = max_iou_assign(
                    ious, mask, pos_iou_thr=0.6, neg_iou_thr=0.5,
                    min_pos_iou=0.0, match_low_quality=True)
                pos = assigned > 0
                gt_idx = jnp.clip(assigned - 1, 0)
                tgt_cls = jnp.where(pos, labels[gt_idx],
                                    c["num_classes"])
                l_cls = sigmoid_focal_loss(
                    cls_s, tgt_cls,
                    weight=(assigned >= 0).astype(jnp.float32),
                    avg_factor=1.0)
                targets = coder.encode(anchors_img, gts[gt_idx])
                if c.get("refine_reg_loss", "smooth_l1") == "kfiou":
                    # KFIoU refine-head variants
                    # (``kfiou_odm_refine_head.py`` for S2ANet,
                    # ``kfiou_rotate_retina_refine_head.py`` for R3Det):
                    # same head, loss_bbox swapped to KFIoULoss
                    decoded = coder.decode(anchors_img, reg_s)
                    l_reg = kfiou_loss(
                        reg_s, targets, decoded, gts[gt_idx],
                        weight=pos.astype(jnp.float32), avg_factor=1.0)
                else:
                    l_reg = smooth_l1_loss(
                        reg_s, targets, beta=0.11,
                        weight=pos[:, None].astype(jnp.float32),
                        avg_factor=1.0)
                return l_cls, l_reg, jnp.sum(pos)

            flat_cls = jnp.concatenate(
                [s.reshape(s.shape[0], -1, c["num_classes"])
                 for s in r_cls], axis=1)
            flat_reg = jnp.concatenate(
                [p.reshape(p.shape[0], -1, 5) for p in r_reg], axis=1)
            l_cls, l_reg, n_pos = jax.vmap(refine_loss)(
                flat_cls, flat_reg, refined_anchors, batch["gt_obbs"],
                batch["gt_labels"], batch["gt_mask"])
            total = jnp.maximum(jnp.sum(n_pos).astype(jnp.float32), 1.0)
            losses[f"sr{i}_loss_cls"] = jnp.sum(l_cls) / total
            losses[f"sr{i}_loss_bbox"] = jnp.sum(l_reg) / total
        return losses

    def simple_test(self, imgs, img_shape=(800, 800), score_thr=0.05,
                    iou_thr=0.1, max_per_img=2000):
        """Inference (reference ``r3det.py`` / ``s2anet.py``
        ``simple_test``): stage-1 regression refines the anchors, each
        refine stage re-refines them, and the LAST stage's outputs are
        decoded against its own refined anchors (``bboxes_as_anchors``)
        into multiclass rotated NMS."""
        c = self.cfg
        x, _ = self.extract_feat(imgs, train=False)
        gen = self._anchor_generator()
        coder = self._coder()
        cls_scores, bbox_preds = self.bbox_head(x)
        featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
        anchors_l = gen.grid_anchors(featmap_sizes)
        strides = (8, 16, 32, 64, 128)
        refined_maps, refined_flat = _refine_anchor_maps(
            bbox_preds, anchors_l, coder)
        r_cls, r_reg = None, None
        for i, rh in enumerate(self.refine_heads):
            r_cls, r_reg = rh(x, refined_maps, strides)
            if i + 1 < len(self.refine_heads):
                # re-refine anchors for the next stage
                refined_maps = [
                    coder.decode(m.reshape(m.shape[0], -1, 5),
                                 p.reshape(p.shape[0], -1, 5))
                    .reshape(m.shape)
                    for m, p in zip(refined_maps, r_reg)]
                refined_flat = [m.reshape(m.shape[0], -1, 5)
                                for m in refined_maps]
        return refine_get_bboxes(
            r_cls, r_reg, refined_flat, coder, c["num_classes"],
            score_thr=score_thr, iou_thr=iou_thr,
            max_per_img=max_per_img)


def _refine_anchor_maps(bbox_preds, anchors_l, coder):
    """Per-level refined anchors from stage-1 regression (detached):
    returns (maps (B,H,W,5) list, flat (B,N,5) list)."""
    refined_maps, refined_flat = [], []
    for bp, a in zip(bbox_preds, anchors_l):
        b, h, w, _ = bp.shape
        deltas = jax.lax.stop_gradient(bp).reshape(b, -1, 5)
        ref = coder.decode(jnp.broadcast_to(a[None], deltas.shape), deltas)
        refined_maps.append(ref.reshape(b, h, w, 5))
        refined_flat.append(ref)
    return refined_maps, refined_flat


def refine_get_bboxes(cls_scores, bbox_preds, refined_anchors, coder,
                      num_classes, nms_pre=2000, score_thr=0.05,
                      iou_thr=0.1, max_per_img=2000):
    """Decode refine-stage outputs against the per-image REFINED anchors
    (the reference's ``bboxes_as_anchors`` contract,
    ``odm_refine_head.py:126-140`` / ``r3det.py simple_test``) and run
    multiclass rotated NMS. All inputs are per-level lists; refined
    anchors are (B, N_lvl, 5)."""
    from ...ops.nms import multiclass_nms_rotated

    def single_image(cls_list, reg_list, anc_list):
        cand_boxes, cand_scores = [], []
        for cls_s, reg_s, anc in zip(cls_list, reg_list, anc_list):
            scores = jax.nn.sigmoid(cls_s.reshape(-1, num_classes))
            deltas = reg_s.reshape(-1, 5)
            k = min(nms_pre, scores.shape[0])
            _, top_idx = jax.lax.top_k(jnp.max(scores, -1), k)
            cand_boxes.append(coder.decode(anc[top_idx], deltas[top_idx]))
            cand_scores.append(scores[top_idx])
        boxes = jnp.concatenate(cand_boxes, 0)
        scores = jnp.concatenate(cand_scores, 0)
        pad = jnp.zeros((scores.shape[0], 1), scores.dtype)
        return multiclass_nms_rotated(
            boxes, jnp.concatenate([scores, pad], -1),
            score_thr=score_thr, iou_thr=iou_thr, max_num=max_per_img,
            pre_nms=min(2000, scores.shape[0]))

    b = cls_scores[0].shape[0]
    cls_list = [s.reshape(b, -1, num_classes) for s in cls_scores]
    reg_list = [p.reshape(b, -1, 5) for p in bbox_preds]
    return jax.vmap(single_image)(cls_list, reg_list, refined_anchors)


class S2ANet(R3Det):
    """S2ANet = FAM (stage-1 single-anchor retina) + aligned ODM stage
    (``mmrotate/models/detectors/s2anet.py``); structurally the R3Det
    skeleton with one refine stage, which here is the full ODM head:
    anchor-guided alignment -> ORConv -> orientation-sensitive reg branch
    + rotation-invariant-pooled cls branch."""

    num_refine_stages: int = 1
    refine_head_type: str = "odm"
