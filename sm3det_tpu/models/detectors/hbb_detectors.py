"""Horizontal-box detector zoo: FasterRCNN / CascadeRCNN / RetinaNet.

Parity targets: the SAR specialist configs train plain mmdet HBB
detectors (``local_configs/sardet50k_convnext_t_{frcnn,cascade,retina}.py``
use mmdet's FasterRCNN/CascadeRCNN/RetinaNet; mmdet is an external dep of
the reference). Assembled from the repo's existing HBB parts:
RPNHead + sample_hbb_rois + Shared2FCBBoxHead
(roi_heads/standard_roi_head.py) and the horizontal AnchorGenerator.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.anchor import AnchorGenerator
from ...core.bbox.assigners import max_iou_assign
from ...core.bbox.coders import DeltaXYWHBBoxCoder
from ...ops.nms import bbox_overlaps
from ..dense_heads.rpn_head import (RPNHead, hbb_rpn_get_proposals,
                                    hbb_rpn_loss)
from ..losses import sigmoid_focal_loss, smooth_l1_loss
from ..necks.fpn import MultitaskFPN
from ..roi_heads.standard_roi_head import (Shared2FCBBoxHead,
                                           extract_hbb_roi_feats,
                                           hbb_head_loss, sample_hbb_rois)
from .zoo import _build_backbone


class _TwoStageHBBBase(nn.Module):
    cfg: Dict[str, Any]
    num_stages: int = 1

    # cascade stage IoU thresholds (mmdet CascadeRCNN defaults)
    STAGE_IOUS = (0.5, 0.6, 0.7)
    STAGE_STDS = ((0.1, 0.1, 0.2, 0.2), (0.05, 0.05, 0.1, 0.1),
                  (0.033, 0.033, 0.067, 0.067))

    def setup(self):
        c = self.cfg
        self.backbone = _build_backbone(c["backbone"])
        n = c["neck"]
        self.neck = MultitaskFPN(
            in_channels=tuple(n["in_channels"]),
            out_channels=n["out_channels"], num_outs=n.get("num_outs", 5),
            extra_level=n.get("extra_level", 1), name="neck")
        self.rpn_head = RPNHead(name="rpn_head")
        self.bbox_heads = [
            Shared2FCBBoxHead(num_classes=c["num_classes"],
                              name=f"bbox_head{i}")
            for i in range(self.num_stages)]

    def __call__(self, batch, train=True):
        c = self.cfg
        feats, gate_loss = self.backbone(batch["img"], train=train)
        x = self.neck(list(feats), start_level=0,
                      add_extra_convs="on_output")
        losses = {}
        if gate_loss is not None:
            losses["gate_loss"] = gate_loss

        gt = batch["gt_bboxes"]
        gen = AnchorGenerator(strides=[4, 8, 16, 32, 64],
                              ratios=[0.5, 1.0, 2.0], scales=[8])
        rpn_coder = DeltaXYWHBBoxCoder()
        rpn_cls, rpn_reg = self.rpn_head(x)
        losses.update(hbb_rpn_loss(
            self.make_rng("sampling"), rpn_cls, rpn_reg, gt,
            batch["gt_mask"], gen, rpn_coder,
            num_sample=c.get("rpn_sample", 64)))
        proposals, _, p_valid = hbb_rpn_get_proposals(
            jax.lax.stop_gradient(rpn_cls), jax.lax.stop_gradient(rpn_reg),
            gen, rpn_coder, None, nms_pre=c.get("rpn_nms_pre", 256),
            max_per_img=c.get("rpn_max", 256))

        bsz = proposals.shape[0]
        cur, cur_valid = proposals, p_valid
        for stage in range(self.num_stages):
            iou = self.STAGE_IOUS[stage]
            coder = DeltaXYWHBBoxCoder(
                target_stds=self.STAGE_STDS[stage])
            rngs = jax.random.split(
                self.make_rng("sampling"), bsz)
            sampled = jax.vmap(
                lambda r, p, pv, g, gl, gm: sample_hbb_rois(
                    r, p, pv, g, gl, gm,
                    num=c.get("rcnn_sample", 128),
                    pos_iou_thr=iou, neg_iou_thr=iou, min_pos_iou=iou)
            )(rngs, cur, cur_valid, gt, batch["gt_labels"],
              batch["gt_mask"])
            s = sampled["rois"].shape[1]
            bidx = jnp.repeat(jnp.arange(bsz, dtype=jnp.float32),
                              s)[:, None]
            rois5 = jnp.concatenate(
                [bidx, sampled["rois"].reshape(-1, 4)], -1)
            rf = extract_hbb_roi_feats(x, rois5)
            cls_logits, reg = self.bbox_heads[stage](rf)
            l_cls, l_reg, n_valid, n_pos = jax.vmap(
                lambda a, b, sm, g, gl: hbb_head_loss(
                    a, b, sm, g, gl, coder, c["num_classes"])
            )(cls_logits.reshape(bsz, s, -1), reg.reshape(bsz, s, -1),
              sampled, gt, batch["gt_labels"])
            tot = jnp.maximum(jnp.sum(n_valid).astype(jnp.float32), 1.0)
            prefix = "" if self.num_stages == 1 else f"s{stage}_"
            losses[f"{prefix}loss_cls"] = jnp.sum(l_cls) / tot
            losses[f"{prefix}loss_bbox"] = jnp.sum(l_reg) / tot
            if stage + 1 < self.num_stages:
                # refine proposals for the next cascade stage
                decoded = jax.vmap(
                    lambda r, d: coder.decode(r, d[:, :4]))(
                    sampled["rois"],
                    jax.lax.stop_gradient(
                        reg.reshape(bsz, s, -1)))
                cur = decoded
                cur_valid = sampled["pos_mask"] | sampled["neg_mask"]
        return losses


class FasterRCNN(_TwoStageHBBBase):
    """Single RCNN stage (mmdet FasterRCNN)."""

    num_stages: int = 1


class CascadeRCNN(_TwoStageHBBBase):
    """Three cascade RCNN stages with increasing IoU thresholds."""

    num_stages: int = 3


class RetinaNet(nn.Module):
    """HBB RetinaNet: 9-anchor focal + L1 (mmdet RetinaNet)."""

    cfg: Dict[str, Any]

    def setup(self):
        c = self.cfg
        self.backbone = _build_backbone(c["backbone"])
        n = c["neck"]
        self.neck = MultitaskFPN(
            in_channels=tuple(n["in_channels"]),
            out_channels=n["out_channels"], num_outs=5,
            extra_level=n.get("extra_level", 1), name="neck")
        self.feat_channels = n["out_channels"]

    @nn.compact
    def __call__(self, batch, train=True):
        c = self.cfg
        nc = c["num_classes"]
        feats, gate_loss = self.backbone(batch["img"], train=train)
        x = self.neck(list(feats), start_level=1,
                      add_extra_convs="on_output")
        na = 9
        cls_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             name=f"cls_conv{i}") for i in range(4)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             name=f"reg_conv{i}") for i in range(4)]
        cls_out = nn.Conv(na * nc, (3, 3), padding=1,
                          bias_init=nn.initializers.constant(
                              float(-np.log((1 - 0.01) / 0.01))),
                          name="retina_cls")
        reg_out = nn.Conv(na * 4, (3, 3), padding=1, name="retina_reg")
        cls_scores, bbox_preds = [], []
        for f in x:
            cf, rf = f, f
            for conv in cls_convs:
                cf = nn.relu(conv(cf))
            for conv in reg_convs:
                rf = nn.relu(conv(rf))
            cls_scores.append(cls_out(cf))
            bbox_preds.append(reg_out(rf))

        gen = AnchorGenerator(strides=[8, 16, 32, 64, 128],
                              ratios=[0.5, 1.0, 2.0],
                              octave_base_scale=4, scales_per_octave=3)
        coder = DeltaXYWHBBoxCoder()
        sizes = [tuple(s.shape[1:3]) for s in cls_scores]
        anchors = jnp.concatenate(gen.grid_anchors(sizes), 0)
        flat_cls = jnp.concatenate(
            [s.reshape(s.shape[0], -1, nc) for s in cls_scores], 1)
        flat_reg = jnp.concatenate(
            [p.reshape(p.shape[0], -1, 4) for p in bbox_preds], 1)

        def single(cls_s, reg_s, gts, labels, mask):
            ious = bbox_overlaps(anchors, gts)
            ious = jnp.where(mask[None, :], ious, -1.0)
            assigned = max_iou_assign(
                ious, mask, pos_iou_thr=0.5, neg_iou_thr=0.4,
                min_pos_iou=0.0, match_low_quality=True)
            pos = assigned > 0
            gt_idx = jnp.clip(assigned - 1, 0)
            cls_t = jnp.where(pos, labels[gt_idx], nc)
            l_cls = sigmoid_focal_loss(
                cls_s, cls_t,
                weight=(pos | (assigned == 0)).astype(jnp.float32),
                avg_factor=1.0)
            targets = coder.encode(anchors, gts[gt_idx])
            l_reg = smooth_l1_loss(
                reg_s, targets, beta=0.11,
                weight=pos[:, None].astype(jnp.float32), avg_factor=1.0)
            return l_cls, l_reg, jnp.sum(pos)

        l_cls, l_reg, n_pos = jax.vmap(single)(
            flat_cls, flat_reg, batch["gt_bboxes"], batch["gt_labels"],
            batch["gt_mask"])
        total = jnp.maximum(jnp.sum(n_pos).astype(jnp.float32), 1.0)
        losses = {"loss_cls": jnp.sum(l_cls) / total,
                  "loss_bbox": jnp.sum(l_reg) / total}
        if gate_loss is not None:
            losses["gate_loss"] = gate_loss
        return losses
