"""Standalone rotated detectors (zoo parity, SURVEY.md §2.2 detectors).

- ``RotatedRetinaNet``   (``mmrotate/models/detectors/rotated_retinanet``)
- ``OrientedRCNN``       (``oriented_rcnn.py:9`` — the single-dataset
  DOTA/DroneVehicle baselines ``dota_convnext_t_orcnn`` etc.)
- ``GFLDetector``        (the SAR-only baseline ``sardet50k_convnext_t_gfl``)

Each is a backbone + FPN + head with train (loss dict) and
``simple_test`` methods, mirroring the TriSource branch implementations.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..backbones.convnext import ConvNeXtMoE
from ..dense_heads.gfl_head import GFLHead, gfl_get_bboxes, gfl_loss
from ..dense_heads.oriented_rpn_head import (OrientedRPNHead,
                                             rpn_get_proposals, rpn_loss)
from ..dense_heads.rotated_retina_head import (RotatedRetinaHead,
                                               make_retina_anchor_generator,
                                               make_retina_coder,
                                               retina_get_bboxes,
                                               retina_loss)
from ..necks.fpn import MultitaskFPN
from ..roi_heads.oriented_roi_head import (RotatedShared2FCBBoxHead,
                                           bbox_head_loss,
                                           extract_rotated_roi_feats,
                                           roi_head_get_bboxes,
                                           sample_rois_for_training)
from .trisource import (make_rcnn_coder, make_rpn_anchor_generator,
                        make_rpn_coder, make_sar_anchor_generator)


def _build_backbone(b: Dict[str, Any]):
    return ConvNeXtMoE(
        arch=b.get("arch", "tiny"),
        drop_path_rate=b.get("drop_path_rate", 0.0),
        moe_block_inds=tuple(tuple(i) for i in
                             b.get("moe_block_inds", ((), (), (), ()))),
        num_experts=b.get("num_experts", 2),
        top_k=b.get("top_k", 2),
        name="backbone")


class RotatedRetinaNet(nn.Module):
    """Single-stage rotated detector."""

    cfg: Dict[str, Any]

    def setup(self):
        c = self.cfg
        self.backbone = _build_backbone(c["backbone"])
        n = c["neck"]
        self.neck = MultitaskFPN(
            in_channels=tuple(n["in_channels"]),
            out_channels=n["out_channels"], num_outs=n.get("num_outs", 5),
            extra_level=n.get("extra_level", 1), name="neck")
        self.bbox_head = RotatedRetinaHead(
            num_classes=c["num_classes"], name="bbox_head")

    def extract_feat(self, imgs, train=False):
        feats, gate_loss = self.backbone(imgs, train=train)
        # retina uses P3..P7: start_level=1 with 2 extra convs
        x = self.neck(list(feats), start_level=1,
                      add_extra_convs="on_output")
        return x, gate_loss

    def __call__(self, batch, train=True):
        c = self.cfg
        x, gate_loss = self.extract_feat(batch["img"], train=train)
        cls_scores, bbox_preds = self.bbox_head(x)
        gen = make_retina_anchor_generator()
        # retina coder: stds all 1.0 + L1 reg loss
        # (rotated_retinanet_obb_r50_fpn_1x_dota_le90.py:40-54)
        coder = make_retina_coder(c.get("angle_version", "le90"))
        losses = retina_loss(
            cls_scores, bbox_preds, batch["gt_obbs"], batch["gt_labels"],
            batch["gt_mask"], gen, coder, c["num_classes"],
            reg_loss=c.get("reg_loss", "l1"))
        if gate_loss is not None:
            losses["gate_loss"] = gate_loss
        return losses

    def simple_test(self, imgs, img_shape):
        c = self.cfg
        x, _ = self.extract_feat(imgs, train=False)
        cls_scores, bbox_preds = self.bbox_head(x)
        gen = make_retina_anchor_generator()
        coder = make_retina_coder(c.get("angle_version", "le90"))
        return retina_get_bboxes(
            cls_scores, bbox_preds, gen, coder, c["num_classes"],
            img_shape)


class OrientedRCNN(nn.Module):
    """Two-stage Oriented R-CNN (single-dataset baseline)."""

    cfg: Dict[str, Any]

    def setup(self):
        c = self.cfg
        self.backbone = _build_backbone(c["backbone"])
        n = c["neck"]
        self.neck = MultitaskFPN(
            in_channels=tuple(n["in_channels"]),
            out_channels=n["out_channels"], num_outs=n.get("num_outs", 5),
            extra_level=n.get("extra_level", 1), name="neck")
        self.rpn_head = OrientedRPNHead(name="rpn_head")
        self.roi_head = RotatedShared2FCBBoxHead(
            num_classes=c["num_classes"], name="roi_head")

    def extract_feat(self, imgs, train=False):
        feats, gate_loss = self.backbone(imgs, train=train)
        return self.neck(list(feats), start_level=0,
                         add_extra_convs="on_output"), gate_loss

    def __call__(self, batch, train=True):
        c = self.cfg
        r = c.get("rcnn", {})
        version = c.get("angle_version", "le90")
        x, gate_loss = self.extract_feat(batch["img"], train=train)
        rpn_cls, rpn_reg = self.rpn_head(x)
        gen = make_rpn_anchor_generator()
        rpn_coder = make_rpn_coder(version)
        losses = {}
        if gate_loss is not None:
            losses["gate_loss"] = gate_loss
        losses.update(rpn_loss(
            self.make_rng("sampling"), rpn_cls, rpn_reg,
            batch["gt_obbs"], batch["gt_mask"], gen, rpn_coder,
            version=version, num_sample=r.get("rpn_sample", 256)))
        proposals, _, p_valid = rpn_get_proposals(
            jax.lax.stop_gradient(rpn_cls), jax.lax.stop_gradient(rpn_reg),
            gen, rpn_coder, None,
            nms_pre=r.get("rpn_nms_pre", 2000),
            max_per_img=r.get("rpn_max", 2000),
            iou_thr=r.get("rpn_nms_iou", 0.8))
        rngs = jax.random.split(self.make_rng("sampling"),
                                proposals.shape[0])
        sampled = jax.vmap(
            lambda rr, p, pv, g, gl, gm: sample_rois_for_training(
                rr, p, pv, g, gl, gm, num=r.get("rcnn_sample", 512))
        )(rngs, proposals, p_valid, batch["gt_obbs"],
          batch["gt_labels"], batch["gt_mask"])
        bsz, s = sampled["rois"].shape[:2]
        batch_idx = jnp.repeat(
            jnp.arange(bsz, dtype=jnp.float32), s)[:, None]
        rois6 = jnp.concatenate(
            [batch_idx, sampled["rois"].reshape(-1, 5)], axis=-1)
        roi_feats = extract_rotated_roi_feats(x, rois6)
        cls_logits, reg_pred = self.roi_head(roi_feats)
        cls_logits = cls_logits.reshape(bsz, s, -1)
        reg_pred = reg_pred.reshape(bsz, s, -1)
        rcnn_coder = make_rcnn_coder(version)
        l_cls, l_reg, n_valid, _ = jax.vmap(
            lambda cl, rp, sm, g, gl: bbox_head_loss(
                cl, rp, sm, g, gl, rcnn_coder, c["num_classes"])
        )(cls_logits, reg_pred, sampled, batch["gt_obbs"],
          batch["gt_labels"])
        total = jnp.maximum(jnp.sum(n_valid).astype(jnp.float32), 1.0)
        losses["loss_cls"] = jnp.sum(l_cls) / total
        losses["loss_bbox"] = jnp.sum(l_reg) / total
        return losses

    def simple_test(self, imgs, img_shape):
        c = self.cfg
        r = c.get("rcnn", {})
        version = c.get("angle_version", "le90")
        x, _ = self.extract_feat(imgs, train=False)
        rpn_cls, rpn_reg = self.rpn_head(x)
        gen = make_rpn_anchor_generator()
        rpn_coder = make_rpn_coder(version)
        proposals, _, p_valid = rpn_get_proposals(
            rpn_cls, rpn_reg, gen, rpn_coder, img_shape,
            nms_pre=r.get("rpn_nms_pre", 2000),
            max_per_img=r.get("rpn_max", 2000),
            iou_thr=r.get("rpn_nms_iou", 0.8))
        bsz, s = proposals.shape[:2]
        batch_idx = jnp.repeat(
            jnp.arange(bsz, dtype=jnp.float32), s)[:, None]
        rois6 = jnp.concatenate(
            [batch_idx, proposals.reshape(-1, 5)], axis=-1)
        roi_feats = extract_rotated_roi_feats(x, rois6, bucketed=True)
        cls_logits, reg_pred = self.roi_head(roi_feats)
        cls_logits = cls_logits.reshape(bsz, s, -1)
        reg_pred = reg_pred.reshape(bsz, s, -1)
        rcnn_coder = make_rcnn_coder(version)
        return jax.vmap(
            lambda cl, rp, pr, pv: roi_head_get_bboxes(
                cl, rp, pr, pv, rcnn_coder, c["num_classes"],
                img_shape=img_shape,
                score_thr=r.get("score_thr", 0.05),
                iou_thr=r.get("nms_iou", 0.1),
                max_per_img=r.get("max_per_img", 2000))
        )(cls_logits, reg_pred, proposals, p_valid)


class GFLDetector(nn.Module):
    """Single-stage horizontal GFL detector (SAR specialist baseline)."""

    cfg: Dict[str, Any]

    def setup(self):
        c = self.cfg
        self.backbone = _build_backbone(c["backbone"])
        n = c["neck"]
        self.neck = MultitaskFPN(
            in_channels=tuple(n["in_channels"]),
            out_channels=n["out_channels"], num_outs=n.get("num_outs", 5),
            extra_level=n.get("extra_level", 1), name="neck")
        self.bbox_head = GFLHead(num_classes=c["num_classes"],
                                 name="bbox_head")

    def extract_feat(self, imgs, train=False):
        feats, gate_loss = self.backbone(imgs, train=train)
        return self.neck(list(feats), start_level=1,
                         add_extra_convs="on_output"), gate_loss

    def __call__(self, batch, train=True):
        c = self.cfg
        x, gate_loss = self.extract_feat(batch["img"], train=train)
        cls_scores, bbox_preds = self.bbox_head(x)
        gen = make_sar_anchor_generator()
        losses = gfl_loss(
            cls_scores, bbox_preds, batch["gt_bboxes"],
            batch["gt_labels"], batch["gt_mask"], gen, c["num_classes"])
        if gate_loss is not None:
            losses["gate_loss"] = gate_loss
        return losses

    def simple_test(self, imgs, img_shape):
        c = self.cfg
        x, _ = self.extract_feat(imgs, train=False)
        cls_scores, bbox_preds = self.bbox_head(x)
        gen = make_sar_anchor_generator()
        return gfl_get_bboxes(cls_scores, bbox_preds, gen,
                              c["num_classes"], img_shape)
