"""Remaining single/two-stage zoo detectors assembled from parts:

- ``RotatedFCOS`` (``mmrotate/models/detectors/rotated_fcos.py``):
  backbone + FPN + RotatedFCOSHead.
- ``GlidingVertex`` (``gliding_vertex.py`` + ``GVRatioRoIHead``):
  horizontal RPN + GV bbox head (cls + hbb reg + fix + ratio).
- ``OrientedRepPoints`` (``rotated_reppoints.py`` family): backbone +
  FPN + OrientedRepPointsHead.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.anchor import AnchorGenerator
from ...core.bbox.coders import DeltaXYWHBBoxCoder
from ...core.bbox.gv_coders import GVFixCoder, GVRatioCoder
from ...ops.box_convert import obb2xyxy
from ..dense_heads.oriented_reppoints_head import (OrientedRepPointsHead,
                                                   reppoints_loss)
from ..dense_heads.rotated_fcos_head import RotatedFCOSHead, fcos_loss
from ..dense_heads.rpn_head import (RPNHead, hbb_rpn_get_proposals,
                                    hbb_rpn_loss)
from ..necks.fpn import MultitaskFPN
from ..roi_heads.cascade_heads import GVBBoxHead
from ..roi_heads.standard_roi_head import (extract_hbb_roi_feats,
                                           sample_hbb_rois)
from ..losses import smooth_l1_loss, softmax_cross_entropy
from .zoo import _build_backbone


class _SingleStageBase(nn.Module):
    cfg: Dict[str, Any]

    def setup(self):
        c = self.cfg
        self.backbone = _build_backbone(c["backbone"])
        n = c["neck"]
        self.neck = MultitaskFPN(
            in_channels=tuple(n["in_channels"]),
            out_channels=n["out_channels"], num_outs=n.get("num_outs", 5),
            extra_level=n.get("extra_level", 1), name="neck")
        self._setup_head()

    def extract_feat(self, imgs, train=False):
        feats, gate_loss = self.backbone(imgs, train=train)
        return self.neck(list(feats), start_level=1,
                         add_extra_convs="on_output"), gate_loss


class RotatedFCOS(_SingleStageBase):
    """Anchor-free rotated FCOS detector."""

    def _setup_head(self):
        self.bbox_head = RotatedFCOSHead(
            num_classes=self.cfg["num_classes"],
            feat_channels=self.cfg["neck"]["out_channels"],
            gn_groups=self.cfg.get("gn_groups", 32),
            strides=(8, 16, 32, 64, 128), name="bbox_head")

    def __call__(self, batch, train=True):
        c = self.cfg
        x, gate_loss = self.extract_feat(batch["img"], train=train)
        outs = self.bbox_head(x)
        losses = fcos_loss(*outs, batch["gt_obbs"], batch["gt_labels"],
                           batch["gt_mask"], c["num_classes"],
                           version=c.get("angle_version", "le90"))
        if gate_loss is not None:
            losses["gate_loss"] = gate_loss
        return losses


class OrientedRepPoints(_SingleStageBase):
    """Point-set rotated detector."""

    def _setup_head(self):
        self.bbox_head = OrientedRepPointsHead(
            num_classes=self.cfg["num_classes"],
            feat_channels=self.cfg["neck"]["out_channels"],
            gn_groups=self.cfg.get("gn_groups", 32), name="bbox_head")

    def __call__(self, batch, train=True):
        c = self.cfg
        x, gate_loss = self.extract_feat(batch["img"], train=train)
        cls_s, init_o, refine_o = self.bbox_head(x)
        losses = reppoints_loss(
            cls_s, init_o, refine_o, batch["gt_obbs"],
            batch["gt_labels"], batch["gt_mask"], c["num_classes"],
            version=c.get("angle_version", "le90"))
        if gate_loss is not None:
            losses["gate_loss"] = gate_loss
        return losses


class GlidingVertex(nn.Module):
    """Two-stage GV detector: horizontal RPN + GV head (cls/reg/fix/
    ratio losses, ``gv_ratio_roi_head.py``)."""

    cfg: Dict[str, Any]

    def setup(self):
        c = self.cfg
        self.backbone = _build_backbone(c["backbone"])
        n = c["neck"]
        self.neck = MultitaskFPN(
            in_channels=tuple(n["in_channels"]),
            out_channels=n["out_channels"], num_outs=n.get("num_outs", 5),
            extra_level=n.get("extra_level", 1), name="neck")
        self.rpn_head = RPNHead(name="rpn_head")
        self.roi_head = GVBBoxHead(num_classes=c["num_classes"],
                                   name="roi_head")

    def __call__(self, batch, train=True):
        c = self.cfg
        version = c.get("angle_version", "le90")
        feats, gate_loss = self.backbone(batch["img"], train=train)
        x = self.neck(list(feats), start_level=0,
                      add_extra_convs="on_output")
        losses = {}
        if gate_loss is not None:
            losses["gate_loss"] = gate_loss

        gt_hbbs = obb2xyxy(batch["gt_obbs"], version)
        gen = AnchorGenerator(strides=[4, 8, 16, 32, 64],
                              ratios=[0.5, 1.0, 2.0], scales=[8])
        coder = DeltaXYWHBBoxCoder()
        rpn_cls, rpn_reg = self.rpn_head(x)
        losses.update(hbb_rpn_loss(
            self.make_rng("sampling"), rpn_cls, rpn_reg, gt_hbbs,
            batch["gt_mask"], gen, coder, num_sample=64))
        proposals, _, p_valid = hbb_rpn_get_proposals(
            jax.lax.stop_gradient(rpn_cls), jax.lax.stop_gradient(rpn_reg),
            gen, coder, None, nms_pre=256, max_per_img=256)
        rngs = jax.random.split(self.make_rng("sampling"),
                                proposals.shape[0])
        sampled = jax.vmap(
            lambda r, p, pv, g, gl, gm: sample_hbb_rois(
                r, p, pv, g, gl, gm, num=128)
        )(rngs, proposals, p_valid, gt_hbbs, batch["gt_labels"],
          batch["gt_mask"])
        bsz, s = sampled["rois"].shape[:2]
        bidx = jnp.repeat(jnp.arange(bsz, dtype=jnp.float32), s)[:, None]
        rois5 = jnp.concatenate([bidx, sampled["rois"].reshape(-1, 4)],
                                axis=-1)
        rf = extract_hbb_roi_feats(x, rois5)
        cls_logits, reg, fix, ratio = self.roi_head(rf)

        pos = sampled["pos_mask"].reshape(-1)
        valid = (sampled["pos_mask"] | sampled["neg_mask"]).reshape(-1)
        gt_obb_per = jax.vmap(lambda g, i: g[i])(
            batch["gt_obbs"], sampled["gt_idx"]).reshape(-1, 5)
        gt_hbb_per = jax.vmap(lambda g, i: g[i])(
            gt_hbbs, sampled["gt_idx"]).reshape(-1, 4)
        labels = jnp.where(
            pos,
            jax.vmap(lambda l, i: l[i])(
                batch["gt_labels"], sampled["gt_idx"]).reshape(-1),
            c["num_classes"])
        nvalid = jnp.maximum(valid.sum(), 1)
        npos = jnp.maximum(pos.sum(), 1)
        losses["loss_cls"] = softmax_cross_entropy(
            cls_logits, labels, weight=valid.astype(jnp.float32),
            avg_factor=nvalid)
        reg_t = coder.encode(sampled["rois"].reshape(-1, 4), gt_hbb_per)
        losses["loss_bbox"] = smooth_l1_loss(
            reg, reg_t, beta=1.0,
            weight=pos[:, None].astype(jnp.float32), avg_factor=npos * 4)
        fix_t = GVFixCoder(version).encode(gt_obb_per)
        losses["loss_fix"] = smooth_l1_loss(
            fix, fix_t, beta=1.0 / 3.0,
            weight=pos[:, None].astype(jnp.float32), avg_factor=npos * 4)
        ratio_t = GVRatioCoder(version).encode(gt_obb_per)
        losses["loss_ratio"] = smooth_l1_loss(
            ratio, ratio_t, beta=1.0 / 3.0,
            weight=pos[:, None].astype(jnp.float32), avg_factor=npos) * 16
        return losses
