"""ReDet and RoI Transformer detectors.

- ``ReDet`` (``mmrotate/models/detectors/redet.py``): equivariant
  ReResNet backbone -> FPN -> Oriented RPN -> RiRoI-aligned rotated head
  (orientation channels aligned to each RoI's angle via
  ``riroi_align_rotated``).
- ``RoITransformer`` (``roi_trans.py`` / ``RoITransRoIHead``): horizontal
  RPN -> stage-1 HBB-pooled head regressing OBBs -> stage-2 rotated-pooled
  head refining them (cascade HBB->OBB).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.anchor import AnchorGenerator
from ...core.bbox.coders import DeltaXYWHAOBBoxCoder, DeltaXYWHBBoxCoder
from ...ops.box_convert import hbb2obb
from ...ops.orientation import orientation_align
from ..backbones.re_resnet import ReFPN, ReResNet
from ..dense_heads.oriented_rpn_head import (OrientedRPNHead,
                                             rpn_get_proposals, rpn_loss)
from ..dense_heads.rpn_head import (RPNHead, hbb_rpn_get_proposals,
                                    hbb_rpn_loss)
from ..necks.fpn import MultitaskFPN
from ..roi_heads.cascade_heads import HBB2OBBBBoxHead, roi_trans_stage1
from ..roi_heads.oriented_roi_head import (RotatedShared2FCBBoxHead,
                                           bbox_head_loss,
                                           extract_rotated_roi_feats,
                                           sample_rois_for_training)
from ..roi_heads.standard_roi_head import sample_hbb_rois
from .trisource import (make_rcnn_coder, make_rpn_anchor_generator,
                        make_rpn_coder)


class ReDet(nn.Module):
    """ReResNet + equivariant ReFPN + Oriented RPN + RiRoI-aligned
    rotated head (``mmrotate/models/detectors/redet.py``): the neck
    keeps the C8 orientation channels end-to-end and
    ``orientation_align`` cyclically aligns each RoI's pooled features
    to its own angle (RiRoIAlign contract) before the bbox head."""

    cfg: Dict[str, Any]

    def setup(self):
        c = self.cfg
        b = c.get("backbone", {})
        self.backbone = ReResNet(
            stem_channels=b.get("stem_channels", 8),
            stage_channels=tuple(b.get("stage_channels", (8, 16, 32, 64))),
            stage_blocks=tuple(b.get("stage_blocks", (2, 2, 2, 2))),
            name="backbone")
        n = c["neck"]
        self.neck = ReFPN(out_channels=n["out_channels"],
                          num_outs=n.get("num_outs", 5), name="neck")
        self.rpn_head = OrientedRPNHead(name="rpn_head")
        self.roi_head = RotatedShared2FCBBoxHead(
            num_classes=c["num_classes"], name="roi_head")

    def __call__(self, batch, train=True):
        c = self.cfg
        version = c.get("angle_version", "le90")
        feats, _ = self.backbone(batch["img"], train=train)
        x = self.neck(list(feats))
        rpn_cls, rpn_reg = self.rpn_head(x)
        gen = make_rpn_anchor_generator()
        rpn_coder = make_rpn_coder(version)
        losses = rpn_loss(
            self.make_rng("sampling"), rpn_cls, rpn_reg,
            batch["gt_obbs"], batch["gt_mask"], gen, rpn_coder,
            version=version, num_sample=64)
        proposals, _, p_valid = rpn_get_proposals(
            jax.lax.stop_gradient(rpn_cls), jax.lax.stop_gradient(rpn_reg),
            gen, rpn_coder, None, nms_pre=256, max_per_img=256)
        rngs = jax.random.split(self.make_rng("sampling"),
                                proposals.shape[0])
        sampled = jax.vmap(
            lambda r, p, pv, g, gl, gm: sample_rois_for_training(
                r, p, pv, g, gl, gm, num=128)
        )(rngs, proposals, p_valid, batch["gt_obbs"],
          batch["gt_labels"], batch["gt_mask"])
        bsz, s = sampled["rois"].shape[:2]
        bidx = jnp.repeat(jnp.arange(bsz, dtype=jnp.float32), s)[:, None]
        rois6 = jnp.concatenate(
            [bidx, sampled["rois"].reshape(-1, 5)], axis=-1)
        rf = extract_rotated_roi_feats(x, rois6)
        # RiRoIAlign: align the C8 orientation channels to each RoI angle
        rf = orientation_align(rf, rois6[:, 5])
        cl, rp = self.roi_head(rf)
        cl = cl.reshape(bsz, s, -1)
        rp = rp.reshape(bsz, s, -1)
        coder = make_rcnn_coder(version)
        l_cls, l_reg, n_valid, _ = jax.vmap(
            lambda a, b_, sm, g, gl: bbox_head_loss(
                a, b_, sm, g, gl, coder, c["num_classes"])
        )(cl, rp, sampled, batch["gt_obbs"], batch["gt_labels"])
        total = jnp.maximum(jnp.sum(n_valid).astype(jnp.float32), 1.0)
        losses["loss_cls"] = jnp.sum(l_cls) / total
        losses["loss_bbox"] = jnp.sum(l_reg) / total
        return losses


class RoITransformer(nn.Module):
    """Cascade HBB->OBB detector."""

    cfg: Dict[str, Any]

    def setup(self):
        c = self.cfg
        from .zoo import _build_backbone
        self.backbone = _build_backbone(c["backbone"])
        n = c["neck"]
        self.neck = MultitaskFPN(
            in_channels=tuple(n["in_channels"]),
            out_channels=n["out_channels"], num_outs=n.get("num_outs", 5),
            extra_level=n.get("extra_level", 1), name="neck")
        self.rpn_head = RPNHead(name="rpn_head")
        self.stage1_head = HBB2OBBBBoxHead(
            num_classes=c["num_classes"], name="stage1_head")
        self.stage2_head = RotatedShared2FCBBoxHead(
            num_classes=c["num_classes"], name="stage2_head")

    def __call__(self, batch, train=True):
        c = self.cfg
        version = c.get("angle_version", "le90")
        feats, gate_loss = self.backbone(batch["img"], train=train)
        x = self.neck(list(feats), start_level=0,
                      add_extra_convs="on_output")
        losses = {}
        if gate_loss is not None:
            losses["gate_loss"] = gate_loss

        # horizontal RPN on the gts' enclosing hbbs
        from ...ops.box_convert import obb2xyxy
        gt_hbbs = obb2xyxy(batch["gt_obbs"], version)
        gen = AnchorGenerator(strides=[4, 8, 16, 32, 64],
                              ratios=[0.5, 1.0, 2.0], scales=[8])
        hbb_coder = DeltaXYWHBBoxCoder()
        losses.update(hbb_rpn_loss(
            self.make_rng("sampling"),
            *self.rpn_head(x), gt_hbbs, batch["gt_mask"], gen, hbb_coder,
            num_sample=64))
        rpn_cls, rpn_reg = self.rpn_head(x)
        proposals, _, p_valid = hbb_rpn_get_proposals(
            jax.lax.stop_gradient(rpn_cls), jax.lax.stop_gradient(rpn_reg),
            gen, hbb_coder, None, nms_pre=256, max_per_img=256)

        # stage 1: pool HBB rois, regress OBBs
        rngs = jax.random.split(self.make_rng("sampling"),
                                proposals.shape[0])
        s1 = jax.vmap(
            lambda r, p, pv, g, gl, gm: sample_hbb_rois(
                r, p, pv, g, gl, gm, num=128)
        )(rngs, proposals, p_valid, gt_hbbs, batch["gt_labels"],
          batch["gt_mask"])
        bsz, s = s1["rois"].shape[:2]
        bidx = jnp.repeat(jnp.arange(bsz, dtype=jnp.float32), s)[:, None]
        rois5 = jnp.concatenate([bidx, s1["rois"].reshape(-1, 4)], -1)
        s1_coder = DeltaXYWHAOBBoxCoder(
            angle_range=version, target_means=(0.,) * 5,
            target_stds=(0.1, 0.1, 0.2, 0.2, 0.1))
        cls1, obbs1 = roi_trans_stage1(
            x, rois5, self.stage1_head, s1_coder, version)
        # stage-1 loss: CE + smooth l1 toward gt obbs (on positives)
        from ..losses import smooth_l1_loss, softmax_cross_entropy
        pos = s1["pos_mask"].reshape(-1)
        valid = (s1["pos_mask"] | s1["neg_mask"]).reshape(-1)
        gts_per_roi = jax.vmap(lambda g, i: g[i])(
            batch["gt_obbs"], s1["gt_idx"]).reshape(-1, 5)
        labels1 = jnp.where(pos,
                            jax.vmap(lambda l, i: l[i])(
                                batch["gt_labels"],
                                s1["gt_idx"]).reshape(-1),
                            c["num_classes"])
        losses["s1_loss_cls"] = softmax_cross_entropy(
            cls1, labels1, weight=valid.astype(jnp.float32),
            avg_factor=jnp.maximum(valid.sum(), 1))
        priors1 = hbb2obb(rois5[:, 1:5], version)
        t1 = s1_coder.encode(priors1, gts_per_roi)
        # reg pred implicit in decode; recompute deltas loss directly
        losses["s1_loss_bbox"] = smooth_l1_loss(
            s1_coder.encode(priors1, obbs1), t1, beta=1.0,
            weight=pos[:, None].astype(jnp.float32),
            avg_factor=jnp.maximum(pos.sum() * 5, 1))

        # stage 2: rotated pooling on stage-1 boxes
        obbs1 = jax.lax.stop_gradient(obbs1).reshape(bsz, s, 5)
        rngs2 = jax.random.split(self.make_rng("sampling"), bsz)
        s2 = jax.vmap(
            lambda r, p, g, gl, gm: sample_rois_for_training(
                r, p, jnp.ones(p.shape[0], bool), g, gl, gm, num=128)
        )(rngs2, obbs1, batch["gt_obbs"], batch["gt_labels"],
          batch["gt_mask"])
        rois6 = jnp.concatenate(
            [bidx, s2["rois"].reshape(-1, 5)], axis=-1)
        rf2 = extract_rotated_roi_feats(x, rois6)
        cl2, rp2 = self.stage2_head(rf2)
        cl2 = cl2.reshape(bsz, -1, cl2.shape[-1])
        rp2 = rp2.reshape(bsz, -1, rp2.shape[-1])
        coder2 = make_rcnn_coder(version)
        l_cls, l_reg, n_valid, _ = jax.vmap(
            lambda a, b_, sm, g, gl: bbox_head_loss(
                a, b_, sm, g, gl, coder2, c["num_classes"])
        )(cl2, rp2, s2, batch["gt_obbs"], batch["gt_labels"])
        total = jnp.maximum(jnp.sum(n_valid).astype(jnp.float32), 1.0)
        losses["s2_loss_cls"] = jnp.sum(l_cls) / total
        losses["s2_loss_bbox"] = jnp.sum(l_reg) / total
        return losses
