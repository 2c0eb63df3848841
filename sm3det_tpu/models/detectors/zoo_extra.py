"""Zoo completions: RotatedFasterRCNN + RepPoints-variant detectors +
RotatedATSS.

Parity targets:
- ``mmrotate/models/detectors/rotate_faster_rcnn.py:7`` +
  ``configs/rotated_faster_rcnn/rotated_faster_rcnn_r50_fpn_1x_dota_le90.py``:
  horizontal RPN (hbb anchors, DeltaXYWHBBoxCoder) -> horizontal RoIAlign
  on hbb proposals -> RotatedShared2FCBBoxHead regressing 5-param OBBs
  from the hbb prior (DeltaXYWHAHBBoxCoder: prior = hbb2obb(hbb)).
- ``mmrotate/models/detectors/rotated_reppoints.py`` (+ the
  sasm/g_reppoints configs): single-stage point-set detectors differing
  only in head loss recipe (see dense_heads/reppoints_variants.py).
- RotatedATSS: RotatedRetinaNet with the ATSS-OBB assigner
  (``configs/rotated_atss/rotated_atss_obb_r50_fpn_1x_dota_le90.py``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.anchor import AnchorGenerator, RotatedAnchorGenerator
from ...core.bbox.coders import DeltaXYWHAOBBoxCoder, DeltaXYWHBBoxCoder
from ...ops.box_convert import hbb2obb, obb2xyxy
from ..dense_heads.oriented_reppoints_head import OrientedRepPointsHead
from ..dense_heads.reppoints_variants import (RotatedRepPointsHead,
                                              SAMRepPointsHead,
                                              reppoints_variant_loss)
from ..dense_heads.rotated_atss_head import RotatedATSSHead, atss_loss
from ..dense_heads.rpn_head import (RPNHead, hbb_rpn_get_proposals,
                                    hbb_rpn_loss)
from ..losses import smooth_l1_loss, softmax_cross_entropy
from ..necks.fpn import MultitaskFPN
from ..roi_heads.cascade_heads import HBB2OBBBBoxHead, roi_trans_stage1
from ..roi_heads.standard_roi_head import sample_hbb_rois
from .single_stage_zoo import _SingleStageBase
from .zoo import _build_backbone


class RotatedFasterRCNN(nn.Module):
    """Horizontal RPN + hbb RoI pooling + OBB-regressing 2FC head."""

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
        # DeltaXYWHAHBBoxCoder contract == RoI-Trans stage-1 head: hbb
        # roi features -> (cls, 5-param obb deltas vs hbb2obb prior)
        self.bbox_head = HBB2OBBBBoxHead(
            num_classes=c["num_classes"], name="bbox_head")

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
        hbb_coder = DeltaXYWHBBoxCoder()
        rpn_cls, rpn_reg = self.rpn_head(x)
        losses.update(hbb_rpn_loss(
            self.make_rng("sampling"), rpn_cls, rpn_reg, gt_hbbs,
            batch["gt_mask"], gen, hbb_coder,
            num_sample=c.get("rpn_sample", 64)))
        proposals, _, p_valid = hbb_rpn_get_proposals(
            jax.lax.stop_gradient(rpn_cls), jax.lax.stop_gradient(rpn_reg),
            gen, hbb_coder, None, nms_pre=c.get("rpn_nms_pre", 256),
            max_per_img=c.get("rpn_max", 256))

        rngs = jax.random.split(self.make_rng("sampling"),
                                proposals.shape[0])
        sampled = jax.vmap(
            lambda r, p, pv, g, gl, gm: sample_hbb_rois(
                r, p, pv, g, gl, gm, num=c.get("rcnn_sample", 128))
        )(rngs, proposals, p_valid, gt_hbbs, batch["gt_labels"],
          batch["gt_mask"])
        bsz, s = sampled["rois"].shape[:2]
        bidx = jnp.repeat(jnp.arange(bsz, dtype=jnp.float32), s)[:, None]
        rois5 = jnp.concatenate([bidx, sampled["rois"].reshape(-1, 4)], -1)
        coder = DeltaXYWHAOBBoxCoder(
            angle_range=version, target_means=(0.,) * 5,
            target_stds=(0.1, 0.1, 0.2, 0.2, 0.1))
        cls_logits, obbs = roi_trans_stage1(
            x, rois5, self.bbox_head, coder, version)

        pos = sampled["pos_mask"].reshape(-1)
        valid = (sampled["pos_mask"] | sampled["neg_mask"]).reshape(-1)
        gts_per_roi = jax.vmap(lambda g, i: g[i])(
            batch["gt_obbs"], sampled["gt_idx"]).reshape(-1, 5)
        labels = jnp.where(
            pos,
            jax.vmap(lambda l, i: l[i])(
                batch["gt_labels"], sampled["gt_idx"]).reshape(-1),
            c["num_classes"])
        losses["loss_cls"] = softmax_cross_entropy(
            cls_logits, labels, weight=valid.astype(jnp.float32),
            avg_factor=jnp.maximum(valid.sum(), 1))
        priors = hbb2obb(rois5[:, 1:5], version)
        targets = coder.encode(priors, gts_per_roi)
        losses["loss_bbox"] = smooth_l1_loss(
            coder.encode(priors, obbs), targets, beta=1.0,
            weight=pos[:, None].astype(jnp.float32),
            avg_factor=jnp.maximum(pos.sum() * 5, 1))
        return losses


class _RepPointsVariantBase(_SingleStageBase):
    variant: str = "rotated"
    head_cls = RotatedRepPointsHead

    def _setup_head(self):
        self.bbox_head = self.head_cls(
            num_classes=self.cfg["num_classes"],
            feat_channels=self.cfg["neck"]["out_channels"],
            gn_groups=self.cfg.get("gn_groups", 32), name="bbox_head")

    def __call__(self, batch, train=True):
        c = self.cfg
        x, gate_loss = self.extract_feat(batch["img"], train=train)
        cls_s, init_o, refine_o = self.bbox_head(x)
        losses = reppoints_variant_loss(
            cls_s, init_o, refine_o, batch["gt_obbs"],
            batch["gt_labels"], batch["gt_mask"], c["num_classes"],
            version=c.get("angle_version", "le90"), variant=self.variant,
            spatial_border=c.get("spatial_border", False))
        if gate_loss is not None:
            losses["gate_loss"] = gate_loss
        return losses


class RotatedRepPoints(_RepPointsVariantBase):
    """``rotated_reppoints.py`` detector (ConvexGIoU recipe)."""

    variant: str = "rotated"


class SAMRepPoints(_RepPointsVariantBase):
    """SASM: SAS-assigned refine stage."""

    variant: str = "sam"
    head_cls = SAMRepPointsHead


class GRepPoints(_RepPointsVariantBase):
    """g_reppoints: Gaussian KLD point-set losses."""

    variant: str = "kld"


class RotatedATSS(_SingleStageBase):
    """RotatedRetinaNet with ATSS-OBB assignment."""

    def _setup_head(self):
        self.bbox_head = RotatedATSSHead(
            num_classes=self.cfg["num_classes"],
            feat_channels=self.cfg["neck"]["out_channels"],
            name="bbox_head")

    def __call__(self, batch, train=True):
        c = self.cfg
        x, gate_loss = self.extract_feat(batch["img"], train=train)
        cls_s, reg_s = self.bbox_head(x)
        gen = RotatedAnchorGenerator(
            strides=(8, 16, 32, 64, 128), ratios=[1.0],
            octave_base_scale=4, scales_per_octave=1)
        coder = DeltaXYWHAOBBoxCoder(
            angle_range=c.get("angle_version", "le90"))
        losses = atss_loss(cls_s, reg_s, batch["gt_obbs"],
                           batch["gt_labels"], batch["gt_mask"], gen,
                           coder, c["num_classes"],
                           topk=c.get("atss_topk", 9))
        if gate_loss is not None:
            losses["gate_loss"] = gate_loss
        return losses
