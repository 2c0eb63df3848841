"""TriSource head-combination variants (SURVEY.md §2.1):

- H1-R1 ``TriSourceOneOneDetector``
  (``trisource_H1stage_R1stage_detector.py:28``): SAR GFL + RGB/IR
  rotated RetinaNet.
- H2-R1 ``TriSourceTwoOneDetector`` (``trisource_H2stage_R1stage...:28``):
  SAR Faster R-CNN (HBB two-stage) + RGB/IR rotated RetinaNet.
- H2-R2 ``TriSourceTwoTwoDetector`` (``trisource_H2stage_R2stage...:27``):
  SAR Faster R-CNN + RGB/IR Oriented R-CNN.

One parameterized module covers all three (the flagship H1-R2 lives in
``trisource.py``); shared backbone+MultitaskFPN semantics are identical.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.anchor import AnchorGenerator
from ...core.bbox.coders import DeltaXYWHBBoxCoder
from ..dense_heads.gfl_head import GFLHead, gfl_loss
from ..dense_heads.oriented_rpn_head import (OrientedRPNHead,
                                             rpn_get_proposals, rpn_loss)
from ..dense_heads.rotated_retina_head import (RotatedRetinaHead,
                                               make_retina_anchor_generator,
                                               make_retina_coder,
                                               retina_loss)
from ..dense_heads.rpn_head import (RPNHead, hbb_rpn_get_proposals,
                                    hbb_rpn_loss)
from ..necks.fpn import MultitaskFPN
from ..roi_heads.oriented_roi_head import (RotatedShared2FCBBoxHead,
                                           bbox_head_loss,
                                           extract_rotated_roi_feats,
                                           sample_rois_for_training)
from ..roi_heads.standard_roi_head import (Shared2FCBBoxHead,
                                           extract_hbb_roi_feats,
                                           hbb_head_loss, sample_hbb_rois)
from .trisource import (build_multi_input_backbone, make_rcnn_coder,
                        make_rpn_anchor_generator, make_rpn_coder,
                        make_sar_anchor_generator)


class TriSourceVariant(nn.Module):
    """Configurable TriSource: sar_stages/rot_stages in {1, 2}."""

    cfg: Dict[str, Any]
    sar_stages: int = 1
    rot_stages: int = 1

    def setup(self):
        c = self.cfg
        self.backbone = build_multi_input_backbone(c["backbone"])
        n = c["neck"]
        self.neck = MultitaskFPN(
            in_channels=tuple(n["in_channels"]),
            out_channels=n["out_channels"], num_outs=n["num_outs"],
            extra_level=n.get("extra_level", 1), name="neck")
        if self.sar_stages == 1:
            self.sar_bbox_head = GFLHead(
                num_classes=c["num_classes"], name="sar_bbox_head")
        else:
            self.sar_rpn_head = RPNHead(name="sar_rpn_head")
            self.sar_roi_head = Shared2FCBBoxHead(
                num_classes=c["num_classes"], name="sar_roi_head")
        if self.rot_stages == 1:
            self.rgb_bbox_head = RotatedRetinaHead(
                num_classes=c["num_classes"], name="rgb_bbox_head")
            self.ifr_bbox_head = RotatedRetinaHead(
                num_classes=c["num_classes"], name="ifr_bbox_head")
        else:
            self.rgb_rpn_head = OrientedRPNHead(name="rgb_rpn_head")
            self.ifr_rpn_head = OrientedRPNHead(name="ifr_rpn_head")
            self.rgb_roi_head = RotatedShared2FCBBoxHead(
                num_classes=c["num_classes"], name="rgb_roi_head")
            self.ifr_roi_head = RotatedShared2FCBBoxHead(
                num_classes=c["num_classes"], name="ifr_roi_head")

    def __call__(self, batch, source_ratio=(2, 1, 1), train=True):
        c = self.cfg
        version = c["angle_version"]
        imgs = jnp.concatenate(
            [batch["sar"]["img"], batch["rgb"]["img"], batch["ifr"]["img"]],
            axis=0)
        dataset_ids = jnp.asarray(
            [0] * source_ratio[0] + [1] * source_ratio[1]
            + [2] * source_ratio[2], jnp.int32)
        feats, gate_loss = self.backbone(imgs, train=train,
                                         dataset_ids=dataset_ids)
        n_sar, n_rgb, n_ifr = source_ratio
        sar_f = [f[:n_sar] for f in feats]
        rgb_f = [f[n_sar:n_sar + n_rgb] for f in feats]
        ifr_f = [f[n_sar + n_rgb:] for f in feats]

        losses: Dict[str, jnp.ndarray] = {}
        if gate_loss is not None:
            losses["gate_loss"] = gate_loss

        # SAR branch
        if self.sar_stages == 1:
            sar_x = self.neck(sar_f, start_level=1,
                              add_extra_convs="on_output")
            cls_scores, bbox_preds = self.sar_bbox_head(sar_x)
            gen = make_sar_anchor_generator()
            sl = gfl_loss(cls_scores, bbox_preds,
                          batch["sar"]["gt_bboxes"],
                          batch["sar"]["gt_labels"],
                          batch["sar"]["gt_mask"], gen, c["num_classes"])
            losses.update({f"sar_{k}": v for k, v in sl.items()})
        else:
            sar_x = self.neck(sar_f, start_level=0,
                              add_extra_convs="on_output")
            rpn_cls, rpn_reg = self.sar_rpn_head(sar_x)
            gen = AnchorGenerator(strides=[4, 8, 16, 32, 64],
                                  ratios=[0.5, 1.0, 2.0], scales=[8])
            coder = DeltaXYWHBBoxCoder()
            sl = hbb_rpn_loss(self.make_rng("sampling"), rpn_cls, rpn_reg,
                              batch["sar"]["gt_bboxes"],
                              batch["sar"]["gt_mask"], gen, coder)
            losses.update({f"sar_{k}": v for k, v in sl.items()})
            proposals, _, p_valid = hbb_rpn_get_proposals(
                jax.lax.stop_gradient(rpn_cls),
                jax.lax.stop_gradient(rpn_reg), gen, coder, None,
                nms_pre=1000, max_per_img=1000)
            rngs = jax.random.split(self.make_rng("sampling"),
                                    proposals.shape[0])
            sampled = jax.vmap(
                lambda r, p, pv, g, gl, gm: sample_hbb_rois(
                    r, p, pv, g, gl, gm, num=256)
            )(rngs, proposals, p_valid, batch["sar"]["gt_bboxes"],
              batch["sar"]["gt_labels"], batch["sar"]["gt_mask"])
            bsz, s = sampled["rois"].shape[:2]
            bidx = jnp.repeat(jnp.arange(bsz, dtype=jnp.float32),
                              s)[:, None]
            rois5 = jnp.concatenate(
                [bidx, sampled["rois"].reshape(-1, 4)], axis=-1)
            rf = extract_hbb_roi_feats(sar_x, rois5)
            cl, rp = self.sar_roi_head(rf)
            cl = cl.reshape(bsz, s, -1)
            rp = rp.reshape(bsz, s, -1)
            l_cls, l_reg, n_valid, _ = jax.vmap(
                lambda a, b_, sm, g, gl: hbb_head_loss(
                    a, b_, sm, g, gl, coder, c["num_classes"])
            )(cl, rp, sampled, batch["sar"]["gt_bboxes"],
              batch["sar"]["gt_labels"])
            total = jnp.maximum(jnp.sum(n_valid).astype(jnp.float32), 1.0)
            losses["sar_loss_cls"] = jnp.sum(l_cls) / total
            losses["sar_loss_bbox"] = jnp.sum(l_reg) / total

        # RGB / IFR branches
        for key, feats_m in (("rgb", rgb_f), ("ifr", ifr_f)):
            data = batch[key]
            if self.rot_stages == 1:
                x = self.neck(feats_m, start_level=1,
                              add_extra_convs="on_output")
                head = self.rgb_bbox_head if key == "rgb" \
                    else self.ifr_bbox_head
                cls_scores, bbox_preds = head(x)
                gen = make_retina_anchor_generator()
                # R1-stage retina: stds 1.0 + L1, per
                # rotated_retinanet_obb_r50_fpn_1x_dota_le90.py:40-54
                # (the reference SM3Det retina-combo config's retina
                # branch is *horizontal* mmdet RetinaHead on SAR only;
                # this rotated RGB/IFR R1 branch has no exact reference
                # counterpart, so it follows the standard rotated-retina
                # recipe)
                coder = make_retina_coder(version)
                rl = retina_loss(cls_scores, bbox_preds, data["gt_obbs"],
                                 data["gt_labels"], data["gt_mask"],
                                 gen, coder, c["num_classes"],
                                 reg_loss="l1")
                losses.update({f"{key}_{k}": v for k, v in rl.items()})
            else:
                x = self.neck(feats_m, start_level=0,
                              add_extra_convs="on_output")
                rpn_head = self.rgb_rpn_head if key == "rgb" \
                    else self.ifr_rpn_head
                roi_head = self.rgb_roi_head if key == "rgb" \
                    else self.ifr_roi_head
                rpn_cls, rpn_reg = rpn_head(x)
                gen = make_rpn_anchor_generator()
                rpn_coder = make_rpn_coder(version)
                rl = rpn_loss(self.make_rng("sampling"), rpn_cls, rpn_reg,
                              data["gt_obbs"], data["gt_mask"], gen,
                              rpn_coder, version=version)
                losses.update({f"{key}_{k}": v for k, v in rl.items()})
                proposals, _, p_valid = rpn_get_proposals(
                    jax.lax.stop_gradient(rpn_cls),
                    jax.lax.stop_gradient(rpn_reg), gen, rpn_coder, None,
                    nms_pre=c["rgb"]["rpn_nms_pre"],
                    max_per_img=c["rgb"]["rpn_max"],
                    iou_thr=c["rgb"]["rpn_nms_iou"])
                rngs = jax.random.split(self.make_rng("sampling"),
                                        proposals.shape[0])
                sampled = jax.vmap(
                    lambda r, p, pv, g, gl, gm: sample_rois_for_training(
                        r, p, pv, g, gl, gm,
                        num=c["rgb"]["rcnn_sample"])
                )(rngs, proposals, p_valid, data["gt_obbs"],
                  data["gt_labels"], data["gt_mask"])
                bsz, s = sampled["rois"].shape[:2]
                bidx = jnp.repeat(jnp.arange(bsz, dtype=jnp.float32),
                                  s)[:, None]
                rois6 = jnp.concatenate(
                    [bidx, sampled["rois"].reshape(-1, 5)], axis=-1)
                rf = extract_rotated_roi_feats(x, rois6)
                cl, rp = roi_head(rf)
                cl = cl.reshape(bsz, s, -1)
                rp = rp.reshape(bsz, s, -1)
                rcnn_coder = make_rcnn_coder(version)
                l_cls, l_reg, n_valid, _ = jax.vmap(
                    lambda a, b_, sm, g, gl: bbox_head_loss(
                        a, b_, sm, g, gl, rcnn_coder, c["num_classes"])
                )(cl, rp, sampled, data["gt_obbs"], data["gt_labels"])
                total = jnp.maximum(
                    jnp.sum(n_valid).astype(jnp.float32), 1.0)
                losses[f"{key}_loss_cls"] = jnp.sum(l_cls) / total
                losses[f"{key}_loss_bbox"] = jnp.sum(l_reg) / total
        return losses


def TriSourceOneOneDetector(cfg):
    return TriSourceVariant(cfg=cfg, sar_stages=1, rot_stages=1)


def TriSourceTwoOneDetector(cfg):
    return TriSourceVariant(cfg=cfg, sar_stages=2, rot_stages=1)


def TriSourceTwoTwoDetector(cfg):
    return TriSourceVariant(cfg=cfg, sar_stages=2, rot_stages=2)
