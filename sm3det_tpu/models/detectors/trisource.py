"""TriSource detector (H1-R2): one backbone+neck, three task heads.

Parity target:
``mmrotate/models/detectors/trisource_H1stage_R2stage_detector.py:27-435``.
One shared (MoE) backbone consumes the concatenated SAR+RGB+IR batch; the
MultitaskFPN serves the GFL branch with ``start_level=1,
add_extra_convs='on_output'`` and the two Oriented R-CNN branches with the
full pyramid (``:154-169``); losses are prefixed ``sar_/rgb_/ifr_`` and the
MoE ``gate_loss`` is added (``:277``). Test-time routing picks one modality
per call (``simple_test`` ``:371``).

TPU re-design: the per-iteration batch composition is STATIC
(``source_ratio`` e.g. [2,1,1]) so the whole heterogeneous train step
compiles to one XLA program — no host control flow, no ragged splits.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.anchor import AnchorGenerator
from ...core.bbox.coders import DeltaXYWHAOBBoxCoder, MidpointOffsetCoder
from ..backbones.convnext import ConvNeXtMoE
from ..dense_heads.gfl_head import GFLHead, gfl_get_bboxes, gfl_loss
from ..dense_heads.oriented_rpn_head import (OrientedRPNHead,
                                             rpn_get_proposals, rpn_loss)
from ..necks.fpn import MultitaskFPN
from ..roi_heads.oriented_roi_head import (RotatedShared2FCBBoxHead,
                                           bbox_head_loss,
                                           extract_rotated_roi_feats,
                                           roi_head_get_bboxes,
                                           sample_rois_for_training)

DEFAULT_MODEL_CFG: Dict[str, Any] = dict(
    num_classes=26,
    angle_version="le90",
    backbone=dict(
        arch="tiny",
        drop_path_rate=0.1,
        moe_block_inds=((), (), (0, 2, 4, 6, 8), (0, 2)),
        num_experts=8,
        top_k=3,
        gate="cosine",
        capacity_factor=1.5,
    ),
    neck=dict(in_channels=(96, 192, 384, 768), out_channels=256,
              num_outs=5, extra_level=1, add_extra_convs="on_output"),
    sar=dict(strides=(8, 16, 32, 64, 128), reg_max=16,
             nms_pre=1000, score_thr=0.05, nms_iou=0.6, max_per_img=100),
    rgb=dict(rpn_strides=(4, 8, 16, 32, 64),
             rpn_sample=256, rcnn_sample=512,
             rpn_nms_pre=2000, rpn_max=2000, rpn_nms_iou=0.8,
             rcnn_score_thr=0.05, rcnn_nms_iou=0.1, rcnn_max=2000),
)


def make_sar_anchor_generator(strides=(8, 16, 32, 64, 128)):
    """GFL: single anchor per cell, octave base 8 (config :35-40)."""
    return AnchorGenerator(strides=strides, ratios=[1.0],
                           octave_base_scale=8, scales_per_octave=1)


def make_rpn_anchor_generator(strides=(4, 8, 16, 32, 64)):
    """Oriented RPN: scales [8] x ratios [.5, 1, 2] (config :52-57)."""
    return AnchorGenerator(strides=strides, ratios=[0.5, 1.0, 2.0],
                           scales=[8])


def make_rpn_coder(version="le90"):
    return MidpointOffsetCoder(
        angle_range=version,
        target_means=(0.,) * 6,
        target_stds=(1., 1., 1., 1., 0.5, 0.5))


def make_rcnn_coder(version="le90"):
    return DeltaXYWHAOBBoxCoder(
        angle_range=version,
        target_means=(0.,) * 5,
        target_stds=(0.1, 0.1, 0.2, 0.2, 0.1),
        edge_swap=True, proj_xy=True)


def build_multi_input_backbone(b: Dict[str, Any], name: str = "backbone"):
    """Backbone factory shared by all TriSource variants: ConvNeXt-MoE,
    LSKNet-MoE or VAN-MoE in MultiInput mode."""
    btype = b.get("type", "ConvNeXt")
    common = dict(
        drop_path_rate=b.get("drop_path_rate", 0.0),
        num_experts=b.get("num_experts", 2),
        top_k=b.get("top_k", 2),
        gate=b.get("gate", "cosine"),
        noisy_gating=b.get("noisy_gating", True),
        capacity_factor=b.get("capacity_factor", 1.5),
        multi_input=True,
        name=name)
    if btype in ("ConvNeXt", "ConvNeXt_moe_MultiInput",
                 "ConvNeXt_DA_MultiInput"):
        return ConvNeXtMoE(
            arch=b.get("arch", "tiny"),
            moe_block_inds=tuple(tuple(i) for i in
                                 b.get("moe_block_inds",
                                       ((), (), (), ()))),
            use_da=b.get("use_da", False),
            da_block_inds=tuple(tuple(i) for i in
                                b.get("da_block_inds",
                                      ((), (), (), ()))),
            **common)
    if btype in ("LSKNet", "LSKNet_moe_MultiInput"):
        from ..backbones.lsknet import LSKNetMoE
        return LSKNetMoE(
            embed_dims=tuple(b.get("embed_dims", (32, 64, 160, 256))),
            depths=tuple(b.get("depths", (3, 3, 5, 2))),
            moe_block_inds_fc1=tuple(
                tuple(i) for i in b.get("moe_block_inds_fc1",
                                        ((), (), (), ()))),
            moe_block_inds_fc2=tuple(
                tuple(i) for i in b.get("moe_block_inds_fc2",
                                        ((), (), (), ()))),
            **common)
    if btype in ("VAN", "VAN_moe_MultiInput"):
        from ..backbones.van import VANMoE
        return VANMoE(
            embed_dims=tuple(b.get("embed_dims", (32, 64, 160, 256))),
            depths=tuple(b.get("depths", (3, 3, 5, 2))),
            moe_block_inds_fc1=tuple(
                tuple(i) for i in b.get("moe_block_inds_fc1",
                                        ((), (), (), ()))),
            moe_block_inds_fc2=tuple(
                tuple(i) for i in b.get("moe_block_inds_fc2",
                                        ((), (), (), ()))),
            **common)
    if btype in ("SwinTransformer_moe", "Swin"):
        from ..backbones.swin import SwinMoE
        return SwinMoE(
            arch=b.get("arch", "tiny"),
            window_size=b.get("window_size", 7),
            moe_block_inds=tuple(
                tuple(i) for i in b.get("moe_block_inds",
                                        ((), (), (), ()))),
            **common)
    if btype == "InternViTAdapter":
        # BabelRS backbone (BabelRS_configs/BabelRS_20kstep.py:13)
        from ..backbones.intern_vit import InternViTAdapter
        return InternViTAdapter(
            embed_dim=b.get("embed_dim", 1024),
            depth=b.get("depth", 24),
            num_heads=b.get("num_heads", 16),
            patch_size=b.get("patch_size", 16),
            interaction_indexes=tuple(
                b.get("interaction_indexes", (5, 11, 17, 23))),
            adapter_dim=b.get("adapter_dim", 256),
            multi_input=True, name=name)
    raise ValueError(f"unknown backbone type {btype!r}")


REWEIGHT_LOSS_KEYS = (
    "sar_loss_cls", "sar_loss_bbox", "sar_loss_dfl",
    "rgb_loss_rpn_cls", "rgb_loss_rpn_bbox", "rgb_loss_cls",
    "rgb_loss_bbox", "ifr_loss_rpn_cls", "ifr_loss_rpn_bbox",
    "ifr_loss_cls", "ifr_loss_bbox")


class TriSourceDetector(nn.Module):
    """Flagship SM3Det model. ``cfg`` follows DEFAULT_MODEL_CFG.

    ``cfg['multi_tasks_reweight']`` in {None, 'uncertainty'}: the
    uncertainty variant learns per-loss sigmas and returns
    ``reweighted_total_losses`` = sum(0.5/sigma_i^2 * L_i + log(1+sigma^2))
    (``trisource_...:349-353``); individual losses are still reported
    (stop-gradient) for logging/DLA.
    """

    cfg: Dict[str, Any]

    def setup(self):
        c = self.cfg
        self.backbone = build_multi_input_backbone(c["backbone"])
        n = c["neck"]
        self.neck = MultitaskFPN(
            in_channels=tuple(n["in_channels"]),
            out_channels=n["out_channels"],
            num_outs=n["num_outs"],
            extra_level=n.get("extra_level", 1),
            add_extra_convs=False,   # default call mode: maxpool-free...
            name="neck")
        self.sar_bbox_head = GFLHead(
            num_classes=c["num_classes"],
            strides=tuple(c["sar"]["strides"]),
            reg_max=c["sar"]["reg_max"],
            name="sar_bbox_head")
        self.rgb_rpn_head = OrientedRPNHead(name="rgb_rpn_head")
        self.ifr_rpn_head = OrientedRPNHead(name="ifr_rpn_head")
        self.rgb_roi_head = RotatedShared2FCBBoxHead(
            num_classes=c["num_classes"], name="rgb_roi_head")
        self.ifr_roi_head = RotatedShared2FCBBoxHead(
            num_classes=c["num_classes"], name="ifr_roi_head")
        if c.get("multi_tasks_reweight") == "uncertainty":
            # learned per-loss sigmas (reference trisource_...:349-353);
            # declared here — linen forbids self.param in a non-compact
            # __call__
            self.mtl_sigma = self.param(
                "mtl_sigma", nn.initializers.ones,
                (len(REWEIGHT_LOSS_KEYS),))

    # ---- feature extraction -------------------------------------------

    def _cast_in(self, imgs):
        """Apply the compute-dtype policy (``cfg['compute_dtype']``,
        default fp32). With 'bfloat16' the conv/matmul path runs on the
        MXU in half precision (params must be cast by the caller, e.g.
        ``train.extras.bf16_policy``); norm stats stay fp32 (flax) and
        all decode/NMS post-processing is cast back to fp32."""
        dt = self.cfg.get("compute_dtype")
        return imgs.astype(dt) if dt else imgs

    def _neck_sar(self, feats):
        return self.neck(feats, start_level=1, add_extra_convs="on_output")

    def _neck_rcnn(self, feats):
        # reference init: add_extra_convs='on_output' (config :25-27)
        return self.neck(feats, start_level=0, add_extra_convs="on_output")

    def extract_feat_train(self, batch, source_ratio):
        """Backbone on the concatenated batch, neck per modality."""
        imgs = jnp.concatenate(
            [batch["sar"]["img"], batch["rgb"]["img"], batch["ifr"]["img"]],
            axis=0)
        # per-sample dataset ids (static composition) for DA backbones
        dataset_ids = jnp.asarray(
            [0] * source_ratio[0] + [1] * source_ratio[1]
            + [2] * source_ratio[2], jnp.int32)
        feats, gate_loss = self.backbone(self._cast_in(imgs), train=True,
                                         dataset_ids=dataset_ids)
        n_sar, n_rgb, n_ifr = source_ratio
        sar_f = [f[:n_sar] for f in feats]
        rgb_f = [f[n_sar:n_sar + n_rgb] for f in feats]
        ifr_f = [f[n_sar + n_rgb:] for f in feats]
        return (self._neck_sar(sar_f), self._neck_rcnn(rgb_f),
                self._neck_rcnn(ifr_f)), gate_loss

    # ---- training -----------------------------------------------------

    def __call__(self, batch, source_ratio=(2, 1, 1), train=True):
        """Training forward: returns the loss dict (unweighted sums are
        already normalized per-branch like the reference)."""
        c = self.cfg
        version = c["angle_version"]
        (sar_x, rgb_x, ifr_x), gate_loss = self.extract_feat_train(
            batch, source_ratio)
        losses: Dict[str, jnp.ndarray] = {}
        if gate_loss is not None:
            losses["gate_loss"] = gate_loss

        # SAR: GFL (loss math always fp32 — bf16 policy ends at the heads)
        cls_scores, bbox_preds = self.sar_bbox_head(sar_x)
        cls_scores = [s.astype(jnp.float32) for s in cls_scores]
        bbox_preds = [p.astype(jnp.float32) for p in bbox_preds]
        sar_gen = make_sar_anchor_generator(tuple(c["sar"]["strides"]))
        sar_losses = gfl_loss(
            cls_scores, bbox_preds,
            batch["sar"]["gt_bboxes"], batch["sar"]["gt_labels"],
            batch["sar"]["gt_mask"], sar_gen, c["num_classes"],
            reg_max=c["sar"]["reg_max"], strides=tuple(c["sar"]["strides"]))
        losses.update({f"sar_{k}": v for k, v in sar_losses.items()})

        # RGB / IFR: Oriented R-CNN
        rpn_gen = make_rpn_anchor_generator(tuple(c["rgb"]["rpn_strides"]))
        rpn_coder = make_rpn_coder(version)
        rcnn_coder = make_rcnn_coder(version)
        for key, feats_m, rpn_head, roi_head in (
                ("rgb", rgb_x, self.rgb_rpn_head, self.rgb_roi_head),
                ("ifr", ifr_x, self.ifr_rpn_head, self.ifr_roi_head)):
            data = batch[key]
            rpn_cls, rpn_reg = rpn_head(feats_m)
            rpn_cls = [s.astype(jnp.float32) for s in rpn_cls]
            rpn_reg = [p.astype(jnp.float32) for p in rpn_reg]
            r_losses = rpn_loss(
                self.make_rng("sampling"), rpn_cls, rpn_reg,
                data["gt_obbs"], data["gt_mask"], rpn_gen, rpn_coder,
                version=version, num_sample=c["rgb"]["rpn_sample"])
            losses.update({f"{key}_{k}": v for k, v in r_losses.items()})

            proposals, p_scores, p_valid = rpn_get_proposals(
                jax.lax.stop_gradient(rpn_cls),
                jax.lax.stop_gradient(rpn_reg),
                rpn_gen, rpn_coder, img_shape=None,
                nms_pre=c["rgb"]["rpn_nms_pre"],
                max_per_img=c["rgb"]["rpn_max"],
                iou_thr=c["rgb"]["rpn_nms_iou"])

            rngs = jax.random.split(
                self.make_rng("sampling"), proposals.shape[0])
            sampled = jax.vmap(
                lambda r, p, pv, g, gl, gm: sample_rois_for_training(
                    r, p, pv, g, gl, gm, num=c["rgb"]["rcnn_sample"])
            )(rngs, proposals, p_valid, data["gt_obbs"],
              data["gt_labels"], data["gt_mask"])

            # build (N, 6) rois with batch indices and pool
            bsz, s = sampled["rois"].shape[:2]
            batch_idx = jnp.repeat(
                jnp.arange(bsz, dtype=jnp.float32), s)[:, None]
            rois6 = jnp.concatenate(
                [batch_idx, sampled["rois"].reshape(-1, 5)], axis=-1)
            roi_feats = extract_rotated_roi_feats(feats_m, rois6)
            cls_logits, reg_pred = roi_head(roi_feats)
            cls_logits = cls_logits.reshape(bsz, s, -1).astype(jnp.float32)
            reg_pred = reg_pred.reshape(bsz, s, -1).astype(jnp.float32)

            l_cls, l_reg, n_valid, n_pos = jax.vmap(
                lambda cl, rp, sm, g, gl: bbox_head_loss(
                    cl, rp, sm, g, gl, rcnn_coder, c["num_classes"])
            )(cls_logits, reg_pred, sampled, data["gt_obbs"],
              data["gt_labels"])
            total = jnp.maximum(jnp.sum(n_valid).astype(jnp.float32), 1.0)
            losses[f"{key}_loss_cls"] = jnp.sum(l_cls) / total
            losses[f"{key}_loss_bbox"] = jnp.sum(l_reg) / total

        if c.get("multi_tasks_reweight") == "uncertainty":
            sigma = self.mtl_sigma
            total = jnp.zeros(())
            for i, k in enumerate(REWEIGHT_LOSS_KEYS):
                li = losses.pop(k)
                total = total + 0.5 / (sigma[i] ** 2) * li + \
                    jnp.log1p(sigma[i] ** 2)
                losses[k] = jax.lax.stop_gradient(li)   # logging only
            losses["reweighted_total_losses"] = total
        return losses

    # ---- testing ------------------------------------------------------

    def simple_test_sar(self, imgs, img_shape=(800, 800)):
        c = self.cfg
        ids = jnp.zeros((imgs.shape[0],), jnp.int32)
        feats, _ = self.backbone(self._cast_in(imgs), train=False,
                                  dataset_ids=ids)
        sar_x = self._neck_sar(list(feats))
        cls_scores, bbox_preds = self.sar_bbox_head(sar_x)
        # post-processing (decode/top-k/NMS) always runs fp32: with a bf16
        # compute policy only the conv/matmul path stays half precision
        cls_scores = [s.astype(jnp.float32) for s in cls_scores]
        bbox_preds = [p.astype(jnp.float32) for p in bbox_preds]
        gen = make_sar_anchor_generator(tuple(c["sar"]["strides"]))
        return gfl_get_bboxes(
            cls_scores, bbox_preds, gen, c["num_classes"], img_shape,
            reg_max=c["sar"]["reg_max"], strides=tuple(c["sar"]["strides"]),
            nms_pre=c["sar"]["nms_pre"], score_thr=c["sar"]["score_thr"],
            iou_thr=c["sar"]["nms_iou"], max_per_img=c["sar"]["max_per_img"])

    def _simple_test_rcnn(self, imgs, rpn_head, roi_head, img_shape,
                          max_per_img=None, dataset_id=1):
        c = self.cfg
        version = c["angle_version"]
        ids = jnp.full((imgs.shape[0],), dataset_id, jnp.int32)
        feats, _ = self.backbone(self._cast_in(imgs), train=False,
                                  dataset_ids=ids)
        x = self._neck_rcnn(list(feats))
        rpn_cls, rpn_reg = rpn_head(x)
        # proposal decode/NMS in fp32 (bf16 compute policy stops here)
        rpn_cls = [s.astype(jnp.float32) for s in rpn_cls]
        rpn_reg = [p.astype(jnp.float32) for p in rpn_reg]
        rpn_gen = make_rpn_anchor_generator(tuple(c["rgb"]["rpn_strides"]))
        rpn_coder = make_rpn_coder(version)
        proposals, p_scores, p_valid = rpn_get_proposals(
            rpn_cls, rpn_reg, rpn_gen, rpn_coder, img_shape=img_shape,
            nms_pre=c["rgb"]["rpn_nms_pre"], max_per_img=c["rgb"]["rpn_max"],
            iou_thr=c["rgb"]["rpn_nms_iou"])
        bsz, s = proposals.shape[:2]
        batch_idx = jnp.repeat(
            jnp.arange(bsz, dtype=jnp.float32), s)[:, None]
        rois6 = jnp.concatenate(
            [batch_idx, proposals.reshape(-1, 5)], axis=-1)
        roi_feats = extract_rotated_roi_feats(x, rois6, bucketed=True)
        cls_logits, reg_pred = roi_head(roi_feats)
        cls_logits = cls_logits.reshape(bsz, s, -1).astype(jnp.float32)
        reg_pred = reg_pred.reshape(bsz, s, -1).astype(jnp.float32)
        rcnn_coder = make_rcnn_coder(version)
        mx = max_per_img or c["rgb"]["rcnn_max"]
        return jax.vmap(
            lambda cl, rp, pr, pv: roi_head_get_bboxes(
                cl, rp, pr, pv, rcnn_coder, c["num_classes"],
                img_shape=img_shape, score_thr=c["rgb"]["rcnn_score_thr"],
                iou_thr=c["rgb"]["rcnn_nms_iou"], max_per_img=mx)
        )(cls_logits, reg_pred, proposals, p_valid)

    def simple_test_rgb(self, imgs, img_shape=(800, 800)):
        return self._simple_test_rcnn(
            imgs, self.rgb_rpn_head, self.rgb_roi_head, img_shape)

    def simple_test_ifr(self, imgs, img_shape=(800, 800)):
        return self._simple_test_rcnn(
            imgs, self.ifr_rpn_head, self.ifr_roi_head, img_shape,
            dataset_id=2)

    def simple_test(self, imgs, subdataset: str, img_shape=(800, 800)):
        """Route on subdataset like the reference ``simple_test`` (:371)."""
        if subdataset == "sar":
            return self.simple_test_sar(imgs, img_shape)
        if subdataset == "rgb":
            return self.simple_test_rgb(imgs, img_shape)
        if subdataset == "ifr":
            return self.simple_test_ifr(imgs, img_shape)
        raise ValueError(subdataset)

    def simple_test_joint(self, sar_imgs, rgb_imgs, ifr_imgs,
                          img_shape=(800, 800)):
        """Mixed-batch joint inference: ONE backbone pass over all three
        modalities and the two oriented streams' fixed-cost
        post-processing (proposal NMS, pyramid RoI align, RCNN
        decode/NMS) batched across rgb+ifr. Serving-path counterpart of
        ``extract_feat_train`` (:221) — the reference evaluates
        modalities in separate loader passes (trisource ``simple_test``
        :371); on TPU one compiled mixed step keeps the chip saturated
        and halves the sequential post-processing scans.

        Returns ``(sar, rgb, ifr)`` triples of (dets, labels, valid),
        identical to the per-modality ``simple_test_*`` outputs.
        """
        c = self.cfg
        n_sar = sar_imgs.shape[0]
        n_rgb = rgb_imgs.shape[0]
        n_ifr = ifr_imgs.shape[0]
        imgs = jnp.concatenate([sar_imgs, rgb_imgs, ifr_imgs], axis=0)
        ids = jnp.asarray([0] * n_sar + [1] * n_rgb + [2] * n_ifr,
                          jnp.int32)
        feats, _ = self.backbone(self._cast_in(imgs), train=False,
                                 dataset_ids=ids)
        sar_x = self._neck_sar([f[:n_sar] for f in feats])
        x = self._neck_rcnn([f[n_sar:] for f in feats])   # rgb+ifr batch

        # ---- SAR / GFL branch (batched over its images) ----
        cls_scores, bbox_preds = self.sar_bbox_head(sar_x)
        cls_scores = [s.astype(jnp.float32) for s in cls_scores]
        bbox_preds = [p.astype(jnp.float32) for p in bbox_preds]
        gen = make_sar_anchor_generator(tuple(c["sar"]["strides"]))
        sar_out = gfl_get_bboxes(
            cls_scores, bbox_preds, gen, c["num_classes"], img_shape,
            reg_max=c["sar"]["reg_max"],
            strides=tuple(c["sar"]["strides"]),
            nms_pre=c["sar"]["nms_pre"], score_thr=c["sar"]["score_thr"],
            iou_thr=c["sar"]["nms_iou"],
            max_per_img=c["sar"]["max_per_img"])

        # ---- dual oriented R-CNN branch ----
        version = c["angle_version"]
        x_rgb = [f[:n_rgb] for f in x]
        x_ifr = [f[n_rgb:] for f in x]
        rgb_cls, rgb_reg = self.rgb_rpn_head(x_rgb)
        ifr_cls, ifr_reg = self.ifr_rpn_head(x_ifr)
        rpn_cls = [jnp.concatenate([a, b], 0).astype(jnp.float32)
                   for a, b in zip(rgb_cls, ifr_cls)]
        rpn_reg = [jnp.concatenate([a, b], 0).astype(jnp.float32)
                   for a, b in zip(rgb_reg, ifr_reg)]
        rpn_gen = make_rpn_anchor_generator(
            tuple(c["rgb"]["rpn_strides"]))
        rpn_coder = make_rpn_coder(version)
        proposals, p_scores, p_valid = rpn_get_proposals(
            rpn_cls, rpn_reg, rpn_gen, rpn_coder, img_shape=img_shape,
            nms_pre=c["rgb"]["rpn_nms_pre"],
            max_per_img=c["rgb"]["rpn_max"],
            iou_thr=c["rgb"]["rpn_nms_iou"])
        bsz, s = proposals.shape[:2]
        batch_idx = jnp.repeat(
            jnp.arange(bsz, dtype=jnp.float32), s)[:, None]
        rois6 = jnp.concatenate(
            [batch_idx, proposals.reshape(-1, 5)], axis=-1)
        roi_feats = extract_rotated_roi_feats(x, rois6,
                                              bucketed=True)  # ONE align
        rgb_logits, rgb_rp = self.rgb_roi_head(
            roi_feats[:n_rgb * s])
        ifr_logits, ifr_rp = self.ifr_roi_head(
            roi_feats[n_rgb * s:])
        cls_logits = jnp.concatenate(
            [rgb_logits.reshape(n_rgb, s, -1),
             ifr_logits.reshape(n_ifr, s, -1)], 0).astype(jnp.float32)
        reg_pred = jnp.concatenate(
            [rgb_rp.reshape(n_rgb, s, -1),
             ifr_rp.reshape(n_ifr, s, -1)], 0).astype(jnp.float32)
        rcnn_coder = make_rcnn_coder(version)
        dets, labels, valid = jax.vmap(
            lambda cl, rp, pr, pv: roi_head_get_bboxes(
                cl, rp, pr, pv, rcnn_coder, c["num_classes"],
                img_shape=img_shape,
                score_thr=c["rgb"]["rcnn_score_thr"],
                iou_thr=c["rgb"]["rcnn_nms_iou"],
                max_per_img=c["rgb"]["rcnn_max"])
        )(cls_logits, reg_pred, proposals, p_valid)
        rgb_out = (dets[:n_rgb], labels[:n_rgb], valid[:n_rgb])
        ifr_out = (dets[n_rgb:], labels[n_rgb:], valid[n_rgb:])
        return sar_out, rgb_out, ifr_out

    def aug_test(self, imgs, subdataset: str, img_shape=(800, 800),
                 scales=(1.0,), flip_directions=(None, "horizontal")):
        """Config-driven test-time augmentation (reference ``aug_test``
        :409 fed by the test pipeline's MultiScaleFlipAug): every
        (scale, flip_direction) variant runs simple_test, detections are
        mapped back to the original frame per the reference's
        ``bbox_flip`` (``mmrotate/core/bbox/transforms.py:9``: center
        reflect + angle = pi - a for rotated boxes, any direction) and
        unscaled, then all variants merge by re-scoring through one
        joint NMS (``aug_multiclass_nms_rotated`` semantics,
        ``bbox_nms_rotated.py:113``). ``flip_directions`` entries:
        None / 'horizontal' / 'vertical' / 'diagonal'."""
        from ...ops.box_convert import norm_angle
        from ...ops.nms import aug_multiclass_nms_rotated

        version = self.cfg["angle_version"]
        H, W = img_shape

        def flip_img(x, direction):
            # flips via gather, NOT ::-1 reverse: the reverse op inside
            # large jitted graphs crashes libtpu's fusion emitter
            # (see CLAUDE.md TPU gotchas)
            if direction in ("horizontal", "diagonal"):
                w = x.shape[2]
                x = jnp.take(x, w - 1 - jnp.arange(w), axis=2)
            if direction in ("vertical", "diagonal"):
                h = x.shape[1]
                x = jnp.take(x, h - 1 - jnp.arange(h), axis=1)
            return x

        def map_back(d, direction, shape_s, s):
            h, w = shape_s
            if subdataset == "sar":
                # xyxy: mmdet bbox_flip convention (x1' = W - x2)
                x1, y1, x2, y2, sc = (d[..., i] for i in range(5))
                if direction in ("horizontal", "diagonal"):
                    x1, x2 = w - x2, w - x1
                if direction in ("vertical", "diagonal"):
                    y1, y2 = h - y2, h - y1
                return jnp.stack([x1 / s, y1 / s, x2 / s, y2 / s, sc], -1)
            cx, cy, bw, bh, a, sc = (d[..., i] for i in range(6))
            if direction is not None:
                # rotated bbox_flip (transforms.py:25-38): reflect the
                # center (pixel-center convention, hence the -1) and
                # angle -> pi - a for every direction
                if direction in ("horizontal", "diagonal"):
                    cx = w - cx - 1
                if direction in ("vertical", "diagonal"):
                    cy = h - cy - 1
                a = norm_angle(jnp.pi - a, version)
            return jnp.stack([cx / s, cy / s, bw / s, bh / s, a, sc], -1)

        all_d, all_l, all_v = [], [], []
        for s in scales:
            if s == 1.0:
                im_s, shape_s = imgs, (H, W)
            else:
                shape_s = (int(round(H * s)), int(round(W * s)))
                im_s = jax.image.resize(
                    imgs, (imgs.shape[0],) + shape_s + (imgs.shape[3],),
                    method="bilinear")
            for direction in flip_directions:
                d, lab, val = self.simple_test(
                    flip_img(im_s, direction), subdataset, shape_s)
                all_d.append(map_back(d, direction, shape_s, s))
                all_l.append(lab)
                all_v.append(val)

        iou_thr = 0.5 if subdataset == "sar" else 0.1
        box_dim = 4 if subdataset == "sar" else 5

        def merge(ds, ls, vs):
            return aug_multiclass_nms_rotated(
                ds, ls, vs, iou_thr, max_out=ds[0].shape[0],
                box_dim=box_dim)

        return jax.vmap(merge)(tuple(all_d), tuple(all_l), tuple(all_v))
