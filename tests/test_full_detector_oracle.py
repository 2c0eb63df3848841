"""Full-detector parity oracle: the complete Oriented R-CNN inference
chain — RPN conv head -> proposal decode/NMS -> RoI level routing ->
RoIAlignRotated -> Shared2FC bbox head -> decode -> multiclass rotated
NMS — compared end-to-end against the exec'd reference source on an
ingested random-init state dict.

Reference chain (all exec'd unmodified, framework shells stubbed):
- ``mmrotate/models/dense_heads/rotated_rpn_head.py`` +
  ``oriented_rpn_head.py`` (forward + get_bboxes)
- ``mmrotate/core/bbox/coder/delta_midpointoffset_rbbox_coder.py`` /
  ``delta_xywha_rbbox_coder.py`` (via the ref_coders fixture)
- ``mmrotate/models/roi_heads/roi_extractors/
  rotate_single_level_roi_extractor.py`` (sqrt(wh) level mapping)
- ``mmrotate/models/roi_heads/bbox_heads/rotated_bbox_head.py`` +
  ``convfc_rbbox_head.py`` (forward + get_bboxes)
- ``mmrotate/core/post_processing/bbox_nms_rotated.py``
  (multiclass_nms_rotated)

Kernel shims (documented): the reference's CUDA ``RoIAlignRotated`` and
``nms_rotated`` IoU backend are bridged to this repo's implementations,
which are independently pinned by the mmcv golden fixtures
(tests/test_mmcv_golden.py) — so this test isolates CHAIN WIRING drift
(score/level routing, decode, NMS config threading, state-dict
ingestion), not kernel numerics. ``batched_nms`` (horizontal) is a
pure-torch greedy transcription. The mmdet ``AnchorGenerator`` is a
pure-torch transcription of its published semantics.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

torch = pytest.importorskip("torch")

from reference_torch import load_reference_source  # noqa: E402
from test_reference_parity import ref_coders  # noqa: E402,F401 (fixture)

REF = "/root/reference/mmrotate"


def _mod(name):
    import types
    m = sys.modules.get(name)
    if m is None:
        m = types.ModuleType(name)
        sys.modules[name] = m
    return m


class AttrDict(dict):
    """Minimal mmcv-Config-like attribute dict (deepcopy-able)."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return AttrDict(v) if isinstance(v, dict) else v

    def get(self, k, default=None):
        v = super().get(k, default)
        return AttrDict(v) if isinstance(v, dict) else v


class TorchAnchorGenerator:
    """Pure-torch transcription of mmdet ``AnchorGenerator`` (2.x
    semantics: base anchors from scales x ratios around base_size =
    stride, center_offset 0, grid row-major over (y, x) with base
    anchors fastest)."""

    def __init__(self, strides, ratios, scales, base_sizes=None,
                 center_offset=0.0):
        self.strides = [s if isinstance(s, (tuple, list)) else (s, s)
                        for s in strides]
        self.ratios = torch.tensor(ratios, dtype=torch.float32)
        self.scales = torch.tensor(scales, dtype=torch.float32)
        self.base_sizes = list(base_sizes) if base_sizes is not None \
            else [min(s) for s in self.strides]
        self.center_offset = center_offset

    @property
    def num_base_anchors(self):
        return [len(self.ratios) * len(self.scales)] * len(self.strides)

    def _base_anchors(self, base_size):
        h_ratios = torch.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        ws = (base_size * w_ratios[:, None] *
              self.scales[None, :]).view(-1)
        hs = (base_size * h_ratios[:, None] *
              self.scales[None, :]).view(-1)
        xc = self.center_offset * base_size
        yc = self.center_offset * base_size
        return torch.stack(
            [xc - 0.5 * ws, yc - 0.5 * hs, xc + 0.5 * ws,
             yc + 0.5 * hs], dim=-1)

    def grid_priors(self, featmap_sizes, device="cpu"):
        out = []
        for lvl, (h, w) in enumerate(featmap_sizes):
            base = self._base_anchors(self.base_sizes[lvl])
            sw, sh = self.strides[lvl]
            xs = torch.arange(w, dtype=torch.float32) * sw
            ys = torch.arange(h, dtype=torch.float32) * sh
            xx = xs.repeat(h)
            yy = ys.view(-1, 1).repeat(1, w).view(-1)
            shifts = torch.stack([xx, yy, xx, yy], dim=-1)
            out.append((base[None, :, :] +
                        shifts[:, None, :]).reshape(-1, 4))
        return out


def _torch_greedy_nms_hbb(boxes, scores, iou_thr):
    """Plain greedy horizontal NMS (torchvision/mmcv semantics):
    returns keep indices in descending-score order."""
    order = torch.argsort(-scores, stable=True)
    keep = []
    suppressed = torch.zeros(len(scores), dtype=torch.bool)
    areas = (boxes[:, 2] - boxes[:, 0]).clamp(min=0) * \
        (boxes[:, 3] - boxes[:, 1]).clamp(min=0)
    for i in order.tolist():
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = torch.maximum(boxes[i, 0], boxes[:, 0])
        y1 = torch.maximum(boxes[i, 1], boxes[:, 1])
        x2 = torch.minimum(boxes[i, 2], boxes[:, 2])
        y2 = torch.minimum(boxes[i, 3], boxes[:, 3])
        inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
        iou = inter / (areas[i] + areas - inter).clamp(min=1e-12)
        suppressed |= iou > iou_thr
    return torch.tensor(keep, dtype=torch.long)


def _jax_rotated_iou_matrix(boxes_np):
    """(N, N) rotated IoU via this repo's op (golden-fixture-pinned)."""
    import jax.numpy as jnp

    from sm3det_tpu.ops.rotated_iou import box_iou_rotated
    b = jnp.asarray(boxes_np, jnp.float32)
    return np.asarray(box_iou_rotated(b, b))


def _shim_mmcv_ops():
    """mmcv.ops.{batched_nms, nms_rotated, RoIAlignRotated} shims."""
    ops = _mod("mmcv.ops")

    def batched_nms(boxes, scores, idxs, nms_cfg):
        iou_thr = float(dict(nms_cfg)["iou_threshold"])
        if len(boxes) == 0:
            return (torch.zeros((0, 5)),
                    torch.zeros((0,), dtype=torch.long))
        max_coordinate = boxes.max()
        offsets = idxs.to(boxes) * (max_coordinate + 1)
        shifted = boxes + offsets[:, None]
        keep = _torch_greedy_nms_hbb(shifted, scores, iou_thr)
        dets = torch.cat([boxes[keep], scores[keep, None]], dim=1)
        return dets, keep

    def nms_rotated(dets, scores, iou_threshold, labels=None):
        if len(dets) == 0:
            return (torch.zeros((0, 6)),
                    torch.zeros((0,), dtype=torch.long))
        iou = torch.from_numpy(
            _jax_rotated_iou_matrix(dets.detach().numpy()))
        order = torch.argsort(-scores, stable=True)
        keep = []
        suppressed = torch.zeros(len(scores), dtype=torch.bool)
        for i in order.tolist():
            if suppressed[i]:
                continue
            keep.append(i)
            suppressed |= iou[i] > iou_threshold
        keep = torch.tensor(keep, dtype=torch.long)
        out = torch.cat([dets[keep], scores[keep, None]], dim=1)
        return out, keep

    class RoIAlignRotated(torch.nn.Module):
        def __init__(self, out_size, spatial_scale, sample_num=0,
                     aligned=True, clockwise=False):
            super().__init__()
            self.output_size = (out_size, out_size) \
                if isinstance(out_size, int) else tuple(out_size)
            self.spatial_scale = spatial_scale
            self.sample_num = sample_num
            self.aligned = aligned
            self.clockwise = clockwise

        def forward(self, feat, rois):
            import jax.numpy as jnp

            from sm3det_tpu.ops.roi_align_rotated import \
                roi_align_rotated
            f = jnp.asarray(
                feat.detach().permute(0, 2, 3, 1).numpy())
            r = jnp.asarray(rois.detach().numpy())
            out = roi_align_rotated(
                f, r, self.output_size[0], self.spatial_scale,
                sample_num=self.sample_num, aligned=self.aligned,
                clockwise=self.clockwise)
            return torch.from_numpy(
                np.asarray(out)).permute(0, 3, 1, 2).contiguous()

    class RiRoIAlignRotated:     # only referenced in an isinstance()
        pass

    ops.batched_nms = batched_nms
    ops.nms_rotated = nms_rotated
    ops.RoIAlignRotated = RoIAlignRotated
    ops.RiRoIAlignRotated = RiRoIAlignRotated
    mmcv = _mod("mmcv")
    mmcv.ops = ops
    return ops


@pytest.fixture(scope="module")
def ref_chain(ref_coders):  # noqa: F811
    """Exec the full reference Oriented R-CNN inference chain."""
    import torch.nn as nn

    _shim_mmcv_ops()

    rt = _mod("mmcv.runner")
    if not hasattr(rt, "BaseModule"):
        class BaseModule(nn.Module):
            def __init__(self, init_cfg=None):
                super().__init__()
                self.init_cfg = init_cfg
        rt.BaseModule = BaseModule
    rt.auto_fp16 = lambda **kw: (lambda f: f)
    rt.force_fp32 = lambda **kw: (lambda f: f)
    _mod("mmcv.utils").to_2tuple = \
        lambda v: v if isinstance(v, tuple) else (v, v)
    _mod("mmcv.cnn").ConvModule = nn.Module   # unused (0 conv branches)

    def multi_apply(func, *args, **kwargs):
        import functools
        pfunc = functools.partial(func, **kwargs) if kwargs else func
        return tuple(map(list, zip(*map(pfunc, *args))))

    mdc = _mod("mmdet.core")
    mdc.multi_apply = multi_apply
    mdc.images_to_levels = None
    mdc.anchor_inside_flags = None
    mdc.unmap = None
    _mod("mmdet.models.losses").accuracy = \
        lambda *a, **k: torch.zeros(())
    _mod("mmdet.models").losses = sys.modules["mmdet.models.losses"]

    def build_linear_layer(cfg, in_features, out_features):
        return nn.Linear(in_features, out_features)

    _mod("mmdet.models.utils").build_linear_layer = build_linear_layer
    sys.modules["mmdet.models"].utils = sys.modules["mmdet.models.utils"]

    tr = sys.modules["refbbox.transforms"]
    mr_core = _mod("mmrotate.core")
    mr_core.obb2xyxy = tr.obb2xyxy

    coder_mods = ref_coders

    def build_bbox_coder(cfg):
        cfg = dict(cfg)
        t = cfg.pop("type")
        if t == "MidpointOffsetCoder":
            return coder_mods["delta_midpointoffset_rbbox_coder"]\
                .MidpointOffsetCoder(**cfg)
        assert t == "DeltaXYWHAOBBoxCoder"
        return coder_mods["delta_xywha_rbbox_coder"]\
            .DeltaXYWHAOBBoxCoder(**cfg)

    mr_core.build_bbox_coder = build_bbox_coder

    # --- multiclass_nms_rotated: exec the REAL reference module
    nms_mod = load_reference_source(
        f"{REF}/core/post_processing/bbox_nms_rotated.py",
        "ref_chain_bbox_nms")
    mr_core.multiclass_nms_rotated = nms_mod.multiclass_nms_rotated

    # --- bbox heads
    bbox_head_mod = load_reference_source(
        f"{REF}/models/roi_heads/bbox_heads/rotated_bbox_head.py",
        "ref_chain_rotated_bbox_head")

    class _CE(nn.Module):
        def __init__(self, **kw):
            super().__init__()

    class _L1(nn.Module):
        def __init__(self, **kw):
            super().__init__()

    bbox_head_mod.build_loss = lambda cfg: (
        _CE() if dict(cfg).get("type") == "CrossEntropyLoss" else _L1())

    convfc_mod = load_reference_source(
        f"{REF}/models/roi_heads/bbox_heads/convfc_rbbox_head.py",
        "ref_chain_convfc_head",
        replacements={
            "from .rotated_bbox_head import RotatedBBoxHead":
            "RotatedBBoxHead = __import__('sys').modules["
            "'ref_chain_rotated_bbox_head'].RotatedBBoxHead"})

    # --- AnchorHead stub for the RPN heads
    class AnchorHead(rt.BaseModule):
        def __init__(self, num_classes, in_channels, feat_channels=256,
                     anchor_generator=None, bbox_coder=None,
                     reg_decoded_bbox=False, loss_cls=None,
                     loss_bbox=None, train_cfg=None, test_cfg=None,
                     init_cfg=None):
            super().__init__()
            self.num_classes = num_classes
            self.in_channels = in_channels
            self.feat_channels = feat_channels
            self.use_sigmoid_cls = bool(
                (loss_cls or {}).get("use_sigmoid", False))
            self.cls_out_channels = num_classes if self.use_sigmoid_cls \
                else num_classes + 1
            gen_cfg = dict(anchor_generator)
            gen_cfg.pop("type")
            self.anchor_generator = TorchAnchorGenerator(**gen_cfg)
            self.num_anchors = self.anchor_generator.num_base_anchors[0]
            self.bbox_coder = build_bbox_coder(bbox_coder)
            self.train_cfg = train_cfg
            self.test_cfg = AttrDict(test_cfg) if test_cfg else None
            self.fp16_enabled = False
            self._init_layers()

        def forward(self, feats):
            return multi_apply(self.forward_single, feats)

    _mod("mmdet.models.dense_heads.anchor_head").AnchorHead = AnchorHead
    _mod("mmdet.models.dense_heads").anchor_head = \
        sys.modules["mmdet.models.dense_heads.anchor_head"]

    rpn_base_mod = load_reference_source(
        f"{REF}/models/dense_heads/rotated_rpn_head.py",
        "ref_chain_rotated_rpn_head")
    oriented_rpn_mod = load_reference_source(
        f"{REF}/models/dense_heads/oriented_rpn_head.py",
        "ref_chain_oriented_rpn_head",
        replacements={
            "from .rotated_rpn_head import RotatedRPNHead":
            "RotatedRPNHead = __import__('sys').modules["
            "'ref_chain_rotated_rpn_head'].RotatedRPNHead"})

    # --- RoI extractor (sqrt(wh) level mapping)
    class BaseRoIExtractor(nn.Module):
        """mmdet BaseRoIExtractor stub: stores cfg, builds roi_layers
        via the subclass hook."""

        def __init__(self, roi_layer, out_channels, featmap_strides,
                     init_cfg=None):
            super().__init__()
            self.out_channels = out_channels
            self.featmap_strides = featmap_strides
            self.roi_layers = self.build_roi_layers(
                roi_layer, featmap_strides)
            self.fp16_enabled = False

        @property
        def num_inputs(self):
            return len(self.featmap_strides)

    _mod("mmdet.models.roi_heads")
    _mod("mmdet.models.roi_heads.roi_extractors")
    bre = _mod("mmdet.models.roi_heads.roi_extractors."
               "base_roi_extractor")
    bre.BaseRoIExtractor = BaseRoIExtractor

    extractor_mod = load_reference_source(
        f"{REF}/models/roi_heads/roi_extractors/"
        "rotate_single_level_roi_extractor.py",
        "ref_chain_roi_extractor",
        replacements={
            "from mmrotate import digit_version, mmcv_version":
            "digit_version = lambda v: v; mmcv_version = 'shim'",
        })
    return dict(
        oriented_rpn=oriented_rpn_mod.OrientedRPNHead,
        convfc=convfc_mod.RotatedShared2FCBBoxHead,
        extractor=extractor_mod.RotatedSingleRoIExtractor,
        multiclass_nms_rotated=nms_mod.multiclass_nms_rotated,
        transforms=tr,
    )


# ---------------------------------------------------------------------------
# chain drivers

IMG = 256
FEAT_C = 32
NUM_CLASSES = 3
RPN_STRIDES = (4, 8, 16, 32, 64)
ROI_STRIDES = (4, 8, 16, 32)
RPN_NMS_PRE = 300
RPN_MAX = 120
RPN_IOU = 0.8
RCNN_SCORE_THR = 0.05
RCNN_IOU = 0.1
RCNN_MAX = 60
VERSION = "le90"


def _make_feats(rng, bsz=1):
    """5-level FPN features; the RoI extractor consumes the first 4."""
    return [rng.randn(bsz, FEAT_C, IMG // s, IMG // s)
            .astype(np.float32) * 0.5 for s in RPN_STRIDES]


def _torch_chain(ref_chain, feats_np):
    tr = ref_chain["transforms"]
    torch.manual_seed(3)
    rpn = ref_chain["oriented_rpn"](
        in_channels=FEAT_C,
        version=VERSION,
        feat_channels=FEAT_C,
        anchor_generator=dict(type="AnchorGenerator", scales=[8],
                              ratios=[0.5, 1.0, 2.0],
                              strides=list(RPN_STRIDES)),
        bbox_coder=dict(type="MidpointOffsetCoder", angle_range=VERSION,
                        target_means=(0.0,) * 6,
                        target_stds=(1.0, 1.0, 1.0, 1.0, 0.5, 0.5)),
        loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=True),
        loss_bbox=dict(type="SmoothL1Loss"),
        test_cfg=dict(nms_pre=RPN_NMS_PRE, max_per_img=RPN_MAX,
                      nms=dict(iou_threshold=RPN_IOU), min_bbox_size=0),
    ).eval()
    head = ref_chain["convfc"](
        fc_out_channels=64,
        in_channels=FEAT_C,
        roi_feat_size=7,
        num_classes=NUM_CLASSES,
        bbox_coder=dict(type="DeltaXYWHAOBBoxCoder", angle_range=VERSION,
                        norm_factor=None, edge_swap=True, proj_xy=True,
                        target_means=(0.0,) * 5,
                        target_stds=(0.1, 0.1, 0.2, 0.2, 0.1)),
        reg_class_agnostic=True,
        loss_cls=dict(type="CrossEntropyLoss"),
        loss_bbox=dict(type="SmoothL1Loss"),
    ).eval()
    extractor = ref_chain["extractor"](
        roi_layer=dict(type="RoIAlignRotated", out_size=7, sample_num=2,
                       clockwise=True),
        out_channels=FEAT_C,
        featmap_strides=list(ROI_STRIDES))

    feats = [torch.from_numpy(f) for f in feats_np]
    with torch.no_grad():
        cls_scores, bbox_preds = rpn(feats)
        img_metas = [dict(img_shape=(IMG, IMG, 3),
                          scale_factor=np.ones(4, np.float32))]
        proposal_list = rpn.get_bboxes(cls_scores, bbox_preds, img_metas)
        proposals = proposal_list[0]          # (n, 6) obb+score
        rois = tr.rbbox2roi([proposals[:, :5]])
        roi_feats = extractor(feats[:len(ROI_STRIDES)], rois)
        cls_score, bbox_pred = head(roi_feats)
        det_bboxes, det_labels = head.get_bboxes(
            rois, cls_score, bbox_pred, (IMG, IMG, 3),
            np.ones(4, np.float32), rescale=False,
            cfg=AttrDict(score_thr=RCNN_SCORE_THR,
                         nms=dict(iou_thr=RCNN_IOU),
                         max_per_img=RCNN_MAX))
    return dict(rpn=rpn, head=head, proposals=proposals.numpy(),
                dets=det_bboxes.numpy(), labels=det_labels.numpy())


def _jax_chain(rpn_sd, head_sd, feats_np):
    import jax
    import jax.numpy as jnp

    from sm3det_tpu.core.anchor import AnchorGenerator
    from sm3det_tpu.core.bbox.coders import (DeltaXYWHAOBBoxCoder,
                                             MidpointOffsetCoder)
    from sm3det_tpu.models.dense_heads.oriented_rpn_head import (
        OrientedRPNHead, rpn_get_proposals)
    from sm3det_tpu.models.roi_heads.oriented_roi_head import (
        RotatedShared2FCBBoxHead, extract_rotated_roi_feats,
        roi_head_get_bboxes)
    from sm3det_tpu.train.checkpoint import (rpn_head_torch_to_jax,
                                             shared2fc_head_torch_to_jax)

    feats = [jnp.asarray(np.transpose(f, (0, 2, 3, 1)))
             for f in feats_np]
    rpn = OrientedRPNHead(num_anchors=3, feat_channels=FEAT_C)
    rpn_params = rpn.init(jax.random.PRNGKey(0), feats)["params"]
    rpn_params = rpn_head_torch_to_jax(rpn_sd, rpn_params)
    cls_scores, bbox_preds = rpn.apply({"params": rpn_params}, feats)

    gen = AnchorGenerator(strides=RPN_STRIDES, ratios=[0.5, 1.0, 2.0],
                          scales=[8])
    coder = MidpointOffsetCoder(
        angle_range=VERSION, target_means=(0.0,) * 6,
        target_stds=(1.0, 1.0, 1.0, 1.0, 0.5, 0.5))
    proposals, p_scores, p_valid = rpn_get_proposals(
        cls_scores, bbox_preds, gen, coder, img_shape=(IMG, IMG),
        nms_pre=RPN_NMS_PRE, max_per_img=RPN_MAX, iou_thr=RPN_IOU)

    bsz, s = proposals.shape[:2]
    batch_idx = jnp.repeat(
        jnp.arange(bsz, dtype=jnp.float32), s)[:, None]
    rois6 = jnp.concatenate([batch_idx, proposals.reshape(-1, 5)], -1)
    roi_feats = extract_rotated_roi_feats(
        feats[:len(ROI_STRIDES)], rois6,
        featmap_strides=ROI_STRIDES, bucketed=False)
    head = RotatedShared2FCBBoxHead(num_classes=NUM_CLASSES,
                                    fc_out_channels=64)
    head_params = head.init(jax.random.PRNGKey(1), roi_feats)["params"]
    head_params = shared2fc_head_torch_to_jax(head_sd, head_params)
    cls_logits, reg_pred = head.apply({"params": head_params}, roi_feats)

    rcnn_coder = DeltaXYWHAOBBoxCoder(
        angle_range=VERSION, target_means=(0.0,) * 5,
        target_stds=(0.1, 0.1, 0.2, 0.2, 0.1), edge_swap=True,
        proj_xy=True)
    dets, labels, valid = roi_head_get_bboxes(
        cls_logits.reshape(s, -1), reg_pred.reshape(s, -1),
        proposals[0], p_valid[0], rcnn_coder, NUM_CLASSES,
        img_shape=(IMG, IMG), score_thr=RCNN_SCORE_THR,
        iou_thr=RCNN_IOU, max_per_img=RCNN_MAX)
    return dict(
        proposals=np.asarray(proposals[0]),
        p_scores=np.asarray(p_scores[0]),
        p_valid=np.asarray(p_valid[0]),
        dets=np.asarray(dets), labels=np.asarray(labels),
        valid=np.asarray(valid))


def _obb_geom_equal(a, b, tol_iou=0.98):
    """Aligned rotated IoU >= tol (angle conventions make fieldwise
    comparison wrong; CLAUDE.md invariant)."""
    import jax.numpy as jnp

    from sm3det_tpu.ops.rotated_iou import box_iou_rotated
    ious = np.asarray(box_iou_rotated(
        jnp.asarray(a[None, :5], jnp.float32),
        jnp.asarray(b[None, :5], jnp.float32)))[0, 0]
    return ious >= tol_iou


def test_full_oriented_rcnn_chain_parity(ref_chain):
    rng = np.random.RandomState(11)
    feats_np = _make_feats(rng)

    ref = _torch_chain(ref_chain, feats_np)
    rpn_sd = {k: v.detach().numpy()
              for k, v in ref["rpn"].state_dict().items()}
    head_sd = {k: v.detach().numpy()
               for k, v in ref["head"].state_dict().items()}
    got = _jax_chain(rpn_sd, head_sd, feats_np)

    # --- stage 1: proposals (score-sorted prefix must agree)
    rp = ref["proposals"]                     # (n, 6) sorted by score
    n_valid = int(got["p_valid"].sum())
    assert len(rp) > 20, "degenerate fixture: too few proposals"
    assert abs(n_valid - len(rp)) <= 1, (n_valid, len(rp))
    n_cmp = min(n_valid, len(rp), 50)
    for i in range(n_cmp):
        assert abs(got["p_scores"][i] - rp[i, 5]) < 1e-4, i
        assert _obb_geom_equal(got["proposals"][i], rp[i]), i

    # --- stage 2: final detections
    rd, rl = ref["dets"], ref["labels"]       # (m, 6), (m,)
    m_valid = int(got["valid"].sum())
    assert len(rd) > 5, "degenerate fixture: too few detections"
    assert abs(m_valid - len(rd)) <= 1, (m_valid, len(rd))
    gd = got["dets"][got["valid"]]
    gl = got["labels"][got["valid"]]
    m_cmp = min(m_valid, len(rd))
    # both sides emit score-descending; compare slot by slot
    for i in range(m_cmp):
        assert abs(gd[i, 5] - rd[i, 5]) < 1e-4, (i, gd[i, 5], rd[i, 5])
        assert gl[i] == rl[i], (i, gl[i], rl[i])
        assert _obb_geom_equal(gd[i], rd[i]), i
