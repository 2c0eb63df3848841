"""Numeric-oracle parity for the rotated FCOS head.

The reference head (``/root/reference/mmrotate/models/dense_heads/
rotated_fcos_head.py``) is exec'd UNMODIFIED (framework shells stubbed,
base class replaced by ``torch.nn.Module`` — only methods defined in the
file itself are called) together with its vendored
``DistanceAnglePointCoder``. It runs at the DOTA config settings
(``configs/rotated_fcos/rotated_fcos_r50_fpn_1x_dota_le90.py:36-51``):
center_sampling=True radius 1.5, norm_on_bbox=True, separate_angle=False,
FocalLoss + RotatedIoULoss(mode='log', centerness-weighted with
centerness_denorm) + BCE centerness.

The CUDA ``diff_iou_rotated_2d`` inside the vendored RotatedIoULoss is
monkeypatched with this repo's golden-fixture-verified rotated IoU op, so
loss_bbox is compared by VALUE; loss_cls/loss_centerness are compared by
value AND gradient.

This oracle guards three parity fixes found against the reference source:
centerness-weighted IoU loss (denorm = centerness sum, not num_pos),
RotatedIoULoss mode='log' default, and centerness_on_reg=True.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from reference_torch import load_reference_source  # noqa: E402

REF = "/root/reference/mmrotate"
STRIDES = (8, 16)
SIZES = ((12, 12), (6, 6))
RANGES = ((-1, 64), (64, 128))
C = 7


def _mod(name):
    m = sys.modules.get(name)
    if m is None:
        m = types.ModuleType(name)
        sys.modules[name] = m
    return m


class _FocalLoss(torch.nn.Module):
    """mmdet py_sigmoid_focal_loss (public, stable semantics)."""

    def __init__(self, gamma=2.0, alpha=0.25, loss_weight=1.0):
        super().__init__()
        self.gamma, self.alpha, self.loss_weight = gamma, alpha, loss_weight

    def forward(self, pred, labels, weight=None, avg_factor=None):
        n, c = pred.shape
        onehot = pred.new_zeros((n, c))
        valid = (labels >= 0) & (labels < c)
        onehot[torch.arange(n)[valid], labels[valid]] = 1.0
        p = pred.sigmoid()
        pt = (1 - p) * onehot + p * (1 - onehot)
        fw = (self.alpha * onehot + (1 - self.alpha) * (1 - onehot)) * \
            pt.pow(self.gamma)
        loss = F.binary_cross_entropy_with_logits(
            pred, onehot, reduction="none") * fw
        loss = loss.sum()
        return self.loss_weight * loss / max(float(avg_factor), 1e-12)


class _BCELoss(torch.nn.Module):
    """mmdet CrossEntropyLoss(use_sigmoid=True) on 1-d float targets."""

    def forward(self, pred, target, weight=None, avg_factor=None):
        loss = F.binary_cross_entropy_with_logits(
            pred, target.float(), reduction="none")
        return loss.sum() / max(float(avg_factor), 1e-12)


class _PriorGen:
    """mmdet MlvlPointGenerator semantics at offset 0.5."""

    def grid_priors(self, featmap_sizes, dtype=None, device=None):
        out = []
        for (h, w), s in zip(featmap_sizes, STRIDES):
            ys = (torch.arange(h, dtype=torch.float32) + 0.5) * s
            xs = (torch.arange(w, dtype=torch.float32) + 0.5) * s
            gy, gx = torch.meshgrid(ys, xs, indexing="ij")
            out.append(torch.stack(
                [gx.reshape(-1), gy.reshape(-1)], -1))
        return out


def _multi_apply(func, *args, **kwargs):
    import functools
    pfunc = functools.partial(func, **kwargs) if kwargs else func
    return tuple(map(list, zip(*map(pfunc, *args))))


@pytest.fixture(scope="module")
def ref_fcos():
    if not os.path.exists(REF):
        pytest.skip("reference checkout not available")

    _mod("mmcv.runner").force_fp32 = lambda **kw: (lambda f: f)

    class _Scale(torch.nn.Module):
        def __init__(self, scale=1.0):
            super().__init__()
            self.scale = torch.nn.Parameter(torch.tensor(float(scale)))

        def forward(self, x):
            return x * self.scale

    _mod("mmcv.cnn").Scale = _Scale
    mc = _mod("mmdet.core")
    mc.multi_apply = _multi_apply
    mc.reduce_mean = lambda t: t

    class _BaseCoder:
        def __init__(self, **kw):
            pass

    mc.BaseBBoxCoder = _BaseCoder

    # vendored transforms (norm_angle) + DistanceAnglePointCoder
    spec = importlib.util.spec_from_file_location(
        "mmrotate.core.bbox.transforms",
        f"{REF}/core/bbox/transforms.py")
    tr = importlib.util.module_from_spec(spec)
    for name in ("mmrotate", "mmrotate.core", "mmrotate.core.bbox"):
        _mod(name)
    sys.modules["mmrotate.core.bbox.transforms"] = tr
    sys.modules["mmrotate.core.bbox"].transforms = tr
    if not hasattr(sys.modules.get("mmcv", _mod("mmcv")), "jit"):
        sys.modules["mmcv"].jit = lambda **kw: (lambda f: f)
    spec.loader.exec_module(tr)

    coder_mod = load_reference_source(
        f"{REF}/core/bbox/coder/distance_angle_point_coder.py",
        "ref_distance_angle_point_coder",
        replacements={
            "from mmdet.core import BaseBBoxCoder":
                "from torch.nn import Module as BaseBBoxCoder",
        })

    iou_loss_mod = load_reference_source(
        f"{REF}/models/losses/rotated_iou_loss.py",
        "ref_rotated_iou_loss")

    def _diff_iou(pred, target):
        from sm3det_tpu.ops.rotated_iou import box_iou_rotated
        res = box_iou_rotated(
            jnp.asarray(pred.squeeze(0).detach().numpy()),
            jnp.asarray(target.squeeze(0).detach().numpy()),
            aligned=True)
        return torch.tensor(np.asarray(res)).unsqueeze(0)

    iou_loss_mod.diff_iou_rotated_2d = _diff_iou

    mr_core = sys.modules["mmrotate.core"]
    mr_core.build_bbox_coder = lambda cfg: coder_mod \
        .DistanceAnglePointCoder(angle_version=dict(cfg)["angle_version"])
    mr_core.multiclass_nms_rotated = None

    head_mod = load_reference_source(
        f"{REF}/models/dense_heads/rotated_fcos_head.py",
        "ref_rotated_fcos_head",
        replacements={
            "from .rotated_anchor_free_head import RotatedAnchorFreeHead":
                "from torch.nn import Module as RotatedAnchorFreeHead",
        })
    return head_mod, coder_mod, iou_loss_mod


def _make_head(mod, iou_loss_mod, coder_mod):
    H = mod.RotatedFCOSHead
    head = H.__new__(H)
    torch.nn.Module.__init__(head)
    head.num_classes = C
    head.cls_out_channels = C
    head.regress_ranges = RANGES
    head.center_sampling = True
    head.center_sample_radius = 1.5
    # the DOTA config runs norm_on_bbox=True, which is an exact
    # reparametrization (preds and targets both stride-divided; IoU is
    # invariant to scaling about the point). The oracle runs the
    # equivalent real-scale path so both sides evaluate IoU on identical
    # floats — at normalized scale fp noise in the polygon clip is
    # amplified ~0.8% through -log(iou).
    head.norm_on_bbox = False
    head.separate_angle = False
    head.strides = list(STRIDES)
    head.prior_generator = _PriorGen()
    head.bbox_coder = coder_mod.DistanceAnglePointCoder(
        angle_version="le90")
    head.loss_cls = _FocalLoss()
    head.loss_bbox = iou_loss_mod.RotatedIoULoss(loss_weight=1.0)
    head.loss_centerness = _BCELoss()
    return head


def _fixture():
    rng = np.random.RandomState(5)
    B, G = 2, 6
    gts = np.stack([np.stack([
        rng.uniform(15, 80, G), rng.uniform(15, 80, G),
        rng.uniform(14, 70, G), rng.uniform(12, 60, G),
        rng.uniform(-np.pi / 2 + 0.05, np.pi / 2 - 0.05, G),
    ], -1) for _ in range(B)]).astype(np.float32)
    labels = rng.randint(0, C, (B, G)).astype(np.int64)
    mask = np.ones((B, G), bool)
    mask[1, 4:] = False
    P = sum(h * w for h, w in SIZES)
    cls_flat = rng.normal(0, 1, (B, P, C)).astype(np.float32)
    # norm_on_bbox: train-time preds are stride-normalized distances >= 0
    regn_flat = np.abs(rng.normal(1.5, 1.0, (B, P, 4))).astype(np.float32)
    ang_flat = rng.normal(0, 0.4, (B, P, 1)).astype(np.float32)
    ctr_flat = rng.normal(0, 1, (B, P)).astype(np.float32)
    return gts, labels, mask, cls_flat, regn_flat, ang_flat, ctr_flat


def _to_nchw_levels(flat, ch):
    """(B, P, ch) flat -> reference-side list of NCHW level maps."""
    out, o = [], 0
    for (h, w) in SIZES:
        lvl = torch.tensor(flat[:, o:o + h * w].reshape(-1, h, w, ch))
        out.append(lvl.permute(0, 3, 1, 2).contiguous())
        o += h * w
    return out


def test_fcos_loss_oracle(ref_fcos):
    from sm3det_tpu.models.dense_heads import rotated_fcos_head as ours

    head_mod, coder_mod, iou_loss_mod = ref_fcos
    head = _make_head(head_mod, iou_loss_mod, coder_mod)
    gts, labels, mask, cls_flat, regn_flat, ang_flat, ctr_flat = _fixture()

    stride_flat = np.concatenate(
        [np.full((h * w,), s, np.float32)
         for (h, w), s in zip(SIZES, STRIDES)])
    reg_real = regn_flat * stride_flat[None, :, None]

    cls_maps = _to_nchw_levels(cls_flat, C)
    reg_maps = _to_nchw_levels(reg_real, 4)
    ang_maps = _to_nchw_levels(ang_flat, 1)
    ctr_maps = _to_nchw_levels(ctr_flat.reshape(2, -1, 1), 1)
    for m in cls_maps + ctr_maps:
        m.requires_grad_(True)

    ref = head.loss(
        cls_maps, reg_maps, ang_maps, ctr_maps,
        [torch.tensor(gts[b][mask[b]]) for b in range(2)],
        [torch.tensor(labels[b][mask[b]]) for b in range(2)],
        img_metas=[dict(), dict()])
    (ref["loss_cls"] + ref["loss_centerness"]).backward()
    ref_gc = [m.grad.numpy() for m in cls_maps]
    ref_gk = [m.grad.numpy() for m in ctr_maps]

    def split(flat, ch):
        out, o = [], 0
        for (h, w) in SIZES:
            out.append(jnp.asarray(
                flat[:, o:o + h * w].reshape(2, h, w, ch)))
            o += h * w
        return out

    # our module's REGRESS_RANGES[0:2] == the torch-side RANGES
    assert tuple(ours.REGRESS_RANGES[:2]) == RANGES

    def fn(cf, kf):
        losses = ours.fcos_loss(
            split(cf, C), split(reg_real, 4), split(ang_flat, 1),
            split(kf.reshape(2, -1, 1), 1),
            jnp.asarray(gts), jnp.asarray(labels), jnp.asarray(mask),
            num_classes=C, strides=STRIDES, version="le90")
        return losses["loss_cls"], losses["loss_bbox"], \
            losses["loss_centerness"]

    (o_cls, o_box, o_ctr), vjp = jax.vjp(
        fn, jnp.asarray(cls_flat), jnp.asarray(ctr_flat))
    g_cls, g_ctr = vjp((jnp.ones(()), jnp.zeros(()), jnp.ones(())))

    np.testing.assert_allclose(float(o_cls), float(ref["loss_cls"]),
                               rtol=2e-4, err_msg="fcos loss_cls")
    np.testing.assert_allclose(float(o_box), float(ref["loss_bbox"]),
                               rtol=2e-3, err_msg="fcos loss_bbox")
    np.testing.assert_allclose(float(o_ctr),
                               float(ref["loss_centerness"]),
                               rtol=2e-4, err_msg="fcos loss_centerness")

    # grads (cls + centerness only: the torch-side IoU bridge is
    # non-differentiable by construction)
    g_cls = np.asarray(g_cls)
    g_ctr = np.asarray(g_ctr)
    o = 0
    for lvl, (h, w) in enumerate(SIZES):
        ours_gc = g_cls[:, o:o + h * w].reshape(2, h, w, C) \
            .transpose(0, 3, 1, 2)
        ours_gk = g_ctr[:, o:o + h * w].reshape(2, h, w, 1) \
            .transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours_gc, ref_gc[lvl], rtol=2e-3,
                                   atol=1e-7, err_msg=f"cls grad L{lvl}")
        np.testing.assert_allclose(ours_gk, ref_gk[lvl], rtol=2e-3,
                                   atol=1e-7, err_msg=f"ctr grad L{lvl}")
        o += h * w


def test_distance_angle_coder_oracle(ref_fcos):
    """Our DistanceAnglePointCoder == the vendored reference coder
    (encode and decode, le90)."""
    _, coder_mod, _ = ref_fcos
    ref_coder = coder_mod.DistanceAnglePointCoder(angle_version="le90")
    ours = __import__(
        "sm3det_tpu.models.dense_heads.rotated_fcos_head",
        fromlist=["DistanceAnglePointCoder"]
    ).DistanceAnglePointCoder("le90")

    rng = np.random.RandomState(9)
    n = 64
    pts = rng.uniform(0, 512, (n, 2)).astype(np.float32)
    obbs = np.stack([
        rng.uniform(100, 400, n), rng.uniform(100, 400, n),
        rng.uniform(20, 120, n), rng.uniform(15, 90, n),
        rng.uniform(-np.pi / 2 + 0.02, np.pi / 2 - 0.02, n),
    ], -1).astype(np.float32)
    ref_enc = ref_coder.encode(torch.tensor(pts),
                               torch.tensor(obbs)).numpy()
    our_enc = np.asarray(ours.encode(jnp.asarray(pts),
                                     jnp.asarray(obbs)))
    np.testing.assert_allclose(our_enc, ref_enc, rtol=1e-5, atol=1e-4)

    preds = np.abs(rng.normal(30, 20, (n, 4))).astype(np.float32)
    angs = rng.uniform(-np.pi / 2 + 0.02, np.pi / 2 - 0.02,
                       (n, 1)).astype(np.float32)
    p5 = np.concatenate([preds, angs], -1)
    ref_dec = ref_coder.decode(torch.tensor(pts),
                               torch.tensor(p5)).numpy()
    our_dec = np.asarray(ours.decode(jnp.asarray(pts),
                                     jnp.asarray(p5)))
    np.testing.assert_allclose(our_dec, ref_dec, rtol=1e-5, atol=1e-4)
