"""Numeric-oracle parity for the RotatedRetina anchor-head loss.

Torch-side faithful recomputation of the reference loss stack for
``rotated_retinanet_obb_r50_fpn_1x_dota_le90.py:28-66``: rotated
MaxIoUAssigner(0.5/0.4/min_pos 0, low-quality matches) on rotated IoU
(this repo's golden-verified op feeds BOTH sides), the vendored
``DeltaXYWHAOBBoxCoder`` (stds all 1.0, edge_swap+proj_xy) for targets,
sigmoid FocalLoss(gamma 2, alpha 0.25) over assigned anchors and L1 on
positives, both normalized by num_total_pos (mmdet AnchorHead.loss with
sampling=False / PseudoSampler — fully deterministic, so values AND
gradients must match exactly).

Guards the round-4 retina fixes: stds 1.0 coder (was the RCNN
0.1/0.2-std coder) and L1 (was SmoothL1 beta 0.11).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_reference_parity import ref_coders  # noqa: E402,F401
from test_target_oracle import _ref_max_iou_assign  # noqa: E402

C = 8


def _fixture():
    rng = np.random.RandomState(21)
    B, G = 2, 6
    gts = np.stack([np.stack([
        rng.uniform(20, 100, G), rng.uniform(20, 100, G),
        rng.uniform(18, 70, G), rng.uniform(12, 60, G),
        rng.uniform(-np.pi / 2 + 0.05, np.pi / 2 - 0.05, G),
    ], -1) for _ in range(B)]).astype(np.float32)
    labels = rng.randint(0, C, (B, G)).astype(np.int64)
    mask = np.ones((B, G), bool)
    mask[1, 4:] = False
    return gts, labels, mask, rng


def test_retina_loss_oracle(ref_coders):  # noqa: F811
    from sm3det_tpu.models.dense_heads.rotated_retina_head import (
        make_retina_anchor_generator, make_retina_coder, retina_loss)
    from sm3det_tpu.ops.rotated_iou import box_iou_rotated

    gts, labels, mask, rng = _fixture()
    strides = (8, 16)
    sizes = [(12, 12), (6, 6)]
    gen = make_retina_anchor_generator(strides)
    anchors_l = [np.asarray(a) for a in gen.grid_anchors(sizes)]
    anchors = np.concatenate(anchors_l, 0)          # (A, 5) rotated
    A = anchors.shape[0]
    na = anchors_l[0].shape[0] // (sizes[0][0] * sizes[0][1])

    cls_flat = rng.normal(0, 1, (2, A, C)).astype(np.float32)
    reg_flat = rng.normal(0, 0.4, (2, A, 5)).astype(np.float32)

    # ---- reference-side recomputation (torch)
    ref_coder = ref_coders["delta_xywha_rbbox_coder"].DeltaXYWHAOBBoxCoder(
        angle_range="le90", norm_factor=None, edge_swap=True,
        proj_xy=True, target_means=(0.,) * 5,
        target_stds=(1.,) * 5)

    ct = torch.tensor(cls_flat, requires_grad=True)
    rt = torch.tensor(reg_flat, requires_grad=True)
    tot_cls = rt.new_zeros(())
    tot_reg = rt.new_zeros(())
    n_pos_total = 0
    anchors_t = torch.tensor(anchors)
    for b in range(2):
        g = gts[b][mask[b]]
        ious = torch.tensor(np.asarray(box_iou_rotated(
            jnp.asarray(anchors), jnp.asarray(g))))
        assigned = _ref_max_iou_assign(ious, 0.5, 0.4, 0.0, True)
        pos = assigned > 0
        neg = assigned == 0
        n_pos_total += int(pos.sum())
        lab = torch.full((A,), C, dtype=torch.long)
        lab[pos] = torch.tensor(labels[b][mask[b]])[assigned[pos] - 1]
        # focal loss over assigned (pos|neg) anchors
        sel = pos | neg
        logits = ct[b][sel]
        onehot = torch.zeros_like(logits)
        lv = lab[sel]
        v = lv < C
        onehot[torch.arange(int(sel.sum()))[v], lv[v]] = 1.0
        p = logits.sigmoid()
        pt = (1 - p) * onehot + p * (1 - onehot)
        fw = (0.25 * onehot + 0.75 * (1 - onehot)) * pt.pow(2.0)
        tot_cls = tot_cls + (F.binary_cross_entropy_with_logits(
            logits, onehot, reduction="none") * fw).sum()
        # L1 on encoded deltas at positives
        gi = (assigned[pos] - 1).long()
        targets = ref_coder.encode(anchors_t[pos],
                                   torch.tensor(g)[gi])
        tot_reg = tot_reg + (rt[b][pos] - targets).abs().sum()
    ref_cls = tot_cls / max(n_pos_total, 1)
    ref_reg = tot_reg / max(n_pos_total, 1)
    (ref_cls + ref_reg).backward()
    ref_gc, ref_gr = ct.grad.numpy(), rt.grad.numpy()
    assert n_pos_total > 0

    # ---- ours
    def split(flat, ch):
        out, o = [], 0
        for (h, w) in sizes:
            n = h * w * na
            out.append(jnp.asarray(
                flat[:, o:o + n].reshape(2, h, w, na * ch)))
            o += n
        return out

    coder = make_retina_coder("le90")

    def fn(cf, rf):
        out = retina_loss(split(cf, C), split(rf, 5),
                          jnp.asarray(gts), jnp.asarray(labels),
                          jnp.asarray(mask), gen, coder, C,
                          reg_loss="l1")
        return out["loss_cls"], out["loss_bbox"]

    (o_cls, o_reg), vjp = jax.vjp(
        fn, jnp.asarray(cls_flat), jnp.asarray(reg_flat))
    g_cls, g_reg = vjp((jnp.ones(()), jnp.ones(())))

    np.testing.assert_allclose(float(o_cls), float(ref_cls), rtol=2e-4,
                               err_msg="retina loss_cls (focal)")
    np.testing.assert_allclose(float(o_reg), float(ref_reg), rtol=2e-4,
                               err_msg="retina loss_bbox (L1)")
    np.testing.assert_allclose(np.asarray(g_cls).reshape(ref_gc.shape),
                               ref_gc, rtol=2e-3, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_reg).reshape(ref_gr.shape),
                               ref_gr, rtol=2e-3, atol=1e-6)
