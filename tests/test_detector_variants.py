"""TriSource variant + zoo detector smoke tests (tiny shapes, CPU)."""

import jax
import numpy as np
import pytest

from sm3det_tpu.models.detectors.trisource_variants import TriSourceVariant
from sm3det_tpu.models.detectors.zoo import (GFLDetector, OrientedRCNN,
                                             RotatedRetinaNet)

CFG = dict(
    num_classes=4,
    angle_version="le90",
    backbone=dict(type="ConvNeXt", arch="atto",
                  moe_block_inds=[[], [], [0], []],
                  num_experts=2, top_k=2, capacity_factor=2.0),
    neck=dict(in_channels=[40, 80, 160, 320], out_channels=32,
              num_outs=5, extra_level=1),
    sar=dict(strides=[8, 16, 32, 64, 128], reg_max=8,
             nms_pre=50, score_thr=0.05, nms_iou=0.6, max_per_img=20),
    rgb=dict(rpn_strides=[4, 8, 16, 32, 64],
             rpn_sample=32, rcnn_sample=32,
             rpn_nms_pre=64, rpn_max=64, rpn_nms_iou=0.8,
             rcnn_score_thr=0.05, rcnn_nms_iou=0.1, rcnn_max=20),
)

IMG = 64


def _batch(rng, g=4):
    def b4(n):
        cx = rng.uniform(16, IMG - 16, (n, g))
        cy = rng.uniform(16, IMG - 16, (n, g))
        w = rng.uniform(10, 28, (n, g))
        h = rng.uniform(10, 28, (n, g))
        return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                        -1).astype(np.float32)

    def b5(n):
        return np.stack([
            rng.uniform(16, IMG - 16, (n, g)),
            rng.uniform(16, IMG - 16, (n, g)),
            rng.uniform(12, 30, (n, g)),
            rng.uniform(8, 14, (n, g)),
            rng.uniform(-1.2, 1.2, (n, g))], -1).astype(np.float32)

    def pack(n, obb):
        return {
            "img": rng.rand(n, IMG, IMG, 3).astype(np.float32),
            ("gt_obbs" if obb else "gt_bboxes"):
                (b5(n) if obb else b4(n)),
            "gt_labels": rng.randint(0, 4, (n, g)).astype(np.int32),
            "gt_mask": np.ones((n, g), bool)}
    return {"sar": pack(2, False), "rgb": pack(1, True),
            "ifr": pack(1, True)}


RNGS = {"params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "moe_noise": jax.random.PRNGKey(2),
        "sampling": jax.random.PRNGKey(3)}
APPLY_RNGS = {"dropout": jax.random.PRNGKey(4),
              "moe_noise": jax.random.PRNGKey(5),
              "sampling": jax.random.PRNGKey(6)}


@pytest.mark.parametrize("sar_stages,rot_stages",
                         [(1, 1), (2, 1), (2, 2)])
def test_trisource_variant_losses(sar_stages, rot_stages):
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    model = TriSourceVariant(cfg=CFG, sar_stages=sar_stages,
                             rot_stages=rot_stages)
    variables = jax.jit(
        lambda b: model.init(RNGS, b, train=True))(batch)
    losses = model.apply(variables, batch, train=True, rngs=APPLY_RNGS)
    assert "gate_loss" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    # loss-name contract for DLA mapping
    assert "sar_loss_cls" in losses
    assert "rgb_loss_cls" in losses or "rgb_loss_cls" in losses
    if rot_stages == 2:
        assert "ifr_loss_rpn_cls" in losses


def test_zoo_oriented_rcnn():
    rng = np.random.RandomState(1)
    batch = _batch(rng)["rgb"]
    model = OrientedRCNN(cfg=CFG)
    variables = jax.jit(
        lambda b: model.init(RNGS, b, train=True))(batch)
    losses = model.apply(variables, batch, train=True, rngs=APPLY_RNGS)
    assert all(np.isfinite(float(v)) for v in losses.values())
    dets, labels, valid = model.apply(
        variables, batch["img"], (IMG, IMG), method="simple_test")
    assert dets.shape[-1] == 6


def test_zoo_retinanet_and_gfl():
    rng = np.random.RandomState(2)
    b = _batch(rng)
    model = RotatedRetinaNet(cfg=CFG)
    variables = jax.jit(
        lambda x: model.init(RNGS, x, train=True))(b["rgb"])
    losses = model.apply(variables, b["rgb"], train=True,
                         rngs=APPLY_RNGS)
    assert np.isfinite(float(losses["loss_cls"]))
    assert float(losses["loss_bbox"]) > 0   # big boxes -> positives exist

    gfl = GFLDetector(cfg=CFG)
    v2 = jax.jit(lambda x: gfl.init(RNGS, x, train=True))(b["sar"])
    l2 = gfl.apply(v2, b["sar"], train=True, rngs=APPLY_RNGS)
    assert np.isfinite(float(l2["loss_cls"]))


def test_r3det_losses():
    from sm3det_tpu.models.detectors.refine_detectors import R3Det
    rng = np.random.RandomState(3)
    b = _batch(rng)["rgb"]
    model = R3Det(cfg=CFG)
    variables = jax.jit(lambda x: model.init(RNGS, x, train=True))(b)
    losses = model.apply(variables, b, train=True, rngs=APPLY_RNGS)
    for k in ("s0_loss_cls", "s0_loss_bbox",
              "sr0_loss_cls", "sr0_loss_bbox"):
        assert k in losses and np.isfinite(float(losses[k])), k


def test_s2anet_odm_losses_and_orconv_params():
    from sm3det_tpu.models.detectors.refine_detectors import S2ANet
    rng = np.random.RandomState(4)
    b = _batch(rng)["rgb"]
    model = S2ANet(cfg=CFG)
    variables = jax.jit(lambda x: model.init(RNGS, x, train=True))(b)
    # the ODM refine head must carry the ORConv weight
    head = variables["params"]["refine_head0"]
    assert "or_conv" in head, sorted(head)
    # Cout = feat_channels // 8, single input orientation
    w = head["or_conv"]["weight"]
    assert w.shape == (3, 3, CFG["neck"]["out_channels"], 1,
                       CFG["neck"]["out_channels"] // 8)
    losses = model.apply(variables, b, train=True, rngs=APPLY_RNGS)
    for k in ("s0_loss_cls", "sr0_loss_cls", "sr0_loss_bbox"):
        assert k in losses and np.isfinite(float(losses[k])), k


def test_redet_equivariant_refpn_riroi():
    from sm3det_tpu.models.detectors.redet_roitrans import ReDet
    cfg = dict(
        num_classes=4, angle_version="le90",
        backbone=dict(stem_channels=4, stage_channels=(4, 8, 16, 32),
                      stage_blocks=(1, 1, 1, 1)),
        neck=dict(in_channels=[32, 64, 128, 256], out_channels=32,
                  num_outs=5),
    )
    rng = np.random.RandomState(5)
    b = _batch(rng)["rgb"]
    model = ReDet(cfg=cfg)
    variables = jax.jit(lambda x: model.init(RNGS, x, train=True))(b)
    # equivariant neck: lateral weights carry the (cin, o_in, cout) orbit
    neck = variables["params"]["neck"]
    assert "lateral0" in neck and "fpn_conv0" in neck
    assert neck["lateral0"]["weight"].shape[-2:] == (8, 4)  # (O_in, Cout)
    losses = model.apply(variables, b, train=True, rngs=APPLY_RNGS)
    for k in ("loss_rpn_cls", "loss_cls", "loss_bbox"):
        assert k in losses and np.isfinite(float(losses[k])), k


def test_refine_detectors_simple_test():
    from sm3det_tpu.models.detectors.refine_detectors import R3Det, S2ANet
    rng = np.random.RandomState(6)
    b = _batch(rng)["rgb"]
    for cls in (R3Det, S2ANet):
        model = cls(cfg=CFG)
        variables = jax.jit(lambda x: model.init(RNGS, x, train=True))(b)
        dets, labels, valid = model.apply(
            variables, b["img"], (IMG, IMG), method="simple_test",
            score_thr=0.0, max_per_img=20)
        assert dets.shape == (1, 20, 6)
        assert labels.shape == (1, 20)
        assert np.isfinite(np.asarray(dets)).all()
        assert int(np.asarray(valid).sum()) > 0   # score_thr=0 keeps some
