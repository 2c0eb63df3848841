"""FCOS / RepPoints / GV / CSL component tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sm3det_tpu.core.bbox.angle_coder import CSLCoder
from sm3det_tpu.core.bbox.gv_coders import GVFixCoder, GVRatioCoder
from sm3det_tpu.models.dense_heads.oriented_reppoints_head import (
    OrientedRepPointsHead, reppoints_loss)
from sm3det_tpu.models.dense_heads.rotated_fcos_head import (
    DistanceAnglePointCoder, RotatedFCOSHead, fcos_loss)
from sm3det_tpu.models.roi_heads.cascade_heads import gv_decode
from sm3det_tpu.ops.box_convert import obb2xyxy
from sm3det_tpu.ops.rotated_iou import box_iou_rotated


def _rand_obbs(rng, n, lo=50, hi=200):
    return np.stack([
        rng.uniform(lo, hi, n), rng.uniform(lo, hi, n),
        rng.uniform(20, 60, n), rng.uniform(8, 18, n),
        rng.uniform(-1.4, 1.4, n)], -1).astype(np.float32)


def test_distance_angle_coder_roundtrip():
    rng = np.random.RandomState(0)
    obbs = _rand_obbs(rng, 16)
    pts = obbs[:, :2] + rng.uniform(-3, 3, (16, 2)).astype(np.float32)
    coder = DistanceAnglePointCoder("le90")
    dec = coder.decode(jnp.asarray(pts),
                       coder.encode(jnp.asarray(pts), jnp.asarray(obbs)))
    iou = box_iou_rotated(jnp.asarray(obbs), dec, aligned=True)
    assert float(iou.min()) > 0.999


def test_gv_coder_roundtrip():
    rng = np.random.RandomState(1)
    obbs = _rand_obbs(rng, 16)
    hbb = obb2xyxy(jnp.asarray(obbs), "le90")
    fix = GVFixCoder("le90").encode(jnp.asarray(obbs))
    ratio = GVRatioCoder("le90").encode(jnp.asarray(obbs))
    dec = gv_decode(hbb, fix, ratio * 0)   # force polygon path
    iou = box_iou_rotated(jnp.asarray(obbs), dec, aligned=True)
    assert float(iou.min()) > 0.999


def test_csl_coder():
    coder = CSLCoder("le90", omega=1, radius=6)
    angles = jnp.asarray([-1.2, 0.0, 0.7, 1.3])
    enc = coder.encode(angles)
    assert enc.shape == (4, 180)
    dec = coder.decode(enc)
    assert np.abs(np.asarray(dec) - np.asarray(angles)).max() < \
        np.deg2rad(1.0)


def test_fcos_head_loss_finite():
    rng = np.random.RandomState(2)
    head = RotatedFCOSHead(num_classes=4, feat_channels=16,
                           stacked_convs=1, gn_groups=4, strides=(8, 16))
    feats = [jnp.zeros((1, 8, 8, 16)), jnp.zeros((1, 4, 4, 16))]
    v = head.init(jax.random.PRNGKey(0), feats)
    outs = head.apply(v, feats)
    gts = _rand_obbs(rng, 3, lo=16, hi=48)[None]
    losses = fcos_loss(*outs, gts,
                       rng.randint(0, 4, (1, 3)).astype(np.int32),
                       np.ones((1, 3), bool), 4, strides=(8, 16))
    assert all(np.isfinite(float(x)) for x in losses.values())
    assert float(losses["loss_bbox"]) > 0


def test_reppoints_head_loss_finite():
    rng = np.random.RandomState(3)
    head = OrientedRepPointsHead(num_classes=4, feat_channels=16,
                                 stacked_convs=1, gn_groups=4)
    feats = [jnp.zeros((1, 8, 8, 16)), jnp.zeros((1, 4, 4, 16))]
    v = head.init(jax.random.PRNGKey(0), feats)
    cls_s, init_o, refine_o = head.apply(v, feats)
    gts = _rand_obbs(rng, 3, lo=16, hi=48)[None]
    losses = reppoints_loss(
        cls_s, init_o, refine_o, gts,
        rng.randint(0, 4, (1, 3)).astype(np.int32),
        np.ones((1, 3), bool), 4, strides=(8, 16))
    assert all(np.isfinite(float(x)) for x in losses.values())
