"""Zoo-completion tests: RotatedFasterRCNN, RepPoints variants,
RotatedATSS, and the new point-set losses (loss-shape + finite-loss,
VERDICT r1 item 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_detector_variants import APPLY_RNGS, CFG, IMG, RNGS, _batch


def _rgb_batch(seed=1):
    return _batch(np.random.RandomState(seed))["rgb"]


def test_rotated_faster_rcnn_losses():
    from sm3det_tpu.models.detectors.zoo_extra import RotatedFasterRCNN
    b = _rgb_batch(1)
    model = RotatedFasterRCNN(cfg=CFG)
    variables = jax.jit(lambda x: model.init(RNGS, x, train=True))(b)
    losses = model.apply(variables, b, train=True, rngs=APPLY_RNGS)
    for k in ("loss_rpn_cls", "loss_rpn_bbox", "loss_cls", "loss_bbox"):
        assert k in losses and np.isfinite(float(losses[k])), k
    assert float(losses["loss_bbox"]) > 0  # big boxes -> positives


@pytest.mark.parametrize("det_name,variant", [
    ("RotatedRepPoints", "rotated"),
    ("SAMRepPoints", "sam"),
    ("GRepPoints", "kld"),
])
def test_reppoints_variant_losses(det_name, variant):
    from sm3det_tpu.models import DETECTORS
    cls = DETECTORS.get(det_name)
    b = _rgb_batch(2)
    cfg = dict(CFG)
    if variant == "rotated":
        cfg["spatial_border"] = True
    model = cls(cfg=cfg)
    variables = jax.jit(lambda x: model.init(RNGS, x, train=True))(b)
    losses = model.apply(variables, b, train=True, rngs=APPLY_RNGS)
    for k in ("loss_cls", "loss_pts_init", "loss_pts_refine"):
        assert k in losses and np.isfinite(float(losses[k])), (
            k, losses.get(k))
    if variant == "rotated":
        assert "loss_spatial_init" in losses
        assert np.isfinite(float(losses["loss_spatial_init"]))


def test_rotated_atss_losses_and_assignment():
    from sm3det_tpu.models.detectors.zoo_extra import RotatedATSS
    b = _rgb_batch(3)
    model = RotatedATSS(cfg=CFG)
    variables = jax.jit(lambda x: model.init(RNGS, x, train=True))(b)
    losses = model.apply(variables, b, train=True, rngs=APPLY_RNGS)
    assert np.isfinite(float(losses["loss_cls"]))
    assert float(losses["loss_bbox"]) > 0  # ATSS found positives


def test_atss_obb_assign_semantics():
    """Anchors centered on a gt with high IoU must be positive; far
    anchors negative."""
    from sm3det_tpu.models.dense_heads.rotated_atss_head import \
        atss_obb_assign
    # 1-level toy: 4x4 grid of stride 16 anchors
    ys, xs = jnp.meshgrid((jnp.arange(4) + .5) * 16,
                          (jnp.arange(4) + .5) * 16, indexing="ij")
    centers = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1)
    gts = jnp.array([[24., 24., 30., 20., 0.1]])
    mask = jnp.ones((1,), bool)
    anchors = jnp.concatenate(
        [centers, jnp.full((16, 1), 16.), jnp.full((16, 1), 16.),
         jnp.zeros((16, 1))], -1)
    from sm3det_tpu.ops.rotated_iou import box_iou_rotated_chunked
    ious = box_iou_rotated_chunked(anchors, gts)
    assigned = atss_obb_assign(ious, centers, gts, mask, [16], topk=4)
    assigned = np.asarray(assigned)
    assert (assigned > 0).sum() >= 1
    # the positive anchors are near the gt center
    pos_centers = np.asarray(centers)[assigned > 0]
    assert np.all(np.linalg.norm(pos_centers - [24, 24], axis=1) < 30)


def test_kld_reppoints_loss_zero_at_match():
    """Points sampled exactly on the gt Gaussian (corners of the quad
    scaled to the same covariance) give near-minimal loss; displaced
    points give larger loss."""
    from sm3det_tpu.models.losses import kld_reppoints_loss, poly_gaussian
    quad = jnp.array([[10., 10., 50., 10., 50., 30., 10., 30.]])
    mu, var = poly_gaussian(quad)
    # 9 points matching mean/cov approximately: use scaled corner set
    k = 9
    rng = np.random.RandomState(0)
    z = rng.randn(1, k, 2).astype(np.float32)
    z = z - z.mean(1, keepdims=True)
    cov = np.asarray(var[0])
    L = np.linalg.cholesky(cov)
    zc = np.einsum("nki,ij->nkj", z, np.eye(2))
    # whiten then color to the target covariance
    zcov = np.einsum("nki,nkj->nij", z, z) / k
    W = np.linalg.inv(np.linalg.cholesky(zcov[0]))
    white = np.einsum("nki,ij->nkj", z, W.T)
    pts_match = jnp.asarray(
        np.einsum("nki,ij->nkj", white, L.T) + np.asarray(mu)[0])
    pts_off = pts_match + 40.0
    w = jnp.ones((1,))
    l_match = float(kld_reppoints_loss(pts_match, quad, w, 1.0))
    l_off = float(kld_reppoints_loss(pts_off, quad, w, 1.0))
    assert l_match < l_off
    # loss floor is 0.5 by construction: 1 - 1/(2+sqrt(KL->0))
    # (kld_reppoints_loss.py:60 clamps KL >= eps)
    assert l_match < 0.505


def test_spatial_border_loss_behavior():
    from sm3det_tpu.models.losses import spatial_border_loss
    quad = jnp.array([[0., 0., 40., 0., 40., 40., 0., 40.]])
    inside_pts = jnp.full((1, 9, 2), 20.0)
    outside_pts = jnp.full((1, 9, 2), 100.0)
    w = jnp.ones((1,))
    assert float(spatial_border_loss(inside_pts, quad, w)) == 0.0
    out = float(spatial_border_loss(outside_pts, quad, w))
    # 0.2 * dist((100,100),(20,20)) = 0.2*113.1
    assert abs(out - 0.2 * np.hypot(80, 80)) < 1e-3


def test_hbb_detectors_losses():
    """FasterRCNN / CascadeRCNN / RetinaNet (the sardet50k specialist
    families) produce finite losses on a tiny hbb batch."""
    from sm3det_tpu.models.detectors.hbb_detectors import (CascadeRCNN,
                                                           FasterRCNN,
                                                           RetinaNet)
    b = _batch(np.random.RandomState(5))["sar"]
    for cls, expect in [
            (FasterRCNN, ("loss_cls", "loss_bbox", "loss_rpn_cls")),
            (CascadeRCNN, ("s0_loss_cls", "s1_loss_cls", "s2_loss_cls")),
            (RetinaNet, ("loss_cls", "loss_bbox"))]:
        model = cls(cfg=CFG)
        variables = jax.jit(lambda x: model.init(RNGS, x, train=True))(b)
        losses = model.apply(variables, b, train=True, rngs=APPLY_RNGS)
        for k in expect:
            assert k in losses and np.isfinite(float(losses[k])), (
                cls.__name__, k)
