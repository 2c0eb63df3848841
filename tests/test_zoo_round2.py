"""Round-2 zoo completions: SimpleFPN, CSL-FCOS head, KFIoU refine-head
variants, dataset wrappers, and the sort-based MoE dispatch semantics."""

import jax
import jax.numpy as jnp
import numpy as np


def test_simple_fpn_shapes():
    """SimpleFPN (``mmrotate/models/necks/simpleFPN.py``): one stride-16
    map -> strides (4, 8, 16, 32) + extra stride-64 max-pool."""
    from sm3det_tpu.models.necks.fpn import SimpleFPN

    neck = SimpleFPN(backbone_channel=64, out_channels=32, num_outs=5)
    x = jnp.zeros((1, 16, 16, 64))
    p = neck.init(jax.random.PRNGKey(0), x)
    outs = neck.apply(p, x)
    assert len(outs) == 5
    assert [o.shape[1] for o in outs] == [64, 32, 16, 8, 4]
    assert all(o.shape[-1] == 32 for o in outs)


def test_csl_fcos_head_loss_finite():
    from sm3det_tpu.models.dense_heads.rotated_fcos_head import (
        CSLRotatedFCOSHead, csl_fcos_loss)

    head = CSLRotatedFCOSHead(num_classes=5, feat_channels=32,
                              stacked_convs=1, gn_groups=8,
                              strides=(8, 16, 32, 64, 128))
    feats = [jnp.ones((1, 32 // (2 ** i), 32 // (2 ** i), 32))
             for i in range(5)]
    p = head.init(jax.random.PRNGKey(0), feats)
    cls_s, reg_s, ang_s, ctr_s = head.apply(p, feats)
    assert ang_s[0].shape[-1] == 180   # le90 omega=1 coding_len
    g = 4
    gts = jnp.asarray(np.array(
        [[[100, 100, 60, 30, 0.3]] * g], np.float32))
    labels = jnp.zeros((1, g), jnp.int32)
    mask = jnp.ones((1, g), bool)
    losses = csl_fcos_loss(cls_s, reg_s, ang_s, ctr_s, gts, labels, mask,
                           num_classes=5)
    assert set(losses) == {"loss_cls", "loss_bbox", "loss_angle",
                           "loss_centerness"}
    for v in losses.values():
        assert bool(jnp.isfinite(v)), losses


def test_kfiou_refine_variant_loss_finite():
    """R3Det/S2ANet with cfg['refine_reg_loss']='kfiou' — the KFIoU
    refine-head variants (``kfiou_odm_refine_head.py``,
    ``kfiou_rotate_retina_refine_head.py``)."""
    from sm3det_tpu.models.detectors.refine_detectors import R3Det

    cfg = dict(num_classes=4, angle_version="le90",
               refine_reg_loss="kfiou",
               backbone=dict(arch="atto", moe_block_inds=((),) * 4,
                             num_experts=2, top_k=1),
               neck=dict(in_channels=(40, 80, 160, 320), out_channels=32,
                         num_outs=5, extra_level=1))
    model = R3Det(cfg=cfg, refine_head_type="odm")
    rng = np.random.RandomState(0)
    batch = {
        "img": jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32)),
        "gt_obbs": jnp.asarray(np.array(
            [[[60, 60, 40, 20, 0.2], [30, 90, 24, 12, -0.4]]],
            np.float32)),
        "gt_labels": jnp.zeros((1, 2), jnp.int32),
        "gt_mask": jnp.ones((1, 2), bool),
    }
    p = model.init({"params": jax.random.PRNGKey(0),
                    "moe_noise": jax.random.PRNGKey(1)}, batch,
                   train=False)
    losses = model.apply(p, batch, train=False)
    assert any(k.startswith("sr0_") for k in losses)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), (k, v)


def test_dataset_wrappers():
    from sm3det_tpu.data.datasets import (ClassBalancedDataset,
                                          ConcatDataset, RepeatDataset,
                                          SyntheticDetDataset)

    d = SyntheticDetDataset(n=6, seed=0)
    c = ConcatDataset([d, SyntheticDetDataset(n=4, seed=1)])
    assert len(c) == 10
    # index 7 maps to the second dataset's local index 1
    assert np.allclose(c.get_raw(7)["obbs"],
                       SyntheticDetDataset(n=4, seed=1).get_raw(1)["obbs"])
    r = RepeatDataset(d, 3)
    assert len(r) == 18
    assert np.allclose(r.get_raw(13)["obbs"], d.get_raw(1)["obbs"])
    b = ClassBalancedDataset(d, oversample_thr=0.9)
    assert len(b) >= len(d)   # rare classes oversampled


def test_moe_sort_dispatch_matches_sequential_rule(monkeypatch):
    """Sort-based CAPACITY dispatch keeps the cumsum-order drop
    contract: the (pos+1)-th occurrence of an expert in flat order
    takes bucket slot pos; overflow (pos >= capacity) is dropped.
    (The round-5 default inference path is the no-drop grouped GEMM —
    tests/test_moe_groupgemm.py — so the capacity path is pinned here
    via its env knob; it remains the training dispatcher.)"""
    from sm3det_tpu.models.moe import MoELayer

    monkeypatch.setenv("SM3DET_MOE_GROUPGEMM", "0")
    rng = np.random.RandomState(0)
    n, d = 64, 16
    layer = MoELayer(dim=d, hidden=32, num_experts=4, top_k=2,
                     gating="linear", noisy_gating=False,
                     capacity_factor=0.5)
    x = jnp.asarray(rng.rand(n, d).astype(np.float32))
    p = layer.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    (y, aux), inter = layer.apply(p, x, train=False,
                                  mutable=["intermediates"])
    ids = np.asarray(inter["intermediates"]["expert_ids"][0]).reshape(-1)
    drop = float(np.asarray(inter["intermediates"]["drop_fraction"][0]))
    cap = max(int(np.ceil(n * 2 / 4 * 0.5)), 4)
    seen, pos = {}, np.zeros_like(ids)
    for i, e in enumerate(ids):
        pos[i] = seen.get(e, 0)
        seen[e] = seen.get(e, 0) + 1
    assert abs(drop - float(np.mean(pos >= cap))) < 1e-6
    assert bool(np.isfinite(np.asarray(y)).all())


def test_gd_loss_bag_variants():
    """GDLoss bag parity (gaussian_dist_loss.py:330 BAG_GD_LOSS): jd is
    symmetric, symmax >= symmin, identical boxes give ~zero distance."""
    import jax.numpy as jnp
    from sm3det_tpu.models.losses import (
        BAG_GD_LOSS, jd_loss, kld_symmax_loss, kld_symmin_loss)

    assert set(BAG_GD_LOSS) == {"gwd", "kld", "jd", "kld_symmax",
                                "kld_symmin"}
    a = jnp.asarray([[50., 40., 30., 12., 0.4],
                     [10., 20., 8., 6., -0.7]])
    b = jnp.asarray([[52., 41., 28., 14., 0.3],
                     [11., 19., 9., 5., -0.5]])
    jab = jd_loss(a, b, fun="none")
    jba = jd_loss(b, a, fun="none")
    assert jnp.allclose(jab, jba, atol=1e-5)
    mx = kld_symmax_loss(a, b, fun="none")
    mn = kld_symmin_loss(a, b, fun="none")
    assert float(mx) >= float(mn) - 1e-6
    self_d = jd_loss(a, a, fun="none")
    assert float(self_d) < 0.05
    for name, fn in BAG_GD_LOSS.items():
        v = fn(a, b)
        assert jnp.isfinite(v), name


def test_gaussian2bbox_roundtrip():
    """gaussian2bbox (transforms.py:883): poly -> gt2gaussian -> SVD box
    reproduces the source geometry."""
    import numpy as np
    import jax.numpy as jnp
    from sm3det_tpu.ops.box_convert import (
        gaussian2bbox, obb2poly_np, poly2obb_np)
    from sm3det_tpu.models.losses import poly_gaussian

    obb = np.array([[50., 40., 30., 12., 0.4],
                    [80., 70., 22., 10., -1.1]], np.float32)
    poly = obb2poly_np(obb, "le90")
    mu, var = poly_gaussian(jnp.asarray(poly))
    back = poly2obb_np(np.asarray(gaussian2bbox(mu, var)), "le90")
    assert np.allclose(obb[:, :4], back[:, :4], atol=0.5)


def test_pseudo_anchor_generator():
    """PseudoAnchorGenerator (anchor_generator.py:55): valid-flag-only
    generator — one base anchor per level, grid_anchors raises."""
    import pytest
    from sm3det_tpu.core.anchor import PseudoAnchorGenerator

    gen = PseudoAnchorGenerator(strides=[8, 16, 32])
    assert gen.num_base_anchors == [1, 1, 1]
    assert gen.strides == [(8, 8), (16, 16), (32, 32)]
    with pytest.raises(NotImplementedError):
        gen.grid_anchors([(16, 16)])


def test_gd_loss_v1_bag():
    """GDLoss_v1 bag (gaussian_dist_loss_v1.py:170): bcd matches a
    textbook numpy Bhattacharyya computation; kld_v1 uses the same raw
    distance as kld (x2); all variants finite and in [0, 1)."""
    import numpy as np
    import jax.numpy as jnp
    from sm3det_tpu.models.losses import (
        BAG_GD_LOSS_V1, bcd_loss, obb2gaussian)

    assert set(BAG_GD_LOSS_V1) == {"gwd", "bcd", "kld"}
    a = jnp.asarray([[50., 40., 30., 12., 0.4]])
    b = jnp.asarray([[52., 41., 28., 14., 0.3]])

    # numpy textbook Bhattacharyya distance between the two box Gaussians
    mu_p, sp = (np.asarray(x)[0] for x in obb2gaussian(a))
    mu_t, st = (np.asarray(x)[0] for x in obb2gaussian(b))
    sig = 0.5 * (sp + st)
    d = (mu_p - mu_t)
    db = (0.125 * d @ np.linalg.inv(sig) @ d
          + 0.5 * np.log(np.linalg.det(sig)
                         / np.sqrt(np.linalg.det(sp) * np.linalg.det(st))))
    expected = 1 - 1 / (1.0 + np.log1p(max(db, 1e-6)))
    got = float(bcd_loss(a, b, fun="log1p", tau=1.0))
    assert abs(got - expected) < 1e-5, (got, expected)

    for name, fn in BAG_GD_LOSS_V1.items():
        v = float(fn(a, b))
        assert np.isfinite(v) and 0.0 <= v < 1.0, (name, v)
        self_v = float(fn(a, a))
        assert self_v <= v + 1e-6, (name, self_v, v)


def test_bc_convex_giou_loss_and_grad():
    """BCConvexGIoULoss (convex_giou_loss.py:118): finite value+grad,
    perfect-match point sets score lower than scattered ones, and the
    min_area_polygons gradient has no NaN from degenerate i==j pair
    directions (double-where regression)."""
    import jax, numpy as np
    import jax.numpy as jnp
    from sm3det_tpu.models.losses import bc_convex_giou_loss
    from sm3det_tpu.ops.geometry_extras import min_area_polygons

    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(10, 50, (4, 9, 2)).astype(np.float32))
    quad = jnp.asarray(np.tile(
        np.array([10., 10., 50., 10., 50., 50., 10., 50.], np.float32),
        (4, 1)))
    v, g = jax.value_and_grad(lambda p: bc_convex_giou_loss(p, quad))(pts)
    assert np.isfinite(float(v))
    assert bool(jnp.all(jnp.isfinite(g)))

    v_match = float(bc_convex_giou_loss(quad.reshape(4, 4, 2), quad))
    assert v_match < float(v)

    # direct NaN-grad regression on min_area_polygons
    g2 = jax.grad(lambda p: jnp.sum(min_area_polygons(p)))(pts)
    assert bool(jnp.all(jnp.isfinite(g2)))


def test_registry_reference_name_parity():
    """Every name the reference registers (mmrotate/models/*/__init__.py
    __all__ lists) resolves in the corresponding registry here."""
    from sm3det_tpu import models as m

    ref_backbones = [
        "ReResNet", "LSKNet", "ConvNeXt_moe_MultiInput",
        "ConvNeXt_DA_MultiInput", "ConvNeXt_moe", "VAN_moe",
        "VAN_moe_MultiInput", "VAN", "LSKNet_moe_MultiInput",
        "SwinTransformer_MoE", "InternViT", "InternViTAdapter"]
    ref_heads = [
        "RotatedAnchorHead", "RotatedRetinaHead", "RotatedRPNHead",
        "OrientedRPNHead", "RotatedRetinaRefineHead", "ODMRefineHead",
        "KFIoURRetinaHead", "KFIoURRetinaRefineHead",
        "KFIoUODMRefineHead", "RotatedRepPointsHead", "SAMRepPointsHead",
        "CSLRRetinaHead", "RotatedATSSHead", "RotatedAnchorFreeHead",
        "RotatedFCOSHead", "CSLRFCOSHead", "OrientedRepPointsHead"]
    ref_necks = ["ReFPN", "SimpleFPN", "MultitaskFPN"]
    ref_detectors = [
        "GlidingVertex", "OrientedRCNN", "R3Det", "ReDet",
        "RoITransformer", "RotatedFasterRCNN", "RotatedFCOS",
        "RotatedRepPoints", "RotatedRetinaNet", "S2ANet",
        "TriSourceDetector"]
    for name in ref_backbones:
        assert name in m.BACKBONES, name
    for name in ref_heads:
        assert name in m.HEADS, name
    for name in ref_necks:
        assert name in m.NECKS, name
    for name in ref_detectors:
        assert name in m.DETECTORS or name in ("TriSourceDetector",), name
    assert "TriSourceDetector" in m.DETECTORS
