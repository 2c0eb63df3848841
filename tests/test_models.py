"""Model component tests on tiny shapes (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sm3det_tpu.models.backbones.convnext import ConvNeXtMoE
from sm3det_tpu.models.moe import MoELayer, cv_squared
from sm3det_tpu.models.necks.fpn import MultitaskFPN
from sm3det_tpu.models.dense_heads.gfl_head import GFLHead, integral
from sm3det_tpu.models.dense_heads.oriented_rpn_head import OrientedRPNHead
from sm3det_tpu.models.roi_heads.oriented_roi_head import (
    RotatedShared2FCBBoxHead, extract_rotated_roi_feats)


def test_cv_squared():
    x = jnp.array([1.0, 1.0, 1.0, 1.0])
    assert float(cv_squared(x)) == pytest.approx(0.0, abs=1e-6)
    y = jnp.array([4.0, 0.0, 0.0, 0.0])
    assert float(cv_squared(y)) > 1.0


def test_moe_layer_forward_and_balance():
    layer = MoELayer(dim=32, hidden=64, num_experts=4, top_k=2,
                     capacity_factor=2.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (128, 32))
    variables = layer.init(
        {"params": jax.random.PRNGKey(1),
         "moe_noise": jax.random.PRNGKey(2)}, x, train=True)
    y, aux = layer.apply(variables, x, train=True,
                         rngs={"moe_noise": jax.random.PRNGKey(3)})
    assert y.shape == x.shape
    assert jnp.isfinite(y).all()
    assert float(aux) >= 0.0
    # eval mode: deterministic, no noise rng needed
    y2, aux2 = layer.apply(variables, x, train=False)
    y3, _ = layer.apply(variables, x, train=False)
    assert jnp.allclose(y2, y3)


def test_moe_capacity_matches_dense_when_large():
    """With capacity_factor high enough no token is dropped; combine must
    equal the gate-weighted sum of expert outputs (dispatch correctness)."""
    layer = MoELayer(dim=16, hidden=32, num_experts=2, top_k=2,
                     noisy_gating=False, capacity_factor=4.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 16))
    variables = layer.init({"params": jax.random.PRNGKey(1)}, x)
    y, _ = layer.apply(variables, x, train=False)
    # with top_k == num_experts == 2, every token goes to both experts;
    # gates sum to 1, so output is a convex combo — check it's not trivial
    assert y.shape == x.shape
    assert float(jnp.abs(y).sum()) > 0


def test_moe_inv_gather_backward_matches_plain_gather(monkeypatch):
    """The scatter-free custom-VJP backward (_inv_gather) must produce
    the same MoE train-step gradients as XLA's AD of a plain gather —
    including when the low capacity_factor drops routes."""
    from sm3det_tpu.models import moe as moe_mod

    layer = MoELayer(dim=32, hidden=64, num_experts=4, top_k=2,
                     capacity_factor=1.0)   # forces drops
    x = jax.random.normal(jax.random.PRNGKey(0), (128, 32))
    w = jax.random.normal(jax.random.PRNGKey(5), (128, 32))
    variables = layer.init(
        {"params": jax.random.PRNGKey(1),
         "moe_noise": jax.random.PRNGKey(2)}, x, train=True)

    def loss(v, xx):
        y, aux = layer.apply(v, xx, train=True,
                             rngs={"moe_noise": jax.random.PRNGKey(3)})
        return jnp.sum(y * w) + aux

    gv1, gx1 = jax.grad(loss, argnums=(0, 1))(variables, x)
    # drop fraction must actually be nonzero for this to test drops
    _, inter = layer.apply(variables, x, train=True,
                           rngs={"moe_noise": jax.random.PRNGKey(3)},
                           mutable=["intermediates"])

    monkeypatch.setattr(moe_mod, "_inv_gather",
                        lambda xx, idx, inv_idx, inv_w: xx[idx])
    gv2, gx2 = jax.grad(loss, argnums=(0, 1))(variables, x)

    for a, b in zip(jax.tree.leaves(gv1), jax.tree.leaves(gv2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-5, atol=1e-5)


def test_bf16_dot_grads_match_einsum():
    """_bf16_dot's custom VJP must equal jax.grad of the plain einsum
    exactly at f32 (the casts are no-ops there) and to bf16 rounding at
    the policy dtype."""
    from sm3det_tpu.models.moe import _bf16_dot

    rng = np.random.RandomState(3)
    x32 = jnp.asarray(rng.randn(2, 8, 16).astype(np.float32))
    w32 = jnp.asarray(rng.randn(2, 16, 24).astype(np.float32))
    g32 = jnp.asarray(rng.randn(2, 8, 24).astype(np.float32))
    specs = ("ecd,edh->ech", "ech,edh->ecd", "ecd,ech->edh")

    def loss_c(x, w):
        return jnp.sum(_bf16_dot(*specs, x, w) * g32)

    def loss_r(x, w):
        return jnp.sum(jnp.einsum(
            specs[0], x, w, preferred_element_type=jnp.float32) * g32)

    for dtype, tol in ((jnp.float32, 1e-6), (jnp.bfloat16, 2e-2)):
        x, w = x32.astype(dtype), w32.astype(dtype)
        gc = jax.grad(loss_c, argnums=(0, 1))(x, w)
        gr = jax.grad(loss_r, argnums=(0, 1))(x, w)
        for a, b in zip(gc, gr):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
            assert rel < tol, (dtype, rel)


def test_convnext_moe_forward():
    model = ConvNeXtMoE(arch="atto", moe_block_inds=((), (), (0,), ()),
                        num_experts=4, top_k=2, multi_input=True)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "moe_noise": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, x, train=True)
    feats, gate_loss = model.apply(
        variables, x, train=True,
        rngs={"moe_noise": jax.random.PRNGKey(3),
              "dropout": jax.random.PRNGKey(4)})
    assert len(feats) == 4
    assert feats[0].shape == (2, 16, 16, 40)
    assert feats[3].shape == (2, 2, 2, 320)
    assert gate_loss is not None and jnp.isfinite(gate_loss)
    # no MoE -> gate_loss None
    plain = ConvNeXtMoE(arch="atto")
    v2 = plain.init({"params": jax.random.PRNGKey(0)}, x)
    feats2, gl2 = plain.apply(v2, x)
    assert gl2 is None


def test_multitask_fpn_dual_mode():
    """One param set serves both call modes with correct strides."""
    fpn = MultitaskFPN(in_channels=(16, 32, 64, 128), out_channels=8,
                       num_outs=5, extra_level=1)
    feats = [jnp.zeros((1, 64 // (2 ** i), 64 // (2 ** i), c))
             for i, c in enumerate((16, 32, 64, 128))]
    variables = fpn.init(jax.random.PRNGKey(0), feats,
                         start_level=1, add_extra_convs="on_output")
    # SAR mode: strides 8..128 => sizes 32,16,8,4,2 at base 64/str4... input
    # level0 is stride 4 (size 64); start_level=1 begins at stride 8
    sar = fpn.apply(variables, feats, start_level=1,
                    add_extra_convs="on_output")
    assert len(sar) == 5
    assert sar[0].shape[1] == 32 and sar[-1].shape[1] == 2
    # RCNN mode reuses the SAME params
    rcnn = fpn.apply(variables, feats, start_level=0,
                     add_extra_convs="on_output")
    assert len(rcnn) == 5
    assert rcnn[0].shape[1] == 64 and rcnn[-1].shape[1] == 4


def test_gfl_head_shapes_and_integral():
    head = GFLHead(num_classes=5, in_channels=8, feat_channels=8,
                   stacked_convs=1, reg_max=4, strides=(8, 16),
                   gn_groups=4)
    feats = [jnp.zeros((2, 16, 16, 8)), jnp.zeros((2, 8, 8, 8))]
    variables = head.init(jax.random.PRNGKey(0), feats)
    cls_scores, bbox_preds = head.apply(variables, feats)
    assert cls_scores[0].shape == (2, 16, 16, 5)
    assert bbox_preds[0].shape == (2, 16, 16, 4 * 5)
    # integral of a peaked distribution
    logits = jnp.zeros((1, 4 * 5)).at[0, 2].set(100.0)  # bin 2 of side 0
    d = integral(logits, 4)
    assert float(d[0, 0]) == pytest.approx(2.0, abs=1e-3)
    assert float(d[0, 1]) == pytest.approx(2.0, abs=0.6)  # uniform -> mean 2


def test_rpn_and_roi_head_shapes():
    rpn = OrientedRPNHead()
    feats = [jnp.zeros((1, 2 ** (4 - i), 2 ** (4 - i), 256))
             for i in range(3)]
    variables = rpn.init(jax.random.PRNGKey(0), feats)
    cls_out, reg_out = rpn.apply(variables, feats)
    assert cls_out[0].shape == (1, 16, 16, 3)
    assert reg_out[0].shape == (1, 16, 16, 18)

    head = RotatedShared2FCBBoxHead(num_classes=5, fc_out_channels=32)
    rf = jnp.zeros((10, 7, 7, 256))
    v = head.init(jax.random.PRNGKey(0), rf)
    cls_logits, reg = head.apply(v, rf)
    assert cls_logits.shape == (10, 6)
    assert reg.shape == (10, 5)


def test_roi_extractor_level_routing():
    feats = [jnp.ones((1, 2 ** (6 - i), 2 ** (6 - i), 4)) * (i + 1)
             for i in range(4)]    # level i has constant value i+1
    # small roi -> level 0; mid roi -> level 2 (in-bounds of the 256px img)
    rois = jnp.array([
        [0, 100, 100, 20, 20, 0.0],     # sqrt(400)=20 -> lvl0
        [0, 128, 128, 230, 220, 0.0],   # sqrt~225 -> lvl2
    ], jnp.float32)
    out = extract_rotated_roi_feats(
        feats, rois, out_size=3, featmap_strides=(4, 8, 16, 32))
    assert float(out[0].mean()) == pytest.approx(1.0, abs=1e-4)
    assert float(out[1].mean()) == pytest.approx(3.0, abs=0.05)
