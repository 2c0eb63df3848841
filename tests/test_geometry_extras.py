"""Tier-B geometry op tests (golden-fixture style)."""

import numpy as np
import pytest

from sm3det_tpu.ops.geometry_extras import (box_iou_quadri,
                                            chamfer_distance,
                                            min_area_polygons, nms_quadri,
                                            points_in_polygons)
from sm3det_tpu.ops.orientation import (active_rotated_filter,
                                        riroi_align_rotated)
from sm3det_tpu.ops.ms_deform_attn import ms_deform_attn
import jax.numpy as jnp


def _poly_area(poly):
    xs, ys = poly[0::2], poly[1::2]
    return 0.5 * abs(np.sum(xs * np.roll(ys, -1) - ys * np.roll(xs, -1)))


def test_min_area_polygons_square():
    pts = np.array([[[0, 0], [2, 0], [2, 2], [0, 2], [1, 1]]], np.float32)
    poly = np.asarray(min_area_polygons(pts))[0]
    assert _poly_area(poly) == pytest.approx(4.0, abs=1e-4)


def test_min_area_polygons_rotated():
    # rotated rect corners + interior noise points
    rng = np.random.RandomState(0)
    ang = 0.7
    c, s = np.cos(ang), np.sin(ang)
    base = np.array([[-3, -1], [3, -1], [3, 1], [-3, 1]], np.float32)
    rect = base @ np.array([[c, s], [-s, c]], np.float32) + 10
    interior = rng.uniform(-0.5, 0.5, (4, 2)).astype(np.float32) + 10
    pts = np.concatenate([rect, interior])[None]
    poly = np.asarray(min_area_polygons(pts))[0]
    assert _poly_area(poly) == pytest.approx(12.0, rel=1e-2)


def test_points_in_polygons():
    quad = np.array([[0, 0, 4, 0, 4, 4, 0, 4]], np.float32)
    pts = np.array([[1, 1], [5, 5], [3.9, 0.1]], np.float32)
    got = np.asarray(points_in_polygons(pts, quad)).ravel()
    assert got.tolist() == [True, False, True]


def test_box_iou_quadri_and_nms():
    q1 = np.array([[0, 0, 4, 0, 4, 4, 0, 4],
                   [1, 1, 5, 1, 5, 5, 1, 5],
                   [10, 10, 14, 10, 14, 14, 10, 14]], np.float32)
    iou = np.asarray(box_iou_quadri(q1, q1))
    assert np.allclose(np.diag(iou), 1.0, atol=1e-4)
    assert iou[0, 2] == 0.0
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep_idx, valid = nms_quadri(q1, scores, 0.3, max_out=3)
    kept = np.asarray(keep_idx)[np.asarray(valid)]
    assert kept.tolist() == [0, 2]


def test_chamfer_distance():
    d1, d2 = chamfer_distance(
        jnp.asarray([[0., 0.], [1., 0.]]), jnp.asarray([[0., 1.]]))
    assert np.allclose(np.asarray(d1), [1.0, 2.0])
    assert np.allclose(np.asarray(d2), [1.0])


def test_active_rotated_filter_identity():
    w = np.random.RandomState(0).rand(3, 3, 16, 8).astype(np.float32)
    out = np.asarray(active_rotated_filter(jnp.asarray(w), 8))
    assert out.shape == (8, 3, 3, 16, 8)
    assert np.abs(out[0] - w).max() < 1e-5   # rotation 0 == identity


def test_riroi_align_shapes():
    f = np.random.RandomState(0).rand(1, 32, 32, 16).astype(np.float32)
    rois = np.array([[0, 64, 64, 40, 20, 0.3]], np.float32)
    out = np.asarray(riroi_align_rotated(
        jnp.asarray(f), jnp.asarray(rois), 7, 0.25, 8))
    assert out.shape == (1, 7, 7, 16)
    assert np.isfinite(out).all()


def test_ms_deform_attn_partition_of_unity():
    rng = np.random.RandomState(0)
    shapes = [(8, 8), (4, 4)]
    tot = sum(h * w for h, w in shapes)
    B, Q, NH, HD, P = 2, 5, 2, 4, 3
    value = np.ones((B, tot, NH, HD), np.float32) * 5.0
    loc = np.clip(rng.rand(B, Q, NH, len(shapes), P, 2), 0.2,
                  0.8).astype(np.float32)
    w = rng.rand(B, Q, NH, len(shapes), P).astype(np.float32)
    w = w / w.sum((-1, -2), keepdims=True)
    out = np.asarray(ms_deform_attn(value, shapes, loc, w))
    assert np.abs(out - 5.0).max() < 1e-5


def _arf_oracle(w, n_rot):
    """Numpy re-statement of the ARF CUDA scatter
    (active_rotated_filter_cuda_kernel.cuh:19-33):
    out[cout, r, cin, indices[l, r]] = w[cout, cin, l]."""
    from sm3det_tpu.ops.orientation import orconv_indices
    k, _, cin, o_in, cout = w.shape
    idx = orconv_indices(k, o_in, n_rot)
    src = np.transpose(w, (4, 2, 3, 0, 1)).reshape(cout, cin, -1)
    out = np.zeros((cout, n_rot, cin, o_in * k * k), w.dtype)
    for co in range(cout):
        for ci in range(cin):
            for l in range(o_in * k * k):
                for r in range(n_rot):
                    out[co, r, ci, idx[l, r]] = src[co, ci, l]
    return out


def test_arf_expand_matches_cuda_scatter_semantics():
    rng = np.random.RandomState(3)
    for o_in, n_rot in ((1, 8), (8, 8), (1, 4), (2, 2)):
        w = rng.rand(3, 3, 4, o_in, 6).astype(np.float32)
        from sm3det_tpu.ops.orientation import arf_expand
        got = np.asarray(arf_expand(jnp.asarray(w), n_rot))
        # got: (k, k, cin*o_in, cout*n_rot) with input dim (cin, o_in)
        # o_in-fastest and output dim (cout, R) R-fastest
        got2 = got.reshape(3, 3, 4, o_in, 6, n_rot)
        oracle = _arf_oracle(w, n_rot)   # (cout, R, cin, o_in*k*k)
        oracle = oracle.reshape(6, n_rot, 4, o_in, 3, 3)
        oracle = np.transpose(oracle, (4, 5, 2, 3, 0, 1))
        assert np.abs(got2 - oracle).max() < 1e-6, (o_in, n_rot)


def test_arf_90_degrees_is_rot90():
    """Rotation index 2 of 8 (90 deg) must equal an exact spatial rot90
    (clockwise) of the base kernel for single-orientation filters."""
    from sm3det_tpu.ops.orientation import arf_expand
    w = np.random.RandomState(5).rand(3, 3, 2, 1, 3).astype(np.float32)
    out = np.asarray(arf_expand(jnp.asarray(w), 8))
    out = out.reshape(3, 3, 2, 1, 3, 8)
    base = w[..., 0, :]                       # (k, k, cin, cout)
    got90 = out[..., 0, :, 2]
    want = np.rot90(base, k=-1, axes=(0, 1))  # clockwise 90
    assert np.abs(got90 - want).max() < 1e-6


def test_rotation_invariant_pool():
    from sm3det_tpu.ops.orientation import rotation_invariant_pool
    x = np.arange(2 * 2 * 2 * 16, dtype=np.float32).reshape(2, 2, 2, 16)
    out = np.asarray(rotation_invariant_pool(jnp.asarray(x), 8))
    assert out.shape == (2, 2, 2, 2)
    # orientation-fastest grouping: max of each contiguous 8-chunk
    assert np.allclose(out, x.reshape(2, 2, 2, 2, 8).max(-1))


def test_equivariant_conv_stack_c8_exact_at_90deg():
    """f(rot90(x)) == roll(rot90(f(x)), -2, orientation): a 2-layer
    EquivariantConv stack is an exact C8 group convolution at 90-degree
    multiples (one 90-deg step = 2 of the 8 orientation slots)."""
    import jax
    from flax import linen as nn
    from sm3det_tpu.models.backbones.re_resnet import (
        EquivariantConv, EquivariantLayerNorm)

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = EquivariantConv(4, 3, first_layer=True, name="lift")(x)
            x = jax.nn.relu(EquivariantLayerNorm(8, name="n1")(x))
            return EquivariantConv(6, 3, name="c2")(x)

    m = Stack()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 12, 12, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    y = np.asarray(m.apply(v, x))
    xr = jnp.asarray(np.rot90(np.asarray(x), 1, axes=(1, 2)).copy())
    yr = np.asarray(m.apply(v, xr))
    y_rot = np.rot90(y, 1, axes=(1, 2))
    co = y.shape[-1]
    yr5 = yr.reshape(yr.shape[:3] + (co // 8, 8))
    yrot5 = y_rot.reshape(yr5.shape)
    assert np.abs(np.roll(yrot5, -2, axis=-1) - yr5).max() < 1e-4


def test_orientation_align_integer_shift():
    """orientation_align at theta = r*2pi/O must be an exact cyclic roll."""
    from sm3det_tpu.ops.orientation import orientation_align
    rng = np.random.RandomState(1)
    p = rng.rand(2, 3, 3, 16).astype(np.float32)
    theta = np.array([2 * np.pi / 8 * 3, 0.0], np.float32)
    out = np.asarray(orientation_align(jnp.asarray(p), jnp.asarray(theta), 8))
    p5 = p.reshape(2, 3, 3, 2, 8)
    want0 = np.roll(p5[0], -3, axis=-1).reshape(3, 3, 16)
    assert np.abs(out[0] - want0).max() < 1e-6
    assert np.abs(out[1] - p[1]).max() < 1e-6
