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
