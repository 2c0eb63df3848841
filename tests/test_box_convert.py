"""Golden + roundtrip tests for rotated box conversions.

Fixture style mirrors the reference op tests (SURVEY.md §4): small
hand-written arrays with analytically known outputs, plus roundtrip
self-consistency across angle conventions.
"""

import numpy as np
import pytest

from sm3det_tpu.ops import (hbb2obb, norm_angle, obb2hbb, obb2poly, obb2xyxy,
                            poly2obb)


def test_norm_angle_le90():
    a = np.array([0.0, np.pi / 2, -np.pi / 2, np.pi, 2.1])
    out = np.asarray(norm_angle(a, "le90"))
    assert np.all(out >= -np.pi / 2 - 1e-6)
    assert np.all(out < np.pi / 2 + 1e-6)
    # equivalence mod pi
    assert np.allclose(np.sin(2 * out), np.sin(2 * a), atol=1e-5)


def test_norm_angle_le135():
    a = np.array([3.0, -3.0, 0.5])
    out = np.asarray(norm_angle(a, "le135"))
    assert np.all(out >= -np.pi / 4 - 1e-6)
    assert np.all(out < 3 * np.pi / 4 + 1e-6)


def test_obb2poly_axis_aligned():
    obb = np.array([[10.0, 20.0, 8.0, 4.0, 0.0]], np.float32)
    poly = np.asarray(obb2poly(obb, "le90")).reshape(4, 2)
    expected = {(6.0, 18.0), (14.0, 18.0), (14.0, 22.0), (6.0, 22.0)}
    got = {(round(float(x), 3), round(float(y), 3)) for x, y in poly}
    assert got == expected


def test_obb2poly_rotated_90deg():
    # rotating a wide box by pi/2 swaps the roles of w and h spatially
    obb = np.array([[0.0, 0.0, 8.0, 4.0, np.pi / 2]], np.float32)
    poly = np.asarray(obb2poly(obb, "le135")).reshape(4, 2)
    xs, ys = poly[:, 0], poly[:, 1]
    assert np.isclose(xs.max() - xs.min(), 4.0, atol=1e-4)
    assert np.isclose(ys.max() - ys.min(), 8.0, atol=1e-4)


@pytest.mark.parametrize("version", ["le90", "le135"])
def test_poly_obb_roundtrip(version):
    rng = np.random.RandomState(0)
    n = 64
    obbs = np.stack([
        rng.uniform(50, 700, n),
        rng.uniform(50, 700, n),
        rng.uniform(20, 100, n),
        rng.uniform(5, 19, n),      # h < w so long-edge is unambiguous
        rng.uniform(-np.pi / 2 + 0.01, np.pi / 2 - 0.01, n)
        if version == "le90" else
        rng.uniform(-np.pi / 4 + 0.01, 3 * np.pi / 4 - 0.01, n),
    ], axis=-1).astype(np.float32)
    poly = obb2poly(obbs, version)
    back = np.asarray(poly2obb(poly, version))
    assert np.allclose(back[:, :4], obbs[:, :4], atol=1e-2)
    # angle equal mod pi
    assert np.allclose(np.sin(2 * back[:, 4]), np.sin(2 * obbs[:, 4]),
                       atol=1e-3)
    assert np.allclose(np.cos(2 * back[:, 4]), np.cos(2 * obbs[:, 4]),
                       atol=1e-3)


def test_obb2xyxy():
    obb = np.array([[0.0, 0.0, 10.0, 4.0, 0.0],
                    [0.0, 0.0, 10.0, 4.0, np.pi / 2]], np.float32)
    out = np.asarray(obb2xyxy(obb, "le90"))
    assert np.allclose(out[0], [-5, -2, 5, 2], atol=1e-5)
    assert np.allclose(out[1], [-2, -5, 2, 5], atol=1e-5)


def test_hbb2obb_le90():
    hbb = np.array([[0.0, 0.0, 10.0, 4.0],     # wide: theta 0
                    [0.0, 0.0, 4.0, 10.0]],    # tall: swapped, theta -pi/2
                   np.float32)
    out = np.asarray(hbb2obb(hbb, "le90"))
    assert np.allclose(out[0], [5, 2, 10, 4, 0], atol=1e-5)
    assert np.allclose(out[1], [2, 5, 10, 4, -np.pi / 2], atol=1e-5)


def test_obb2hbb_oc_swaps_wh():
    # reference obb2hbb_oc writes (h, w) and theta = pi/2
    obb = np.array([[0.0, 0.0, 10.0, 4.0, 0.0]], np.float32)
    out = np.asarray(obb2hbb(obb, "oc"))[0]
    assert np.isclose(out[2], 4.0, atol=1e-5)   # h slot first
    assert np.isclose(out[3], 10.0, atol=1e-5)
    assert np.isclose(out[4], np.pi / 2, atol=1e-6)


def test_poly2obb_oc_range():
    rng = np.random.RandomState(1)
    n = 32
    obbs = np.stack([
        rng.uniform(100, 500, n), rng.uniform(100, 500, n),
        rng.uniform(20, 80, n), rng.uniform(5, 19, n),
        rng.uniform(0.05, np.pi / 2 - 0.05, n),
    ], axis=-1).astype(np.float32)
    poly = obb2poly(obbs, "oc")
    back = np.asarray(poly2obb(poly, "oc"))
    assert np.all(back[:, 4] >= 0)
    assert np.all(back[:, 4] <= np.pi / 2 + 1e-5)
    assert np.allclose(back[:, :2], obbs[:, :2], atol=1e-2)
    # w*h area preserved
    assert np.allclose(back[:, 2] * back[:, 3], obbs[:, 2] * obbs[:, 3],
                       rtol=1e-3)
