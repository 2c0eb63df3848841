"""Eigen-CAM tool (tools/cam.py — parity with the reference's
``tools/cam`` EigenCAM-on-detector driver)."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_eigen_cam_math():
    from cam import eigen_cam
    rng = np.random.RandomState(0)
    # rank-1 feature map: activation = outer(spatial, channel) -> the
    # first PC projection must recover the spatial pattern exactly
    spatial = rng.rand(8, 6)
    chan = rng.rand(16)
    feat = spatial[..., None] * chan[None, None, :]
    cam = eigen_cam(feat.astype(np.float32))
    assert cam.shape == (8, 6)
    s = spatial - spatial.mean()
    s = np.maximum(s, 0)
    s = s / s.max()
    np.testing.assert_allclose(cam, s, atol=1e-5)
    # normalized output in [0, 1]
    cam2 = eigen_cam(rng.randn(10, 10, 32).astype(np.float32))
    assert cam2.min() >= 0.0 and cam2.max() <= 1.0 + 1e-6


def test_overlay_bounds():
    from cam import overlay
    img = np.full((4, 4, 3), 128, np.uint8)
    out = overlay(img, np.linspace(0, 1, 16).reshape(4, 4))
    assert out.dtype == np.uint8 and out.shape == (4, 4, 3)


@pytest.mark.slow
def test_cam_cli_smoke(tmp_path):
    out = str(tmp_path / "cam.png")
    env = dict(os.environ, SM3DET_CPU="1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "cam.py"),
         os.path.join(REPO, "configs", "smoke_tiny.py"), "--synthetic",
         "--source", "neck", "--level", "0", "--out-file", out],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert os.path.exists(out)
