"""Pallas kernel tests (interpret mode on CPU; the TPU path is exercised
by bench/profiling runs — sums match the jnp oracle exactly)."""

import numpy as np

from sm3det_tpu.ops.pallas.rotated_iou_kernel import box_iou_rotated_pallas
from sm3det_tpu.ops.rotated_iou import box_iou_rotated


def test_pallas_iou_matches_oracle():
    rng = np.random.RandomState(0)
    n, m = 130, 70   # non-multiples of the 128 block
    def rand(k):
        return np.stack([
            rng.uniform(0, 400, k), rng.uniform(0, 400, k),
            rng.uniform(4, 60, k), rng.uniform(4, 60, k),
            rng.uniform(-1.5, 1.5, k)], -1).astype(np.float32)
    b1, b2 = rand(n), rand(m)
    got = np.asarray(box_iou_rotated_pallas(b1, b2, interpret=True))
    ref = np.asarray(box_iou_rotated(b1, b2))
    assert got.shape == (n, m)
    assert np.abs(got - ref).max() < 1e-3
