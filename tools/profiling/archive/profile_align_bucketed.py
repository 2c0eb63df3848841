#!/usr/bin/env python
"""TPU: bucketed vs plain fused align at joint-path shapes
(2 images, 4000 RoIs, C=256)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from ptime import device_time  # noqa: E402

from sm3det_tpu.ops.pallas.roi_align_kernel import (  # noqa: E402
    roi_align_rotated_pyramid_fused,
    roi_align_rotated_pyramid_fused_bucketed)


def log(m):
    print(m, flush=True)


def main():
    rng = np.random.RandomState(0)
    bsz, c, img = 2, 256, 800
    strides = (4, 8, 16, 32)
    feats = [jnp.asarray(rng.rand(bsz, img // s, img // s, c)
                         .astype(np.float32)).astype(jnp.bfloat16)
             for s in strides]
    n = 4000
    # proposal-like size mix (RPN proposals are mostly small); the
    # small class fits the 16-cell patch (diag < 52 px), so the big
    # class (~600) stays under big_k=1024 and parity must be exact
    big = rng.rand(n) < 0.10
    w = np.where(big, rng.uniform(64, 400, n), rng.uniform(8, 36, n))
    h = np.where(big, rng.uniform(64, 400, n), rng.uniform(8, 36, n))
    rois = jnp.asarray(np.stack([
        rng.randint(0, bsz, n).astype(np.float32),
        rng.uniform(0, img, n), rng.uniform(0, img, n),
        w, h, rng.uniform(-1.5, 1.5, n)], -1).astype(np.float32))

    plain = np.asarray(
        roi_align_rotated_pyramid_fused(feats, rois, 7),
        np.float32)
    bucketed = np.asarray(
        roi_align_rotated_pyramid_fused_bucketed(feats, rois, 7),
        np.float32)
    rel = np.abs(plain - bucketed).max() / (np.abs(plain).max() + 1e-9)
    log(f"parity rel={rel:.2e}")

    def pert(a, eps):
        return (a[0], a[1] + eps * 1e-9)

    t_p = device_time(
        lambda f0, r: roi_align_rotated_pyramid_fused(
            (f0,) + tuple(feats[1:]), r, 7), (feats[0], rois),
        iters=8, perturb=pert)
    t_b = device_time(
        lambda f0, r: roi_align_rotated_pyramid_fused_bucketed(
            (f0,) + tuple(feats[1:]), r, 7), (feats[0], rois),
        iters=8, perturb=pert)
    log(f"plain    {t_p:7.2f} ms")
    log(f"bucketed {t_b:7.2f} ms  ({t_p / max(t_b, 1e-9):.2f}x)")


if __name__ == "__main__":
    main()
