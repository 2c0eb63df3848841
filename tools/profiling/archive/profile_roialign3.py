#!/usr/bin/env python
"""Time the fused Pallas RoI-align kernel vs the gather path at bench
sizes on the real TPU, plus the Pallas-IoU'd nms_rotated and blocked
greedy_keep."""
import os
import sys
import time

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

K = 8
N = 2000
C = 256


def log(m):
    print(m, flush=True)


def timed(name, fn, *args):
    fn = jax.jit(fn)
    c = float(fn(jnp.zeros(()), *args))
    t0 = time.perf_counter()
    cc = jnp.zeros(())
    for _ in range(K):
        cc = fn(cc, *args)
    _ = float(cc)
    dt = (time.perf_counter() - t0) / K * 1000
    log(f"{name:56s} {dt:9.2f} ms/iter")
    return dt


def main():
    from sm3det_tpu.ops.pallas.roi_align_kernel import \
        roi_align_rotated_pyramid_fused
    from sm3det_tpu.ops.nms import nms_rotated, multiclass_nms_rotated

    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.rand(1, 800 // s, 800 // s, C)
                         .astype(np.float32)).astype(jnp.bfloat16)
             for s in (4, 8, 16, 32)]

    def boxes(n):
        return np.stack([
            rng.uniform(50, 750, n), rng.uniform(50, 750, n),
            rng.uniform(10, 120, n), rng.uniform(8, 60, n),
            rng.uniform(-1.5, 1.5, n)], -1).astype(np.float32)

    rois = jnp.asarray(np.concatenate(
        [np.zeros((N, 1), np.float32), boxes(N)], -1))

    timed("FUSED pallas pyramid align (N=2000)",
          lambda c, r: jnp.sum(roi_align_rotated_pyramid_fused(
              feats, r + c * 1e-9, 7).astype(jnp.float32)) * 1e-6 + c,
          rois)

    b1 = jnp.asarray(boxes(N))
    scores = jnp.asarray(rng.rand(N).astype(np.float32))
    timed("nms_rotated full (pallas IoU + blocked keep)",
          lambda c, b, s: c + jnp.sum(nms_rotated(
              b + c * 1e-9, s, 0.8, 2000)[0]), b1, scores)

    cls_scores = jnp.asarray(rng.rand(N, 27).astype(np.float32))
    timed("multiclass_nms_rotated (pallas IoU + blocked keep)",
          lambda c, b, s: c + jnp.sum(multiclass_nms_rotated(
              b + c * 1e-9, s, 0.05, 0.1, 2000)[0]), b1, cls_scores)


if __name__ == "__main__":
    main()
