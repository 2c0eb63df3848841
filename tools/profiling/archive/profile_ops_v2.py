#!/usr/bin/env python
"""Device-true op micro-benchmarks (in-jit fori_loop timing, see
tools/ptime.py) for the hot post-processing ops at bench shapes."""
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

N = 2000
C = 256


def log(m):
    print(m, flush=True)


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

    dt = device_time(
        lambda r: roi_align_rotated_pyramid_fused(feats, r, 7),
        (rois,), iters=16)
    log(f"fused pyramid align N={N}: {dt:8.3f} ms")

    b1 = jnp.asarray(boxes(N))
    scores = jnp.asarray(rng.rand(N).astype(np.float32))
    dt = device_time(lambda b: nms_rotated(b, scores, 0.8, 2000)[0],
                     (b1,), iters=16)
    log(f"nms_rotated N={N}:       {dt:8.3f} ms")

    cls_scores = jnp.asarray(rng.rand(N, 27).astype(np.float32))
    dt = device_time(
        lambda b: multiclass_nms_rotated(b, cls_scores, 0.05, 0.1,
                                         2000)[0],
        (b1,), iters=16)
    log(f"multiclass_nms N={N}:    {dt:8.3f} ms")


if __name__ == "__main__":
    main()
