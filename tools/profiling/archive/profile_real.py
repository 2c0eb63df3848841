#!/usr/bin/env python
"""Real (value-forced) per-stage timings of the RCNN path on TPU."""
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


def t(name, fn, *args, n=5):
    f = jax.jit(lambda *a: jnp.sum(fn(*a)))
    _ = float(f(*args))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        _ = float(f(*args))
        times.append(time.perf_counter() - t0)
    print(f"{name:46s} med {np.median(times) * 1000:8.1f} ms", flush=True)


def main():
    rng = np.random.RandomState(0)
    from sm3det_tpu.ops.roi_align_rotated import roi_align_rotated
    from sm3det_tpu.models.roi_heads.oriented_roi_head import \
        extract_rotated_roi_feats
    from sm3det_tpu.ops.nms import nms as h_nms

    # neck features at 800px
    feats = [jax.device_put(
        rng.rand(1, 800 // s, 800 // s, 256).astype(np.float32))
        for s in (4, 8, 16, 32)]
    n_roi = 2000
    rois = np.stack([
        np.zeros(n_roi),
        rng.uniform(100, 700, n_roi), rng.uniform(100, 700, n_roi),
        rng.uniform(8, 120, n_roi), rng.uniform(8, 120, n_roi),
        rng.uniform(-1.5, 1.5, n_roi)], -1).astype(np.float32)
    rois = jax.device_put(rois)

    t("roi_align_rotated 2000 x 1 level",
      lambda f, r: roi_align_rotated(f, r, 7, 1 / 8.0), feats[1], rois)
    t("extract_rotated_roi_feats 2000 x 4lvl",
      lambda f0, f1, f2, f3, r: extract_rotated_roi_feats(
          [f0, f1, f2, f3], r), *feats, rois)

    # RPN nms (10000 candidates)
    boxes = jax.device_put(np.concatenate([
        rng.uniform(0, 700, (10000, 2)),
        rng.uniform(8, 120, (10000, 2))], -1).astype(np.float32))
    boxes = jnp.concatenate(
        [boxes[:, :2], boxes[:, :2] + boxes[:, 2:]], -1)
    scores = jax.device_put(rng.rand(10000).astype(np.float32))
    t("horizontal NMS 10000 cands", lambda b, s: h_nms(
        b, s, 0.8, max_out=2000)[0], boxes, scores)

    from sm3det_tpu.ops.nms import multiclass_nms_rotated
    obbs = jax.device_put(np.stack([
        rng.uniform(0, 800, 2000), rng.uniform(0, 800, 2000),
        rng.uniform(4, 60, 2000), rng.uniform(4, 60, 2000),
        rng.uniform(-1.5, 1.5, 2000)], -1).astype(np.float32))
    sc = jax.device_put(rng.rand(2000, 27).astype(np.float32))
    t("multiclass rotated NMS 2000", lambda b, s:
      multiclass_nms_rotated(b, s, 0.05, 0.1, 2000, pre_nms=2000)[0],
      obbs, sc)


if __name__ == "__main__":
    main()
