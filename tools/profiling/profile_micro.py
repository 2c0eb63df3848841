#!/usr/bin/env python
"""Micro-profile of the RCNN-stage ops at bench sizes on the real TPU.

Times each op with carry-chained jit calls + a final value fetch
(block_until_ready does not force remote execution through the tunnel;
see CLAUDE.md). Sizes mirror the flagship 800x800 bench: 2000 RPN
proposals, 5-level FPN at strides (4..64), C=256.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
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


def log(m):
    print(m, flush=True)


def timed(name, fn, *args):
    """fn(c, *args) -> scalar carry. K chained calls, value-forced."""
    fn = jax.jit(fn)
    c = float(fn(jnp.zeros(()), *args))  # compile+warm
    t0 = time.perf_counter()
    cc = jnp.zeros(())
    for _ in range(K):
        cc = fn(cc, *args)
    _ = float(cc)
    dt = (time.perf_counter() - t0) / K * 1000
    log(f"{name:52s} {dt:9.2f} ms/iter")
    return dt


def main():
    from sm3det_tpu.ops.rotated_iou import box_iou_rotated_chunked
    from sm3det_tpu.ops.pallas.rotated_iou_kernel import box_iou_rotated_pallas
    from sm3det_tpu.ops.nms import nms_rotated, multiclass_nms_rotated, greedy_keep
    from sm3det_tpu.ops.roi_align_rotated import roi_align_rotated_pyramid

    rng = np.random.RandomState(0)

    def boxes(n):
        return jnp.asarray(np.stack([
            rng.uniform(50, 750, n), rng.uniform(50, 750, n),
            rng.uniform(10, 120, n), rng.uniform(8, 60, n),
            rng.uniform(-1.5, 1.5, n)], -1).astype(np.float32))

    b1 = boxes(N)
    scores = jnp.asarray(rng.rand(N).astype(np.float32))

    # carry perturbation keeps each call distinct
    timed("rotated IoU jnp chunked (2000x2000)",
          lambda c, b: c + jnp.sum(box_iou_rotated_chunked(
              b + c * 1e-9, b)), b1)
    timed("rotated IoU Pallas (2000x2000)",
          lambda c, b: c + jnp.sum(box_iou_rotated_pallas(
              b + c * 1e-9, b)), b1)

    def sup_only(c, b, s):
        order = jnp.argsort(-s)
        bs = b[order] + c * 1e-9
        iou = box_iou_rotated_chunked(bs, bs)
        return c + jnp.sum(iou)

    timed("argsort+IoU only (jnp, N=2000)", sup_only, b1, scores)

    def keep_only(c, b, s):
        sup = (jnp.abs(s[:, None] - s[None, :]) < 0.3)
        k = greedy_keep(sup, s > c * 1e-9)
        return c + jnp.sum(k.astype(jnp.float32))

    timed("greedy_keep fixpoint only (N=2000)", keep_only, b1, scores)

    timed("nms_rotated full (N=2000, max_out=2000)",
          lambda c, b, s: c + jnp.sum(nms_rotated(
              b + c * 1e-9, s, 0.8, 2000)[0]), b1, scores)

    cls_scores = jnp.asarray(rng.rand(N, 27).astype(np.float32))
    timed("multiclass_nms_rotated (N=2000,C=26,max=2000)",
          lambda c, b, s: c + jnp.sum(multiclass_nms_rotated(
              b + c * 1e-9, s, 0.05, 0.1, 2000)[0]), b1, cls_scores)

    # RoI align pyramid at bench shapes
    feats = [jnp.asarray(rng.rand(1, 800 // s, 800 // s, 256)
                         .astype(jnp.bfloat16)) for s in (4, 8, 16, 32)]
    rois = jnp.concatenate(
        [jnp.zeros((N, 1)), boxes(N)], axis=-1)
    lvls = jnp.asarray(rng.randint(0, 4, N), jnp.int32)
    timed("roi_align_rotated_pyramid (N=2000, 7x7, bf16)",
          lambda c, r: jnp.sum(roi_align_rotated_pyramid(
              feats, r + c * 1e-9, lvls, 7).astype(jnp.float32)) * 1e-6 + c,
          rois)

    # RCNN head matmuls: (2000, 12544) @ (12544, 1024) @ (1024, 1024)
    x = jnp.asarray(rng.rand(N, 7 * 7 * 256).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w1 = jnp.asarray(rng.rand(7 * 7 * 256, 1024).astype(np.float32)
                     ).astype(jnp.bfloat16) * 0.01
    w2 = jnp.asarray(rng.rand(1024, 1024).astype(np.float32)
                     ).astype(jnp.bfloat16) * 0.01

    def head(c, x):
        y = jnp.maximum(x + c.astype(jnp.bfloat16) * 1e-9, 0) @ w1
        y = jnp.maximum(y, 0) @ w2
        return c + jnp.sum(y.astype(jnp.float32)) * 1e-9

    timed("rcnn shared-FC head matmuls (bf16)", head, x)

    # RPN decode at bench size: 5 levels of anchors
    from sm3det_tpu.models.dense_heads.oriented_rpn_head import \
        rpn_get_proposals
    from sm3det_tpu.models.detectors.trisource import (
        make_rpn_anchor_generator, make_rpn_coder)
    rpn_cls = [jnp.asarray(rng.rand(1, 800 // s, 800 // s, 3)
                           .astype(np.float32)) for s in (4, 8, 16, 32, 64)]
    rpn_reg = [jnp.asarray(rng.rand(1, 800 // s, 800 // s, 18)
                           .astype(np.float32)) for s in (4, 8, 16, 32, 64)]

    def rpn(c, cls0):
        cls = [cls0 + c * 1e-9] + rpn_cls[1:]
        p, s, v = rpn_get_proposals(
            cls, rpn_reg, make_rpn_anchor_generator(),
            make_rpn_coder("le90"), (800, 800),
            nms_pre=2000, max_per_img=2000, iou_thr=0.8)
        return c + jnp.sum(p) + jnp.sum(s)

    timed("rpn_get_proposals (nms_pre=2000, max=2000)", rpn, rpn_cls[0])


if __name__ == "__main__":
    main()
