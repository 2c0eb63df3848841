#!/usr/bin/env python
"""Optimization experiments: new IoU kernel, backbone variants, bf16."""
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
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:45s} {(time.perf_counter() - t0) / n * 1000:9.1f} ms",
          flush=True)
    return out


def main():
    rng = np.random.RandomState(0)

    # --- IoU kernels -------------------------------------------------------
    from sm3det_tpu.ops.rotated_iou import (box_iou_rotated_chunked,
                                            obb_corners,
                                            rotated_intersection_area,
                                            rotated_intersection_area_sorted)
    n = 2000
    boxes = np.stack([rng.uniform(0, 800, n), rng.uniform(0, 800, n),
                      rng.uniform(4, 60, n), rng.uniform(4, 60, n),
                      rng.uniform(-1.5, 1.5, n)], -1).astype(np.float32)
    iou_new = jax.jit(lambda b: box_iou_rotated_chunked(b, b, row_chunk=256))
    t("rotated IoU 2000x2000 (sort-free)", iou_new, boxes)

    from sm3det_tpu.ops.nms import multiclass_nms_rotated, nms_rotated
    scores = rng.uniform(0, 1, (n, 27)).astype(np.float32)
    mc = jax.jit(lambda b, s: multiclass_nms_rotated(
        b, s, 0.05, 0.1, 2000, pre_nms=2000))
    t("multiclass rotated NMS 2000 (new IoU)", mc, boxes, scores)

    # --- backbone variants -------------------------------------------------
    from sm3det_tpu.models.backbones.convnext import ConvNeXtMoE
    img = rng.rand(1, 800, 800, 3).astype(np.float32)

    def bench_backbone(name, model, x):
        p = jax.jit(lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, x, train=False))()
        fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
        t(name, fn, p, x)

    moe = ConvNeXtMoE(arch="tiny",
                      moe_block_inds=((), (), (0, 2, 4, 6, 8), (0, 2)),
                      num_experts=8, top_k=3, multi_input=True)
    bench_backbone("convnext-t MoE fp32", moe, img)

    plain = ConvNeXtMoE(arch="tiny", multi_input=True)
    bench_backbone("convnext-t plain fp32", plain, img)

    # bf16 input+params
    p32 = jax.jit(lambda: plain.init(
        {"params": jax.random.PRNGKey(0)}, img, train=False))()
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p32)
    img16 = img.astype(jnp.bfloat16)
    fn16 = jax.jit(lambda v, x: plain.apply(v, x, train=False))
    t("convnext-t plain bf16", fn16, p16, img16)

    # dw conv isolation
    x0 = rng.rand(1, 200, 200, 96).astype(np.float32)
    k = rng.rand(7, 7, 1, 96).astype(np.float32)
    dw = jax.jit(lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", feature_group_count=96,
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    t("dw7x7 conv 200x200x96 fp32", dw, x0, k)

    x1 = rng.rand(1, 200, 200, 96).astype(np.float32)
    w1 = rng.rand(96, 384).astype(np.float32)
    mm = jax.jit(lambda x, w: jnp.einsum("bhwc,cd->bhwd", x, w))
    t("pw 96->384 200x200 fp32", mm, x1, w1)


if __name__ == "__main__":
    main()
