#!/usr/bin/env python
"""Careful timing: per-call block, value materialization, sanity checks."""
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


def t_block_each(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times = np.array(times) * 1000
    print(f"{name:42s} med {np.median(times):8.1f} ms  "
          f"min {times.min():8.1f}", flush=True)
    return out


def main():
    rng = np.random.RandomState(0)
    from sm3det_tpu.models.backbones.convnext import ConvNeXtMoE

    img = jax.device_put(rng.rand(1, 800, 800, 3).astype(np.float32))

    moe = ConvNeXtMoE(arch="tiny",
                      moe_block_inds=((), (), (0, 2, 4, 6, 8), (0, 2)),
                      num_experts=8, top_k=3, multi_input=True)
    p = jax.jit(lambda: moe.init(
        {"params": jax.random.PRNGKey(0)}, img, train=False))()
    jax.block_until_ready(p)
    fn = jax.jit(lambda v, x: moe.apply(v, x, train=False))
    out = t_block_each("backbone MoE fp32 (block each)", fn, p, img)
    feats = out[0]
    print("  feat0 mean:", float(jnp.mean(feats[0])),
          "shapes:", [f.shape for f in feats])

    # sum-reduced output (tiny transfer) to separate compute from fetch
    fn_sum = jax.jit(lambda v, x: sum(
        jnp.sum(f) for f in moe.apply(v, x, train=False)[0]))
    t_block_each("backbone MoE fp32 (sum output)", fn_sum, p, img)

    # bf16
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                       if a.dtype == jnp.float32 else a, p)
    img16 = img.astype(jnp.bfloat16)
    fn16_sum = jax.jit(lambda v, x: sum(
        jnp.sum(f) for f in moe.apply(v, x, train=False)[0]))
    t_block_each("backbone MoE bf16 (sum output)", fn16_sum, p16, img16)

    # IoU + NMS verification at scale
    from sm3det_tpu.ops.rotated_iou import box_iou_rotated_chunked
    from sm3det_tpu.ops.nms import multiclass_nms_rotated
    n = 2000
    boxes = jax.device_put(np.stack(
        [rng.uniform(0, 800, n), rng.uniform(0, 800, n),
         rng.uniform(4, 60, n), rng.uniform(4, 60, n),
         rng.uniform(-1.5, 1.5, n)], -1).astype(np.float32))
    iou_fn = jax.jit(lambda b: jnp.sum(box_iou_rotated_chunked(
        b, b, row_chunk=256)))
    out = t_block_each("rotated IoU 2000^2 (sum)", iou_fn, boxes)
    print("  iou sum:", float(out))

    scores = jax.device_put(
        rng.uniform(0, 1, (n, 27)).astype(np.float32))
    mc = jax.jit(lambda b, s: multiclass_nms_rotated(
        b, s, 0.05, 0.1, 2000, pre_nms=2000))
    out = t_block_each("multiclass rot NMS 2000", mc, boxes, scores)
    print("  kept:", int(np.asarray(out[2]).sum()))


if __name__ == "__main__":
    main()
