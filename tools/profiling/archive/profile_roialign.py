#!/usr/bin/env python
"""RoI-align gather strategy shootout on the real TPU.

The pyramid rotated RoI align at N=2000 costs ~25 ms/iter — 1.57M
(1,1,C) gathers. This times alternatives at identical sizes to pick the
TPU-native formulation:

  a. current production path (4x (1,1,C) advanced-indexing gathers)
  b. pure gather of precomputed indices (isolates gather cost)
  c. one gather of (2,2,C) patches (4x fewer descriptors)
  d. per-RoI 32x32 patch dynamic-slice + separable one-hot einsum (MXU)
"""
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
OUT = 7
G = 2
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
    from sm3det_tpu.ops.roi_align_rotated import roi_align_rotated_pyramid

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
    lvls = jnp.asarray(rng.randint(0, 4, N), jnp.int32)

    timed("a. production pyramid align (N=2000)",
          lambda c, r: jnp.sum(roi_align_rotated_pyramid(
              feats, r + c * 1e-9, lvls, OUT).astype(jnp.float32)) * 1e-6
          + c, rois)

    # flattened single-level stand-in for gather micro-tests
    sum_h = sum(800 // s for s in (4, 8, 16, 32))
    flat = jnp.asarray(rng.rand(sum_h * 200, C).astype(np.float32)
                       ).astype(jnp.bfloat16).reshape(sum_h, 200, C)
    P = N * OUT * G * OUT * G
    y_idx = jnp.asarray(rng.randint(0, sum_h - 1, (N, OUT, G, OUT, G)),
                        jnp.int32)
    x_idx = jnp.asarray(rng.randint(0, 199, (N, OUT, G, OUT, G)), jnp.int32)
    del P

    def pure_gather4(c, y0, x0):
        y0 = y0 + (c * 0).astype(jnp.int32)
        v = (flat[y0, x0] + flat[y0 + 1, x0] + flat[y0, x0 + 1]
             + flat[y0 + 1, x0 + 1])
        return c + jnp.sum(v.astype(jnp.float32)) * 1e-6

    timed("b. 4x (1,1,C) gathers only", pure_gather4, y_idx, x_idx)

    def patch22(c, y0, x0):
        y0 = y0 + (c * 0).astype(jnp.int32)
        start = jnp.stack([y0.reshape(-1), x0.reshape(-1)], -1)
        out = jax.lax.gather(
            flat, start,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1)),
            slice_sizes=(2, 2, C), mode="clip")
        return c + jnp.sum(out.astype(jnp.float32)) * 1e-6

    timed("c. one (2,2,C) patch gather", patch22, y_idx, x_idx)

    # d. per-RoI 32x32 patch + separable einsum
    PH = 32

    def patch_einsum(c, r):
        r = r + c * 1e-9
        stride = jnp.asarray([4., 8., 16., 32.])[lvls]
        inv = 1.0 / stride
        cx = r[:, 1] * inv - 0.5
        cy = r[:, 2] * inv - 0.5
        w = r[:, 3] * inv
        h = r[:, 4] * inv
        th = -r[:, 5]
        # patch origin (top-left), clamped
        oy = jnp.floor(cy - PH / 2).astype(jnp.int32)
        ox = jnp.floor(cx - PH / 2).astype(jnp.int32)
        start = jnp.stack([oy, ox], -1)
        patch = jax.lax.gather(
            flat, start,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1)),
            slice_sizes=(PH, PH, C), mode="clip")        # (N,32,32,C)
        # sample coords relative to patch origin
        g = G
        sub = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        ph = jnp.arange(OUT, dtype=jnp.float32)
        bh = h / OUT
        bw = w / OUT
        yy = (-h / 2)[:, None, None] + \
            (ph[None, :, None] + sub[None, None, :]) * bh[:, None, None]
        xx = (-w / 2)[:, None, None] + \
            (ph[None, :, None] + sub[None, None, :]) * bw[:, None, None]
        yy = yy[:, :, :, None, None]
        xx = xx[:, None, None, :, :]
        ct = jnp.cos(th)[:, None, None, None, None]
        st = jnp.sin(th)[:, None, None, None, None]
        y = (yy * ct + xx * st + cy[:, None, None, None, None]
             - oy.astype(jnp.float32)[:, None, None, None, None])
        x = (xx * ct - yy * st + cx[:, None, None, None, None]
             - ox.astype(jnp.float32)[:, None, None, None, None])
        y = y.reshape(N, -1)                              # (N, P)
        x = x.reshape(N, -1)
        y = jnp.clip(y, 0.0, PH - 1.0)
        x = jnp.clip(x, 0.0, PH - 1.0)
        y0 = jnp.floor(y)
        x0 = jnp.floor(x)
        fy = y - y0
        fx = x - x0
        iy = jax.lax.broadcasted_iota(jnp.float32, (1, 1, PH), 2)
        # (N, P, PH) two-tap row/col weight matrices
        ey = jnp.where(iy == y0[..., None], 1.0 - fy[..., None], 0.0) + \
            jnp.where(iy == y0[..., None] + 1.0, fy[..., None], 0.0)
        ex = jnp.where(iy == x0[..., None], 1.0 - fx[..., None], 0.0) + \
            jnp.where(iy == x0[..., None] + 1.0, fx[..., None], 0.0)
        gmat = jnp.einsum("npy,nyxc->npxc", ey.astype(jnp.bfloat16),
                          patch, preferred_element_type=jnp.float32)
        val = jnp.einsum("npx,npxc->npc", ex, gmat)
        pooled = val.reshape(N, OUT, g, OUT, g, C).mean(axis=(2, 4))
        return c + jnp.sum(pooled) * 1e-6

    timed("d. 32x32 patch slice + separable einsum", patch_einsum, rois)


if __name__ == "__main__":
    main()
