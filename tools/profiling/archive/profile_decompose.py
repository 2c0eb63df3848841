#!/usr/bin/env python
"""Stage decomposition of flagship inference on TPU, with VALUE-FORCED
timing (block_until_ready does not force remote execution through the
axon tunnel — only value fetches do; see CLAUDE.md).

Each stage is wrapped in a jit returning a scalar summary; K calls are
carry-chained and the final float() forces the chain, amortizing the
~30ms/call dispatch floor. Prints per-stage ms/iter for the bench
composition [2 SAR : 1 RGB : 1 IR] at 800x800 bf16.
"""
import copy
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

from sm3det_tpu.models.detectors.trisource import (DEFAULT_MODEL_CFG,
                                                   TriSourceDetector)
from sm3det_tpu.train.train_state import init_trisource

IMG = 800
K = 8


def log(m):
    print(m, flush=True)


def main():
    cfg = copy.deepcopy(DEFAULT_MODEL_CFG)
    cfg16 = copy.deepcopy(cfg)
    cfg16["compute_dtype"] = "bfloat16"
    model_init = TriSourceDetector(cfg=cfg)
    model = TriSourceDetector(cfg=cfg16)
    rng = np.random.RandomState(0)
    g = 16

    def mk(n, obb):
        d = {"img": rng.rand(n, IMG, IMG, 3).astype(np.float32),
             "gt_labels": np.zeros((n, g), np.int32),
             "gt_mask": np.ones((n, g), bool)}
        if obb:
            d["gt_obbs"] = np.zeros((n, g, 5), np.float32)
        else:
            d["gt_bboxes"] = np.zeros((n, g, 4), np.float32)
        return d

    batch = {"sar": mk(2, False), "rgb": mk(1, True), "ifr": mk(1, True)}
    log("init...")
    t0 = time.perf_counter()
    params = init_trisource(jax.random.PRNGKey(0), model_init, batch)
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16)
        if p.dtype == jnp.float32 else p, params)
    _ = float(jax.tree.leaves(params)[0].sum())
    log(f"init {time.perf_counter() - t0:.1f}s")
    v = {"params": params}

    sar_x = [jax.device_put(rng.rand(2, IMG, IMG, 3).astype(np.float32))
             for _ in range(K)]
    rgb_x = [jax.device_put(rng.rand(1, IMG, IMG, 3).astype(np.float32))
             for _ in range(K)]

    def timed(name, fn, inputs):
        """fn(v, x, carry) -> carry. Chain K calls; force with float()."""
        fn = jax.jit(fn)
        c = float(fn(v, inputs[0], jnp.zeros(())))  # compile+warm
        t0 = time.perf_counter()
        cc = jnp.zeros(())
        for i in range(K):
            cc = fn(v, inputs[i], cc)
        _ = float(cc)
        dt = (time.perf_counter() - t0) / K * 1000
        log(f"{name:44s} {dt:9.1f} ms/iter")
        return dt

    # ---- stages ----
    def backbone_only(v, x, c):
        feats, _ = model.apply(v, x, train=False,
                               method=lambda m, x, train: m.backbone(
                                   x, train=train))
        return c + sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    def backbone_neck(v, x, c):
        def run(m, x, train):
            feats, _ = m.backbone(x, train=train)
            return m.neck(list(feats), start_level=0,
                          add_extra_convs="on_output")
        outs = model.apply(v, x, train=False, method=run)
        return c + sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    def sar_full(v, x, c):
        d, l, val = model.apply(v, x, (IMG, IMG),
                                method="simple_test_sar")
        return c + jnp.sum(d) + jnp.sum(val)

    def rgb_full(v, x, c):
        d, l, val = model.apply(v, x, (IMG, IMG),
                                method="simple_test_rgb")
        return c + jnp.sum(d) + jnp.sum(val)

    def rgb_to_proposals(v, x, c):
        def run(m, x):
            feats, _ = m.backbone(x, train=False)
            fp = m.neck(list(feats), start_level=0,
                        add_extra_convs="on_output")
            from sm3det_tpu.models.dense_heads.oriented_rpn_head import \
                rpn_get_proposals
            from sm3det_tpu.models.detectors.trisource import (
                make_rpn_anchor_generator, make_rpn_coder)
            rpn_cls, rpn_reg = m.rgb_rpn_head(fp[:4])
            props, scores, valid = rpn_get_proposals(
                rpn_cls, rpn_reg, make_rpn_anchor_generator(),
                make_rpn_coder(cfg["angle_version"]), (IMG, IMG),
                nms_pre=cfg["rgb"]["rpn_nms_pre"],
                max_per_img=cfg["rgb"]["rpn_max"],
                iou_thr=cfg["rgb"]["rpn_nms_iou"])
            return props, scores
        p, s = model.apply(v, x, method=run)
        return c + jnp.sum(p.astype(jnp.float32)) + jnp.sum(s)

    timed("backbone (MoE, 4 imgs equiv: 2sar)", backbone_only, sar_x)
    timed("backbone+neck (2 imgs)", backbone_neck, sar_x)
    timed("SAR full (GFL decode+NMS, 2 imgs)", sar_full, sar_x)
    timed("RGB to proposals (RPN decode+NMS, 1 img)", rgb_to_proposals,
          rgb_x)
    timed("RGB full (ORCNN+rotated NMS, 1 img)", rgb_full, rgb_x)


if __name__ == "__main__":
    main()
