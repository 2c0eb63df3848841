#!/usr/bin/env python
"""A/B: joint-path throughput at the [2:1:1] bench composition vs a
doubled [4:2:2] batch — does batching amortize fixed per-dispatch cost?"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import copy

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from ptime import device_time  # noqa: E402

IMG = 800


def log(m):
    print(m, flush=True)


def main():
    from sm3det_tpu.models.detectors.trisource import (DEFAULT_MODEL_CFG,
                                                       TriSourceDetector)
    from sm3det_tpu.train.train_state import init_trisource

    cfg = copy.deepcopy(DEFAULT_MODEL_CFG)
    model_init = TriSourceDetector(cfg=cfg)
    cfg16 = copy.deepcopy(cfg)
    cfg16["compute_dtype"] = "bfloat16"
    model = TriSourceDetector(cfg=cfg16)

    rng = np.random.RandomState(0)
    g = 16

    def mk(n):
        return {"img": rng.rand(n, IMG, IMG, 3).astype(np.float32),
                "gt_obbs": np.zeros((n, g, 5), np.float32),
                "gt_bboxes": np.zeros((n, g, 4), np.float32),
                "gt_labels": np.zeros((n, g), np.int32),
                "gt_mask": np.ones((n, g), bool)}

    batch = {"sar": {k: v for k, v in mk(2).items() if k != "gt_obbs"},
             "rgb": {k: v for k, v in mk(1).items() if k != "gt_bboxes"},
             "ifr": {k: v for k, v in mk(1).items() if k != "gt_bboxes"}}
    params = init_trisource(jax.random.PRNGKey(0), model_init, batch)
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16)
        if p.dtype == jnp.float32 else p, params)
    v = {"params": params}

    def perturb(a, eps):
        return (a[0], a[1] + eps * 1e-9)

    import ast
    comps = ast.literal_eval(os.environ.get(
        "SM3DET_COMPS", "[(2,1,1),(4,2,2),(8,4,4)]"))
    for n_sar, n_rgb, n_ifr in comps:
        n = n_sar + n_rgb + n_ifr
        x = jnp.asarray(rng.rand(n, IMG, IMG, 3).astype(np.float32))

        def full(m, imgs, ns=n_sar, nr=n_rgb):
            return m.simple_test_joint(
                imgs[:ns], imgs[ns:ns + nr], imgs[ns + nr:], (IMG, IMG))

        dt = device_time(
            lambda vv, xx, f=full: model.apply(vv, xx, method=f),
            (v, x), iters=8, perturb=perturb)
        log(f"[{n_sar}:{n_rgb}:{n_ifr}]  {dt:8.2f} ms/iter   "
            f"{n / dt * 1000:6.1f} img/s")


if __name__ == "__main__":
    main()
