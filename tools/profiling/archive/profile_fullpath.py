#!/usr/bin/env python
"""Value-forced timing of each full inference path (as bench runs them)."""
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

IMG = 800


def main():
    import copy
    from sm3det_tpu.models.detectors.trisource import (DEFAULT_MODEL_CFG,
                                                       TriSourceDetector)
    from sm3det_tpu.train.train_state import init_trisource

    cfg = copy.deepcopy(DEFAULT_MODEL_CFG)
    model = TriSourceDetector(cfg=cfg)
    rng = np.random.RandomState(0)
    g = 16
    batch = {
        "sar": {"img": rng.rand(2, IMG, IMG, 3).astype(np.float32),
                "gt_bboxes": np.zeros((2, g, 4), np.float32),
                "gt_labels": np.zeros((2, g), np.int32),
                "gt_mask": np.ones((2, g), bool)},
        "rgb": {"img": rng.rand(1, IMG, IMG, 3).astype(np.float32),
                "gt_obbs": np.zeros((1, g, 5), np.float32),
                "gt_labels": np.zeros((1, g), np.int32),
                "gt_mask": np.ones((1, g), bool)},
        "ifr": {"img": rng.rand(1, IMG, IMG, 3).astype(np.float32),
                "gt_obbs": np.zeros((1, g, 5), np.float32),
                "gt_labels": np.zeros((1, g), np.int32),
                "gt_mask": np.ones((1, g), bool)},
    }
    params = init_trisource(jax.random.PRNGKey(0), model, batch)
    v = {"params": params}

    for name, method, img in (
            ("sar (2 img)", "simple_test_sar", batch["sar"]["img"]),
            ("rgb (1 img)", "simple_test_rgb", batch["rgb"]["img"]),
            ("ifr (1 img)", "simple_test_ifr", batch["ifr"]["img"])):
        x = jax.device_put(img)
        fn = jax.jit(lambda vv, xx, c: c + jnp.sum(model.apply(
            vv, xx, (IMG, IMG), method=method)[0]))
        c = jnp.zeros(())
        _ = float(fn(v, x, c))
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = float(fn(v, x, c))
            times.append(time.perf_counter() - t0)
        print(f"{name:14s} med {np.median(times) * 1000:8.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
