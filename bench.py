"""Benchmark: SM3Det-T joint 3-dataset inference images/sec/chip on TPU.

Runs the flagship TriSource model (ConvNeXt-T + 8-expert/top-3 grid MoE at
stages 2-3, MultitaskFPN, GFL + 2x Oriented R-CNN) on 800x800 inputs in the
training composition [2 SAR : 1 RGB : 1 IR] and reports end-to-end
images/sec on one chip (includes decode + static NMS post-processing on
device — no host round-trips).

vs_baseline: the reference repo publishes NO throughput numbers
(BASELINE.md); we normalize against an assumed 25 img/s for SM3Det-T
(487 GFLOPs) torch-fp16 inference on A100 — the north star is >=4x that
per chip.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__),
                                   ".jax_cache"))

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

IMG = 800
A100_ASSUMED_IPS = 25.0


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
    import sys

    def log(msg):
        print(f"# {msg}", file=sys.stderr, flush=True)

    log("initializing params (jitted)...")
    t = time.perf_counter()
    params = init_trisource(jax.random.PRNGKey(0), model, batch)
    jax.block_until_ready(params)
    log(f"init done in {time.perf_counter() - t:.1f}s")
    variables = {"params": params}

    sar_fn = jax.jit(lambda v, x: model.apply(
        v, x, (IMG, IMG), method="simple_test_sar"))
    rgb_fn = jax.jit(lambda v, x: model.apply(
        v, x, (IMG, IMG), method="simple_test_rgb"))
    ifr_fn = jax.jit(lambda v, x: model.apply(
        v, x, (IMG, IMG), method="simple_test_ifr"))

    sar_img = batch["sar"]["img"]
    rgb_img = batch["rgb"]["img"]
    ifr_img = batch["ifr"]["img"]

    # warmup / compile (persistent cache amortizes across runs)
    for name, fn, img in (("sar", sar_fn, sar_img),
                          ("rgb", rgb_fn, rgb_img),
                          ("ifr", ifr_fn, ifr_img)):
        t = time.perf_counter()
        jax.block_until_ready(fn(variables, img))
        log(f"{name} path compiled+warm in {time.perf_counter() - t:.1f}s")

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        o1 = sar_fn(variables, sar_img)
        o2 = rgb_fn(variables, rgb_img)
        o3 = ifr_fn(variables, ifr_img)
    jax.block_until_ready((o1, o2, o3))
    dt = time.perf_counter() - t0
    images = iters * (2 + 1 + 1)
    ips = images / dt

    print(json.dumps({
        "metric": "SM3Det-T joint 3-dataset inference images/sec/chip "
                  "(800x800, [2 SAR:1 RGB:1 IR], on-device NMS)",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / A100_ASSUMED_IPS, 3),
    }))


if __name__ == "__main__":
    main()
