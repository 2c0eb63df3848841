"""Benchmark: SM3Det-T joint 3-dataset inference images/sec/chip on TPU.

Runs the flagship TriSource model (ConvNeXt-T + 8-expert/top-3 grid MoE at
stages 2-3, MultitaskFPN, GFL + 2x Oriented R-CNN) on 800x800 inputs in the
training composition [2 SAR : 1 RGB : 1 IR], with ALL post-processing
(decode + static NMS) on device.

Measurement note: the dev environment reaches the chip through an RPC
tunnel with ~30 ms/call round-trip, so K inference steps are batched
inside ONE jitted ``lax.scan`` — one dispatch covers K*4 images, and the
time is read after materializing a small on-device summary. This measures
model+post-processing throughput (what a directly-attached TPU VM would
see), not tunnel latency.

vs_baseline: the reference repo publishes NO throughput numbers
(BASELINE.md); we normalize against an assumed 25 img/s for SM3Det-T
(487 GFLOPs) torch-fp16 inference on A100 — the north star is >=4x/chip.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__),
                                   ".jax_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

IMG = 800
K = 8                       # scan steps per dispatch
A100_ASSUMED_IPS = 25.0


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    import copy
    from sm3det_tpu.models.detectors.trisource import (DEFAULT_MODEL_CFG,
                                                       TriSourceDetector)
    from sm3det_tpu.train.train_state import init_trisource

    cfg = copy.deepcopy(DEFAULT_MODEL_CFG)
    model = TriSourceDetector(cfg=cfg)

    rng = np.random.RandomState(0)
    g = 16

    def mk(n):
        return {"img": rng.rand(n, IMG, IMG, 3).astype(np.float32),
                "gt_obbs": np.zeros((n, g, 5), np.float32),
                "gt_bboxes": np.zeros((n, g, 4), np.float32),
                "gt_labels": np.zeros((n, g), np.int32),
                "gt_mask": np.ones((n, g), bool)}

    batch = {"sar": {k: v for k, v in mk(2).items()
                     if k != "gt_obbs"},
             "rgb": {k: v for k, v in mk(1).items()
                     if k != "gt_bboxes"},
             "ifr": {k: v for k, v in mk(1).items()
                     if k != "gt_bboxes"}}

    log("initializing params (jitted)...")
    t0 = time.perf_counter()
    params = init_trisource(jax.random.PRNGKey(0), model, batch)
    jax.block_until_ready(params)
    log(f"init done in {time.perf_counter() - t0:.1f}s")
    variables = {"params": params}

    # K different input frames per modality, device-resident
    sar_in = jax.device_put(
        rng.rand(K, 2, IMG, IMG, 3).astype(np.float32))
    rgb_in = jax.device_put(
        rng.rand(K, 1, IMG, IMG, 3).astype(np.float32))
    ifr_in = jax.device_put(
        rng.rand(K, 1, IMG, IMG, 3).astype(np.float32))

    def one_step(carry, inputs):
        s_img, r_img, i_img = inputs
        d1, l1, v1 = model.apply(variables, s_img, (IMG, IMG),
                                 method="simple_test_sar")
        d2, l2, v2 = model.apply(variables, r_img, (IMG, IMG),
                                 method="simple_test_rgb")
        d3, l3, v3 = model.apply(variables, i_img, (IMG, IMG),
                                 method="simple_test_ifr")
        s = (jnp.sum(d1) + jnp.sum(d2) + jnp.sum(d3)
             + jnp.sum(v1) + jnp.sum(v2) + jnp.sum(v3))
        return carry + s, None

    @jax.jit
    def run_k(sar, rgb, ifr):
        total, _ = jax.lax.scan(one_step, jnp.zeros(()),
                                (sar, rgb, ifr))
        return total

    log("compiling scanned inference (K steps)...")
    t0 = time.perf_counter()
    out = float(run_k(sar_in, rgb_in, ifr_in))
    log(f"compile+first run in {time.perf_counter() - t0:.1f}s "
        f"(summary={out:.3f})")

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = float(run_k(sar_in, rgb_in, ifr_in))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    images = K * 4
    ips = images / dt
    log(f"{images} images in {dt:.3f}s over {len(times)} trials")

    print(json.dumps({
        "metric": "SM3Det-T joint 3-dataset inference images/sec/chip "
                  "(800x800, [2 SAR:1 RGB:1 IR], on-device NMS)",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / A100_ASSUMED_IPS, 3),
    }))


if __name__ == "__main__":
    main()
