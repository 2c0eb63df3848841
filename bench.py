"""Benchmark: SM3Det-T joint 3-dataset inference images/sec/chip on TPU.

Runs the flagship TriSource model (ConvNeXt-T + 8-expert/top-3 grid MoE at
stages 2-3, MultitaskFPN, GFL + 2x Oriented R-CNN) on 800x800 inputs in the
throughput composition [8 SAR : 4 RGB : 4 IR] (the training ratio at the
measured batching sweet spot, tools/profiling/profile_batch8.py), with ALL
post-processing (decode + static NMS) on device.

Measurement note: the dev environment reaches the chip through an RPC
tunnel with ~30 ms/call round-trip, so K steps per modality run as
carry-chained jit calls and the time is read after materializing one
on-device summary scalar — this measures model+post-processing
throughput (what a directly-attached TPU VM would see), not tunnel
latency.

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
K = int(os.environ.get("SM3DET_BENCH_K", "8"))  # scan steps/dispatch
# throughput composition: [8 SAR : 4 RGB : 4 IR] per iteration (batch
# 16) — the measured batching sweet spot (tools/profiling/profile_batch8.py:
# 75.8 img/s at [2:1:1], 88.9 at [8:4:4], 90.1 at [16:8:8]); keeps the
# training ratio. Override with SM3DET_BENCH_COMP=2,1,1.
COMP = tuple(int(v) for v in
             os.environ.get("SM3DET_BENCH_COMP", "8,4,4").split(","))
A100_ASSUMED_IPS = 25.0


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    import copy
    from sm3det_tpu.models.detectors.trisource import (DEFAULT_MODEL_CFG,
                                                       TriSourceDetector)
    from sm3det_tpu.train.train_state import init_trisource

    cfg = copy.deepcopy(DEFAULT_MODEL_CFG)
    model_init = TriSourceDetector(cfg=cfg)
    # production inference policy: bf16 conv/matmul path on the MXU
    # (norm stats fp32 via flax; decode/NMS cast back to fp32 inside the
    # detector), fp32 master params cast once below. Opt out with
    # SM3DET_BENCH_DTYPE=float32.
    dtype = os.environ.get("SM3DET_BENCH_DTYPE", "bfloat16")
    cfg16 = copy.deepcopy(cfg)
    if dtype != "float32":
        cfg16["compute_dtype"] = dtype
    model = TriSourceDetector(cfg=cfg16)

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
    params = init_trisource(jax.random.PRNGKey(0), model_init, batch)
    jax.block_until_ready(params)
    log(f"init done in {time.perf_counter() - t0:.1f}s")
    if dtype != "float32":
        params = jax.tree.map(
            lambda p: p.astype(dtype) if p.dtype == jnp.float32 else p,
            params)
    variables = {"params": params}

    # per-path jits, each running its K frames inside ONE dispatch via
    # lax.fori_loop (3 dispatches per measurement): host-side call
    # chaining cannot amortize the tunnel's per-dispatch issue cost
    # (~4-6 ms/call, measured with a no-op pallas kernel in
    # tools/profiling/archive/profile_roialign_steps.py), which would inflate the
    # measurement by ~20%. A scan over the JOINT graph still overwhelms
    # the remote compiler; per-path loops compile fine. Opt back into
    # call chaining with SM3DET_BENCH_CHAINED=1.
    chained = os.environ.get("SM3DET_BENCH_CHAINED") == "1"
    # joint mixed-batch path (one dispatch/iter, dual-stream batched
    # post-processing) is the default; SM3DET_BENCH_JOINT=0 falls back
    # to the three per-path dispatches.
    joint = (os.environ.get("SM3DET_BENCH_JOINT", "1") == "1"
             and not chained)

    def summarize(out, carry):
        d, l, valid = out
        return carry + jnp.sum(d) + jnp.sum(valid)

    def make_fn(method):
        def one(v, x, c):
            return summarize(model.apply(
                v, x, (IMG, IMG), method=method), c)

        if chained:
            return jax.jit(one)

        def looped(v, xs, c):
            def body(i, carry):
                return one(v, jax.lax.dynamic_index_in_dim(
                    xs, i, keepdims=False), carry + i * 1e-12)
            return jax.lax.fori_loop(0, K, body, c)
        return jax.jit(looped)

    sar_fn = make_fn("simple_test_sar")
    rgb_fn = make_fn("simple_test_rgb")
    ifr_fn = make_fn("simple_test_ifr")

    # K device-resident input frames per modality
    n_sar, n_rgb, n_ifr = COMP
    sar_in = jax.device_put(
        rng.rand(K, n_sar, IMG, IMG, 3).astype(np.float32))
    rgb_in = jax.device_put(
        rng.rand(K, n_rgb, IMG, IMG, 3).astype(np.float32))
    ifr_in = jax.device_put(
        rng.rand(K, n_ifr, IMG, IMG, 3).astype(np.float32))

    @jax.jit
    def joint_fn(v, sar_xs, rgb_xs, ifr_xs, c0):
        def body(i, carry):
            outs = model.apply(
                v,
                jax.lax.dynamic_index_in_dim(sar_xs, i, keepdims=False),
                jax.lax.dynamic_index_in_dim(rgb_xs, i, keepdims=False),
                jax.lax.dynamic_index_in_dim(ifr_xs, i, keepdims=False),
                (IMG, IMG), method="simple_test_joint")
            for out in outs:
                carry = summarize(out, carry)
            return carry + i * 1e-12
        return jax.lax.fori_loop(0, K, body, c0)

    def run_k():
        c = jnp.zeros(())
        if chained:
            for i in range(K):
                c = sar_fn(variables, sar_in[i], c)
                c = rgb_fn(variables, rgb_in[i], c)
                c = ifr_fn(variables, ifr_in[i], c)
        elif joint:
            c = joint_fn(variables, sar_in, rgb_in, ifr_in, c)
        else:
            c = sar_fn(variables, sar_in, c)
            c = rgb_fn(variables, rgb_in, c)
            c = ifr_fn(variables, ifr_in, c)
        return float(c)

    log("compiling per-path inference...")
    t0 = time.perf_counter()
    out = run_k()
    log(f"compile+first run in {time.perf_counter() - t0:.1f}s "
        f"(summary={out:.3f})")

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run_k()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    images = K * sum(COMP)
    ips = images / dt
    log(f"{images} images in {dt:.3f}s over {len(times)} trials")

    print(json.dumps({
        "metric": "SM3Det-T joint 3-dataset inference images/sec/chip "
                  f"(800x800, [{n_sar} SAR:{n_rgb} RGB:{n_ifr} IR], "
                  "bf16 compute, on-device NMS)",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / A100_ASSUMED_IPS, 3),
    }))


def main_train():
    """Train-throughput bench contract (VERDICT r4 item 4): flagship
    SM3Det-T train step — full MoE (e8k3) + DLA + AdamW, bf16 compute
    policy — at the measured-best batch composition [4:2:2] @ 800px
    (docs/PERF.md round-4 batch scaling: 38.5 img/s device-time at
    batch 8; batch 16 adds +4.7% at 2x activation memory). Emits ONE
    JSON line: images/sec/chip, wall-clock through the tunnel with
    chained donated steps (amortizes the dispatch floor), value-fetch
    timed. vs_baseline normalizes to the round-4 measured 38.5 img/s —
    the number this contract defends (the reference publishes no train
    throughput)."""
    import copy

    from sm3det_tpu.models.detectors.trisource import (DEFAULT_MODEL_CFG,
                                                       TriSourceDetector)
    from sm3det_tpu.train.dla import make_dla_config
    from sm3det_tpu.train.optim import make_optimizer
    from sm3det_tpu.train.train_state import (TrainState, build_train_step,
                                              init_trisource)

    comp = tuple(int(v) for v in
                 os.environ.get("SM3DET_TRAIN_COMP", "4,2,2").split(","))
    steps = int(os.environ.get("SM3DET_TRAIN_STEPS", "10"))
    dtype = os.environ.get("SM3DET_BENCH_DTYPE", "bfloat16")
    g = 16

    cfg = copy.deepcopy(DEFAULT_MODEL_CFG)
    model_init = TriSourceDetector(cfg=cfg)
    cfg16 = copy.deepcopy(cfg)
    if dtype != "float32":
        cfg16["compute_dtype"] = dtype
    model = TriSourceDetector(cfg=cfg16)

    rng = np.random.RandomState(0)

    def mk(n, obb):
        out = {"img": rng.rand(n, IMG, IMG, 3).astype(np.float32),
               "gt_labels": rng.randint(0, 26, (n, g)).astype(np.int32),
               "gt_mask": np.ones((n, g), bool)}
        if obb:
            out["gt_obbs"] = np.stack([
                rng.uniform(25, IMG - 25, (n, g)),
                rng.uniform(25, IMG - 25, (n, g)),
                rng.uniform(10, 60, (n, g)),
                rng.uniform(6, 30, (n, g)),
                rng.uniform(-1.2, 1.2, (n, g))], -1).astype(np.float32)
        else:
            cx = rng.uniform(20, IMG - 20, (n, g))
            cy = rng.uniform(20, IMG - 20, (n, g))
            w = rng.uniform(8, 60, (n, g))
            h = rng.uniform(8, 60, (n, g))
            out["gt_bboxes"] = np.stack(
                [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                -1).astype(np.float32)
        return out

    batch = {"sar": mk(comp[0], False), "rgb": mk(comp[1], True),
             "ifr": mk(comp[2], True)}

    log(f"initializing flagship train state (comp={comp})...")
    t0 = time.perf_counter()
    params = init_trisource(jax.random.PRNGKey(0), model_init, batch,
                            source_ratio=comp)
    jax.block_until_ready(params)
    log(f"init done in {time.perf_counter() - t0:.1f}s")

    dla_cfg = make_dla_config(warmup_iters=500)
    init_fn, update_fn, _ = make_optimizer(
        base_lr=1e-4, step_iters=(80000,), warmup_iters=500,
        dla_cfg=dla_cfg)
    state = TrainState(params=params, opt=init_fn(params),
                      rng=jax.random.PRNGKey(1))
    step = build_train_step(model, init_fn, update_fn, source_ratio=comp)
    jstep = jax.jit(step, donate_argnums=(0,))

    batch_dev = jax.device_put(batch)
    log("compiling train step...")
    t0 = time.perf_counter()
    state, metrics = jstep(state, batch_dev)
    loss0 = float(metrics["loss"])          # value fetch forces execution
    log(f"compile+first step in {time.perf_counter() - t0:.1f}s "
        f"(loss={loss0:.4f})")

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = jstep(state, batch_dev)
        lossv = float(metrics["loss"])      # materialize the chain
        times.append(time.perf_counter() - t0)
    dt = min(times)
    images = steps * sum(comp)
    ips = images / dt
    log(f"{images} images in {dt:.3f}s over {len(times)} trials "
        f"(loss={lossv:.4f})")

    print(json.dumps({
        "metric": "SM3Det-T flagship train step images/sec/chip "
                  f"(800x800, [{comp[0]} SAR:{comp[1]} RGB:{comp[2]} IR],"
                  " bf16 compute, MoE e8k3 + DLA + AdamW)",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / 38.5, 3),
    }))


if __name__ == "__main__":
    if "--train" in sys.argv:
        main_train()
    else:
        main()
