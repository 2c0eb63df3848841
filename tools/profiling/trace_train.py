"""Device-trace the flagship TRAIN step and print the XLA-op cost table.

Same recipe as trace_joint.py but for the full bf16-policy training
step (fwd + bwd + AdamW + DLA), batch [2 SAR:1 RGB:1 IR] @ 800^2 —
the configuration PERF.md's training-step table reports (149.8 ms).
Aggregates the "XLA Ops" trace rows per op family so the backward's
cost structure is visible (which conv/matmul transposes dominate).

Usage (TPU attached; NEVER kill the process once started):
    nohup python tools/profiling/trace_train.py > /tmp/trace_train.log 2>&1 &
"""

import collections
import copy
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", "..",
                                   ".jax_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

IMG = 800
ITERS = int(os.environ.get("SM3DET_TRACE_ITERS", "3"))
TRACE_DIR = os.environ.get("SM3DET_TRACE_DIR", "/tmp/jtrace_train")


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def group_name(name: str) -> str:
    m = re.search(r"(fused_[a-z0-9_]+|_iou_block_kernel|hbb_iou"
                  r"|roi_align[a-z0-9_]*|[a-z0-9_]*_kernel)", name)
    if m:
        return f"pallas:{m.group(1)}"
    base = re.sub(r"[.\d]+$", "", name)
    return base or name


def main():
    from sm3det_tpu.models.detectors.trisource import (DEFAULT_MODEL_CFG,
                                                       TriSourceDetector)
    from sm3det_tpu.train.optim import make_optimizer
    from sm3det_tpu.train.train_state import (TrainState, build_train_step,
                                              init_trisource)

    cfg = copy.deepcopy(DEFAULT_MODEL_CFG)
    model_init = TriSourceDetector(cfg=cfg)
    cfg16 = copy.deepcopy(cfg)
    cfg16["compute_dtype"] = "bfloat16"
    model = TriSourceDetector(cfg=cfg16)

    rng = np.random.RandomState(0)
    g = 16

    def mk(n, obb):
        d = {"img": rng.rand(n, IMG, IMG, 3).astype(np.float32),
             "gt_labels": rng.randint(0, 10, (n, g)).astype(np.int32),
             "gt_mask": np.ones((n, g), bool)}
        if obb:
            d["gt_obbs"] = np.stack([
                rng.uniform(100, 700, (n, g)), rng.uniform(100, 700, (n, g)),
                rng.uniform(20, 120, (n, g)), rng.uniform(10, 60, (n, g)),
                rng.uniform(-1.5, 1.5, (n, g))], -1).astype(np.float32)
        else:
            cx = rng.uniform(100, 700, (n, g))
            cy = rng.uniform(100, 700, (n, g))
            w = rng.uniform(20, 120, (n, g))
            h = rng.uniform(10, 60, (n, g))
            d["gt_bboxes"] = np.stack(
                [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                -1).astype(np.float32)
        return d

    comp = tuple(int(v) for v in os.environ.get(
        "SM3DET_TRACE_COMP", "2,1,1").split(","))
    nimg = sum(comp)
    batch = {"sar": mk(comp[0], False), "rgb": mk(comp[1], True),
             "ifr": mk(comp[2], True)}
    batch = jax.tree.map(jnp.asarray, batch)
    log("initializing params (jitted)...")
    params = init_trisource(jax.random.PRNGKey(0), model_init, batch,
                            source_ratio=comp)
    jax.block_until_ready(params)

    init_fn, update_fn, _ = make_optimizer(base_lr=1e-4, weight_decay=0.05)
    state = TrainState(params=params, opt=init_fn(params),
                       rng=jax.random.PRNGKey(1), prev_losses=None,
                       ema=None)
    step = build_train_step(model, init_fn, update_fn,
                            source_ratio=comp)

    @jax.jit
    def jstep(st, b):
        s2, m = step(st, b)
        return s2, m["loss"]

    log("compiling train step (bf16 policy)...")
    t0 = time.perf_counter()
    state, loss = jstep(state, batch)
    log(f"compile+first run {time.perf_counter() - t0:.1f}s "
        f"(loss={float(loss):.3f})")
    for _ in range(2):
        t0 = time.perf_counter()
        state, loss = jstep(state, batch)
        _ = float(loss)
        log(f"warm iter {time.perf_counter() - t0:.3f}s")

    os.makedirs(TRACE_DIR, exist_ok=True)
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(ITERS):
        state, loss = jstep(state, batch)
        _ = float(loss)
    jax.profiler.stop_trace()
    log("trace captured; parsing...")

    paths = sorted(glob.glob(os.path.join(
        TRACE_DIR, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        log("NO trace json found under " + TRACE_DIR)
        return
    path = paths[-1]
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    xla_tids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            if "XLA Ops" in e["args"].get("name", ""):
                xla_tids.add((e["pid"], e["tid"]))
    by_group = collections.Counter()
    by_name = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if (e.get("pid"), e.get("tid")) not in xla_tids:
            continue
        dur = e.get("dur", 0) / 1e3 / ITERS
        name = e.get("name", "?")
        by_group[group_name(name)] += dur
        by_name[name] += dur
        total += dur
    print(f"\n== TRAIN step XLA Ops, per-iteration device ms "
          f"(total {total:.1f} ms, {nimg} images => "
          f"{nimg / total * 1e3:.1f} img/s device-bound) ==")
    for gname, ms in by_group.most_common(50):
        print(f"{ms:8.2f}  {gname}")
    print("\n== top individual ops ==")
    for n, ms in by_name.most_common(40):
        print(f"{ms:8.2f}  {n}")
    print(f"\ntrace file: {path}")


if __name__ == "__main__":
    main()
