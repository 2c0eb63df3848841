"""Device-trace the joint inference path and print the XLA-op cost table.

This is the maintained successor of the round-2 `/tmp/trace_joint.py`
recipe referenced by docs/PERF.md: jit the full `simple_test_joint` at the
bench composition, run N value-forced iterations inside
`jax.profiler.start_trace/stop_trace`, then aggregate the "XLA Ops" events
from the trace into a per-iteration cost table. Chained `fori_loop` probes
and host-side timing harnesses measure tunnel-floor artifacts (see
docs/PERF.md "Measurement methodology"); trace or end-to-end only.

Usage (TPU attached; NEVER kill the process once started):
    nohup python tools/profiling/trace_joint.py > /tmp/trace_joint.log 2>&1 &
"""

import collections
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
COMP = tuple(int(v) for v in
             os.environ.get("SM3DET_BENCH_COMP", "8,4,4").split(","))
ITERS = int(os.environ.get("SM3DET_TRACE_ITERS", "3"))
TRACE_DIR = os.environ.get("SM3DET_TRACE_DIR", "/tmp/jtrace")


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def build():
    import copy
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
    log("initializing params (jitted)...")
    params = init_trisource(jax.random.PRNGKey(0), model_init, batch)
    jax.block_until_ready(params)
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params)
    return model, {"params": params}


def group_name(name: str) -> str:
    """Collapse numbered HLO instances into one row per op family."""
    # pallas / custom-call kernels keep their kernel name
    m = re.search(r"(fused_[a-z0-9_]+|_iou_block_kernel|hbb_iou"
                  r"|roi_align[a-z0-9_]*|[a-z0-9_]*_kernel)", name)
    if m:
        return f"pallas:{m.group(1)}"
    base = re.sub(r"[.\d]+$", "", name)
    return base or name


def main():
    model, variables = build()
    rng = np.random.RandomState(1)
    n_sar, n_rgb, n_ifr = COMP
    sar = jnp.asarray(rng.rand(n_sar, IMG, IMG, 3).astype(np.float32))
    rgb = jnp.asarray(rng.rand(n_rgb, IMG, IMG, 3).astype(np.float32))
    ifr = jnp.asarray(rng.rand(n_ifr, IMG, IMG, 3).astype(np.float32))

    @jax.jit
    def step(v, s, r, f):
        outs = model.apply(v, s, r, f, (IMG, IMG),
                           method="simple_test_joint")
        c = jnp.zeros(())
        for d, l, valid in outs:
            c = c + jnp.sum(d) + jnp.sum(valid)
        return c

    log("compiling joint step...")
    t0 = time.perf_counter()
    out = float(step(variables, sar, rgb, ifr))
    log(f"compile+first run {time.perf_counter() - t0:.1f}s "
        f"(summary={out:.3f})")
    for _ in range(2):
        t0 = time.perf_counter()
        float(step(variables, sar, rgb, ifr))
        log(f"warm iter {time.perf_counter() - t0:.3f}s")

    os.makedirs(TRACE_DIR, exist_ok=True)
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(ITERS):
        float(step(variables, sar, rgb, ifr))
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
    # find pids whose process name mentions TPU / device
    xla_tids = set()
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
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
        dur = e.get("dur", 0) / 1e3 / ITERS   # us -> ms, per iter
        name = e.get("name", "?")
        by_group[group_name(name)] += dur
        by_name[name] += dur
        total += dur
    print(f"\n== XLA Ops, per-iteration device ms (total {total:.1f} ms, "
          f"{sum(COMP)} images => {sum(COMP) / total * 1e3:.1f} img/s "
          f"device-bound) ==")
    for g, ms in by_group.most_common(40):
        print(f"{ms:8.2f}  {g}")
    print("\n== top individual ops ==")
    for n, ms in by_name.most_common(30):
        print(f"{ms:8.2f}  {n}")
    print(f"\ntrace file: {path}")


if __name__ == "__main__":
    main()
