"""Source-attributed device-time breakdown: join the latest captured
trace (op name -> device ms) with the compiled HLO's per-instruction
metadata (op name -> jax op_name/source line), then aggregate.

Run after trace_joint.py (uses its TRACE_DIR output and the same jitted
step, compile-cache hit).

    nohup python -u tools/profiling/trace_attrib.py > /tmp/attrib.log 2>&1 &
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", "..",
                                   ".jax_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

IMG = 800
COMP = tuple(int(v) for v in
             os.environ.get("SM3DET_BENCH_COMP", "8,4,4").split(","))
TRACE_DIR = os.environ.get("SM3DET_TRACE_DIR", "/tmp/jtrace")
ITERS = int(os.environ.get("SM3DET_TRACE_ITERS", "3"))


def classify(op_name: str) -> str:
    """Collapse a jax op_name path into a subsystem bucket."""
    if not op_name:
        return "(no metadata)"
    if "/experts/" in op_name:
        return "moe: expert FFN dots"
    if "/ffn/" in op_name and ("w_gate" in op_name or "gate" in op_name):
        return "moe: gating"
    if "/ffn/" in op_name or "dispatch" in op_name:
        return "moe: dispatch/combine"
    if "fused_convnext_block" in op_name:
        return "backbone: fused block kernel"
    if "fused_dwconv_ln" in op_name:
        return "backbone: dwconv+LN kernel"
    if "/backbone/" in op_name:
        return "backbone: other (LN/GELU/convs)"
    if "/neck/" in op_name:
        return "neck"
    if "roi_align" in op_name:
        return "rcnn: roi align"
    if "rpn" in op_name:
        return "rpn: head+decode+nms"
    if "box_iou_rotated" in op_name or "nms" in op_name.lower():
        return "nms machinery"
    if "hbb_iou" in op_name:
        return "rpn: hbb iou"
    if "roi_head" in op_name or "bbox_head" in op_name:
        return "heads"
    if "sar" in op_name or "gfl" in op_name:
        return "sar: gfl head+decode"
    return "other"


def main():
    from trace_joint import build, log

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

    log("lower+compile (cache-hit expected)...")
    compiled = step.lower(variables, sar, rgb, ifr).compile()
    txt = compiled.as_text()
    log(f"HLO {len(txt) / 1e6:.1f} MB; indexing metadata...")

    # instruction name -> op_name metadata (top-level entry computation
    # and all fusions' roots)
    meta = {}
    inst_re = re.compile(r"%([\w.\-]+) = .*?metadata=\{op_name=\"([^\"]*)\"")
    for m in inst_re.finditer(txt):
        meta.setdefault(m.group(1), m.group(2))

    paths = sorted(glob.glob(os.path.join(
        TRACE_DIR, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        log("no trace found; run trace_joint.py first")
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    xla_pids = {p for p, n in pid_names.items()
                if "XLA Op" in n or "TPU" in n or "/device" in n}
    tot = collections.Counter()
    detail = collections.defaultdict(collections.Counter)
    unattributed = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in xla_pids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_step("):   # whole-program umbrella span
            continue
        dur = e.get("dur", 0) / 1000.0 / ITERS   # us -> ms, per iter
        base = name.split("/")[-1]
        op = meta.get(base) or meta.get(base.replace("%", ""))
        if op is None:
            # try stripping .clone suffixes
            op = meta.get(re.sub(r"(\.clone)+$", "", base))
        bucket = classify(op or "")
        tot[bucket] += dur
        # detail key: source tail of the op_name (last 3 path pieces)
        key = "/".join((op or base).split("/")[-3:])
        detail[bucket][key] += dur
        if op is None and dur > 0.05:
            unattributed[base] += dur

    total = sum(tot.values())
    print(f"\n== per-iteration device ms by subsystem (total {total:.1f}, "
          f"{sum(COMP)} images => {sum(COMP) / total * 1000:.1f} img/s) ==")
    for k, v in tot.most_common():
        print(f"  {v:8.2f}  {k}")
    for bucket in ("moe: dispatch/combine", "other", "rcnn: roi align",
                   "heads"):
        print(f"\n== detail: {bucket} ==")
        for k, v in detail[bucket].most_common(14):
            print(f"  {v:8.2f}  {k}")
    print("\n== top unattributed op names ==")
    for k, v in unattributed.most_common(10):
        print(f"  {v:8.2f}  {k}")


if __name__ == "__main__":
    main()
