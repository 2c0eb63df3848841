#!/usr/bin/env python
"""Capacity-factor A/B (SURVEY §7 hard part 1: static capacity vs the
reference's unbounded MoE dispatcher, with MEASURED deltas).

Two measurements, one TPU session:

1. drop_fraction probe at the FLAGSHIP config's token counts
   (ConvNeXt-T, 8 experts, top-3, 800 px -> 2500 tokens/img at stage 3):
   forward the backbone with ``mutable=['intermediates']`` and report
   the per-block fraction of expert assignments dropped by the static
   capacity, for capacity_factor in the sweep.
2. convergence A/B: ``configs/convergence_synth.py`` trained end-to-end
   per capacity_factor; held-out mAP50 per modality from the val log.

Usage (ALWAYS nohup + poll, never kill a TPU process):
    nohup python -u tools/profiling/capacity_ab.py > /tmp/cap_ab.log 2>&1 &

Results land in docs/evidence/capacity_ab.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

SWEEP = (1.0, 1.25, 1.5, 2.0)


def drop_probe():
    import numpy as np

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    from sm3det_tpu.models.backbones.convnext import ConvNeXtMoE

    out = {}
    x = np.random.RandomState(0).rand(4, 800, 800, 3).astype(np.float32)
    for cf in SWEEP:
        model = ConvNeXtMoE(arch="tiny", drop_path_rate=0.0,
                            moe_block_inds=((), (), (0, 2, 4, 6, 8),
                                            (0, 2)),
                            num_experts=8, top_k=3, gate="cosine",
                            noisy_gating=True, capacity_factor=cf)
        rng = jax.random.PRNGKey(0)
        variables = model.init(rng, jnp.zeros((1, 64, 64, 3)),
                               train=False)

        @jax.jit
        def fwd(v, xb):
            _, st = model.apply(v, xb, train=False,
                                mutable=["intermediates"])
            return st["intermediates"]

        inter = jax.device_get(fwd(variables, x))
        fracs = {}

        def walk(tree, prefix=""):
            for k, v in tree.items():
                if k == "drop_fraction":
                    fracs[prefix.rstrip("/")] = float(np.asarray(v[0]))
                elif isinstance(v, dict):
                    walk(v, prefix + k + "/")

        walk(inter)
        out[str(cf)] = fracs
        mean = float(np.mean(list(fracs.values()))) if fracs else -1.0
        print(f"capacity_factor={cf}: mean drop_fraction={mean:.4f} "
              f"({len(fracs)} MoE blocks)", flush=True)
        for k, v in sorted(fracs.items()):
            print(f"    {k}: {v:.4f}", flush=True)
    return out


def convergence_ab():
    results = {}
    for cf in SWEEP:
        wd = os.path.join(REPO, "work_dirs", f"capacity_cf{cf}")
        cmd = [sys.executable, "-u",
               os.path.join(REPO, "tools", "train.py"),
               os.path.join(REPO, "configs", "convergence_synth.py"),
               "--work-dir", wd, "--seed", "0",
               "--cfg-options", f"model.backbone.capacity_factor={cf}"]
        print(f"=== training capacity_factor={cf} -> {wd}", flush=True)
        env = dict(os.environ,
                   JAX_COMPILATION_CACHE_DIR=os.path.join(
                       REPO, ".jax_cache"))
        subprocess.run(cmd, check=True, env=env)
        evals = []
        with open(os.path.join(wd, "train_log.jsonl")) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("mode") == "val":
                    evals.append(rec)
        results[str(cf)] = evals
        final = {e["dataset"]: e.get("mAP50") for e in evals
                 if e["iter"] == max((x["iter"] for x in evals),
                                     default=0)}
        print(f"capacity_factor={cf} final mAP50: {final}", flush=True)
    return results


def main():
    ev_dir = os.path.join(REPO, "docs", "evidence")
    os.makedirs(ev_dir, exist_ok=True)
    out_path = os.path.join(ev_dir, "capacity_ab.json")
    # the probe runs in ITS OWN subprocess so this orchestrator never
    # holds the TPU chip claim while the training children run (one
    # TPU process at a time — see CLAUDE.md gotchas)
    probe_out = out_path + ".probe"
    subprocess.run([sys.executable, "-u", os.path.abspath(__file__),
                    "--probe", probe_out], check=True)
    with open(probe_out) as f:
        probe = json.load(f)
    os.remove(probe_out)
    conv = convergence_ab()
    with open(out_path, "w") as f:
        json.dump({"drop_fraction_flagship_800px": probe,
                   "convergence_synth_600iter": conv}, f, indent=1)
    print(f"written: {out_path}", flush=True)
    print("CAPACITY-AB-DONE", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--probe":
        with open(sys.argv[2], "w") as _f:
            json.dump(drop_probe(), _f, indent=1)
    else:
        main()
