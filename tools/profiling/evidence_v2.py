#!/usr/bin/env python
"""Multi-seed capacity + DLA-ablation convergence evidence (VERDICT r4
item 5): the strongest accuracy-parity story available without real
data.

Matrix (each cell = one full TPU training run of
``configs/convergence_synth.py`` at 2000 iters):

- capacity sweep: capacity_factor in {1.0, 1.5, 2.0} x seeds {0,1,2}
  (DLA on — the flagship recipe; the cf=1.5 runs double as the DLA arm
  of the ablation)
- DLA ablation (reference headline, BASELINE.md rows 5-7):
  * fixed step-LR (lr_config.policy=step), no reweighting
  * uncertainty loss reweighting (model.multi_tasks_reweight) + step LR
  each x seeds {0,1,2}

Usage (ALWAYS nohup + poll, never kill a TPU process):
    nohup python -u tools/profiling/evidence_v2.py > /tmp/ev2.log 2>&1 &

Appends one JSON line per finished run to
docs/evidence/evidence_v2.jsonl (resumable: finished runs are skipped),
and a final aggregate to docs/evidence/evidence_v2_summary.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
EV = os.path.join(REPO, "docs", "evidence")
OUT = os.path.join(EV, "evidence_v2.jsonl")
ITERS = int(os.environ.get("SM3DET_EV2_ITERS", "2000"))
SEEDS = (0, 1, 2)


def runs():
    for cf in (1.0, 1.5, 2.0):
        for seed in SEEDS:
            yield dict(
                name=f"cap_cf{cf}_s{seed}", kind="capacity",
                cf=cf, seed=seed,
                opts=[f"model.backbone.capacity_factor={cf}",
                      "evaluation.interval=250"])
    for variant in ("fixed", "uncertainty"):
        for seed in SEEDS:
            opts = ["lr_config.policy=step",
                    "model.backbone.capacity_factor=1.5",
                    "evaluation.interval=250"]
            if variant == "uncertainty":
                opts.append("model.multi_tasks_reweight=uncertainty")
            yield dict(name=f"dla_{variant}_s{seed}", kind="dla_ablation",
                       variant=variant, seed=seed, opts=opts)


def final_eval(wd):
    evals = []
    with open(os.path.join(wd, "train_log.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("mode") == "val":
                evals.append(rec)
    last = max((e["iter"] for e in evals), default=0)
    return ({e["dataset"]: e.get("mAP50", e.get("bbox_mAP_50"))
             for e in evals if e["iter"] == last},
            evals)


def main():
    os.makedirs(EV, exist_ok=True)
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            done = {json.loads(line)["name"] for line in f if line.strip()}
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, ".jax_cache"))
    for spec in runs():
        if spec["name"] in done:
            print(f"skip (done): {spec['name']}", flush=True)
            continue
        wd = os.path.join(REPO, "work_dirs", "ev2_" + spec["name"])
        cmd = [sys.executable, "-u",
               os.path.join(REPO, "tools", "train.py"),
               os.path.join(REPO, "configs", "convergence_synth.py"),
               "--work-dir", wd, "--seed", str(spec["seed"]),
               "--max-iters", str(ITERS),
               "--cfg-options"] + spec["opts"]
        print(f"=== {spec['name']} -> {wd}", flush=True)
        r = subprocess.run(cmd, env=env)
        if r.returncode != 0:
            print(f"RUN FAILED: {spec['name']} rc={r.returncode}",
                  flush=True)
            continue
        final, evals = final_eval(wd)
        rec = dict(spec, iters=ITERS, final_mAP50=final,
                   val_curve=[{k: e[k] for k in
                               ("iter", "dataset", "mAP50",
                                "bbox_mAP_50")
                               if k in e} for e in evals])
        rec.pop("opts")
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"{spec['name']} final mAP50: {final}", flush=True)

    # aggregate
    rows = []
    with open(OUT) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    summary = {}
    for r in rows:
        key = (f"cf={r['cf']}" if r["kind"] == "capacity"
               else f"dla={r['variant']}")
        vals = r["final_mAP50"]
        mean3 = sum(v for v in vals.values() if v is not None) / \
            max(len(vals), 1)
        summary.setdefault(key, []).append(
            dict(seed=r["seed"], **vals, mean=round(mean3, 4)))
    with open(os.path.join(EV, "evidence_v2_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("EVIDENCE-V2-DONE", flush=True)


if __name__ == "__main__":
    main()
