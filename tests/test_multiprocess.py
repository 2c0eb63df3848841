"""Multi-PROCESS distributed execution tests (VERDICT r2 item 4).

Two real OS processes run ``jax.distributed.initialize`` over a gloo CPU
backend (2 procs x 2 virtual devices = the same 4-device global mesh as a
single-process run) and drive a smoke train through ``tools/train.py``.
Loss parity with the single-process run is exact-by-construction at the
data layer (global-stream host-sliced sampler, sm3det_tpu/data/sampler.py)
and numeric at the collective layer.

Reference behaviors covered: ``init_dist``
(mmcv/mmcv/runner/dist_utils.py:37), rank-sharded eval collection
(mmcv/mmcv/engine/test.py:97-164).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAIN = os.path.join(REPO, "tools", "train.py")
CFG = os.path.join(REPO, "configs", "smoke_tiny.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _base_env(n_cpu: int, cache_dir: str = ""):
    env = os.environ.copy()
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env["SM3DET_CPU"] = str(n_cpu)
    if cache_dir:    # share compiled programs across the runs
        env["JAX_COMPILATION_CACHE_DIR"] = cache_dir
        env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
    return env


def _train_cmd(work_dir: str):
    return [sys.executable, TRAIN, CFG, "--synthetic-data",
            "--max-iters", "4", "--work-dir", work_dir,
            "--cfg-options", "log_interval=1", "checkpoint_interval=4",
            "evaluation={'interval': 4, 'num_images': 6, 'batch_size': 4}"]


def _read_log(work_dir: str):
    path = os.path.join(work_dir, "train_log.jsonl")
    with open(path) as f:
        return [json.loads(line) for line in f]


# ---------------------------------------------------------------------------
# data layer: host shards must assemble into the single-process global batch
# ---------------------------------------------------------------------------

def test_sampler_global_stream_host_sliced():
    from sm3det_tpu.data.sampler import MultiSourceSampler
    sizes, base = [50, 30, 20], [2, 1, 1]
    single = MultiSourceSampler(sizes, [r * 2 for r in base], seed=3)
    hosts = [MultiSourceSampler(sizes, base, seed=3, host_id=h,
                                num_hosts=2) for h in range(2)]
    it_s = iter(single)
    it_h = [iter(h) for h in hosts]
    for _ in range(6):
        glob = next(it_s)
        shards = [next(it) for it in it_h]
        # per-source concatenation of host slices == global draw
        merged = []
        for s in range(3):
            for h in range(2):
                merged.extend(p for p in shards[h] if p[0] == s)
        by_src = []
        for s in range(3):
            by_src.extend(p for p in glob if p[0] == s)
        assert merged == by_src


def test_loader_host_shards_assemble_to_global_batch():
    from sm3det_tpu.data.datasets import SyntheticDetDataset
    from sm3det_tpu.data.loader import MODALITIES, PipelineCfg, \
        TriSourceLoader
    datasets = [SyntheticDetDataset(n=16, img_size=32,
                                    box_type="hbb" if i == 0 else "obb",
                                    seed=i) for i in range(3)]
    pipes = [PipelineCfg(img_size=32, max_gt=4, rotate_ratio=0.3)] * 3
    single = TriSourceLoader(datasets, [2, 1, 1], pipes,
                             batches_per_step=2, seed=5, num_workers=0)
    hosts = [TriSourceLoader(datasets, [2, 1, 1], pipes,
                             batches_per_step=1, seed=5, host_id=h,
                             num_hosts=2, num_workers=0)
             for h in range(2)]
    it_s, it_h = iter(single), [iter(h) for h in hosts]
    for _ in range(3):
        g = next(it_s)
        parts = [next(it) for it in it_h]
        for mod in MODALITIES:
            for k in g[mod]:
                merged = np.concatenate([p[mod][k] for p in parts])
                np.testing.assert_array_equal(
                    merged, g[mod][k],
                    err_msg=f"{mod}.{k} host shards != global batch")


# ---------------------------------------------------------------------------
# process layer: 2-proc gloo run == 1-proc run, through tools/train.py
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_two_process_train_matches_single_process(tmp_path):
    port = _free_port()
    wd_single = str(tmp_path / "single")
    wd_mp = str(tmp_path / "mp")
    cache = str(tmp_path / "jaxcache")

    single = subprocess.run(
        _train_cmd(wd_single), env=_base_env(n_cpu=4, cache_dir=cache),
        cwd=REPO, capture_output=True, text=True, timeout=1500)
    assert single.returncode == 0, single.stdout[-4000:] + \
        single.stderr[-4000:]

    procs = []
    for pid in range(2):
        env = _base_env(n_cpu=2, cache_dir=cache)
        env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
        env["NPROC"] = "2"
        env["PROC_ID"] = str(pid)
        procs.append(subprocess.Popen(
            _train_cmd(wd_mp), env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=1500)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
    assert "jax.distributed: process 0/2" in outs[0]
    assert "mesh: 4 devices = 4 data x 1 expert" in outs[0]

    log_s, log_m = _read_log(wd_single), _read_log(wd_mp)
    # eval metrics are logged to the same jsonl (mode='val' rows);
    # compare the train rows, and check the val rows were produced
    val_s = [r for r in log_s if r.get("mode") == "val"]
    val_m = [r for r in log_m if r.get("mode") == "val"]
    log_s = [r for r in log_s if r.get("mode") != "val"]
    log_m = [r for r in log_m if r.get("mode") != "val"]
    assert len(log_s) == len(log_m) == 4
    assert {r["dataset"] for r in val_s} == {"sar", "rgb", "ifr"}
    # rank-0-only eval collection: the mp run's val rows exist too
    assert {r["dataset"] for r in val_m} == {"sar", "rgb", "ifr"}
    for ls, lm in zip(log_s, log_m):
        assert ls["iter"] == lm["iter"]
        # iter 1 = same params, same (byte-identical) global batch ->
        # pure forward/grad parity through different collective impls;
        # later iters accumulate float divergence through the sharp
        # assign/sample decisions, so compare loosely
        tol = dict(rtol=1e-4, atol=1e-5) if ls["iter"] == 1 \
            else dict(rtol=3e-2, atol=2e-3)
        for k in ls:
            if k.endswith("loss") or "loss_" in k:
                assert np.isclose(ls[k], lm[k], **tol), (k, ls[k], lm[k])

    # rank-sharded eval ran and was collected on rank 0 only (the
    # collect_results path); single-process eval also ran
    assert outs[0].count("eval[") == 3
    assert outs[1].count("eval[") == 0
    assert single.stdout.count("eval[") == 3

    # multi-process checkpoint: ALL ranks participate in the orbax save
    # (globally sharded arrays — a rank-0-only call deadlocks); both runs
    # must produce a complete iter_4 checkpoint
    for wd in (wd_single, wd_mp):
        assert os.path.isdir(os.path.join(wd, "iter_4")), \
            f"missing checkpoint in {wd}"
    assert "checkpoint saved" in outs[0]


@pytest.mark.slow
def test_two_process_sharded_checkpoint_save_and_resume(tmp_path):
    """Save AND RESUME an orbax checkpoint under the 2-process sharded
    mesh (VERDICT r4 item 3c: the all-ranks-save fix was in the code
    path but untested end-to-end). Run 1 trains 4 iters and writes
    iter_4 from globally-sharded arrays; run 2 (fresh 2-proc group)
    auto-resumes from it and trains to iter 8 — restore must neither
    deadlock nor corrupt state (losses stay finite and a complete
    iter_8 checkpoint appears)."""
    wd = str(tmp_path / "mp_resume")
    cache = os.path.join(REPO, ".jax_cache")

    # warm the compile cache with a single-process 4-device run first:
    # with a cold cache the two ranks compile at different speeds and
    # gloo context creation times out (30 s) waiting for the slower one
    warm = subprocess.run(
        [sys.executable, TRAIN, CFG, "--synthetic-data",
         "--work-dir", str(tmp_path / "warm"), "--max-iters", "1"],
        env=_base_env(n_cpu=4, cache_dir=cache), cwd=REPO,
        capture_output=True, text=True, timeout=1500)
    assert warm.returncode == 0, warm.stdout[-2000:] + \
        warm.stderr[-2000:]

    def run_pair(extra, timeout=1500):
        port = _free_port()
        procs = []
        for pid in range(2):
            env = _base_env(n_cpu=2, cache_dir=cache)
            env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
            env["NPROC"] = "2"
            env["PROC_ID"] = str(pid)
            cmd = [sys.executable, TRAIN, CFG, "--synthetic-data",
                   "--work-dir", wd, "--cfg-options", "log_interval=1",
                   "checkpoint_interval=4"] + extra
            procs.append(subprocess.Popen(
                cmd, env=env, cwd=REPO, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True))
        outs = [p.communicate(timeout=timeout)[0] for p in procs]
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        return outs

    outs1 = run_pair(["--max-iters", "4"])
    assert os.path.isdir(os.path.join(wd, "iter_4"))
    assert "checkpoint saved" in outs1[0]

    outs2 = run_pair(["--max-iters", "8", "--auto-resume"])
    assert "resumed from" in outs2[0] and "at iter 4" in outs2[0]
    assert os.path.isdir(os.path.join(wd, "iter_8"))

    log = _read_log(wd)
    iters = [line["iter"] for line in log if line.get("mode") != "val"]
    assert iters == [1, 2, 3, 4, 5, 6, 7, 8], iters
    assert all(np.isfinite(line["loss"]) for line in log
               if "loss" in line)
