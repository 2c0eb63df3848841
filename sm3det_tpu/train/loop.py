"""Training loop: iter-based runner with logging, checkpointing, timing.

Replaces ``IterBasedRunner`` + hook stack (``mmcv/mmcv/runner/
iter_based_runner.py:50``, SURVEY.md §3.1): the per-iter hot path is ONE
jitted SPMD step; host-side work is only (a) next-batch assembly (numpy),
(b) windowed log aggregation (``LogBuffer`` semantics), (c) periodic
checkpoint. Device metrics are fetched asynchronously every
``log_interval`` steps, never per-step — no host sync in the hot loop.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict, deque
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np

from .checkpoint import save_checkpoint


class LogBuffer:
    """Windowed means (``mmcv LogBuffer`` behavior)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.hist: Dict[str, deque] = defaultdict(
            lambda: deque(maxlen=self.window))

    def update(self, metrics: Dict[str, float]):
        for k, v in metrics.items():
            self.hist[k].append(float(v))

    def averages(self) -> Dict[str, float]:
        return {k: float(np.mean(v)) for k, v in self.hist.items()}


def run_training(train_step: Callable, state, data_iter: Iterator,
                 max_iters: int, work_dir: str,
                 device_put: Optional[Callable] = None,
                 log_interval: int = 50,
                 checkpoint_interval: Optional[int] = None,
                 eval_fns: Optional[Dict[str, Callable]] = None,
                 eval_interval: Optional[int] = None,
                 logger=print, start_iter: int = 0):
    """Run the loop; returns the final state."""
    os.makedirs(work_dir, exist_ok=True)
    log_path = os.path.join(work_dir, "train_log.jsonl")
    # multi-process: every rank runs the loop (SPMD), but only rank 0
    # writes logs/checkpoints (reference master_only semantics,
    # mmcv/mmcv/runner/dist_utils.py:138)
    is_main = jax.process_index() == 0
    # exact windowed means (mmcv LogBuffer): metrics are summed ON DEVICE
    # every step (one tiny jitted add per iter, no host sync) and fetched
    # only at log time — every iteration contributes, not 1-in-N samples
    import jax.numpy as jnp

    @jax.jit
    def _acc_metrics(acc_vec, metrics):
        keys = sorted(metrics)
        vec = jnp.stack([jnp.asarray(metrics[k], jnp.float32)
                         for k in keys])
        return (vec if acc_vec is None else acc_vec + vec)

    acc_vec = None
    n_acc = 0
    t_data, t_step = 0.0, 0.0
    t0 = time.perf_counter()

    for it in range(start_iter, max_iters):
        td = time.perf_counter()
        batch = next(data_iter)
        if device_put is not None:
            batch = device_put(batch)
        t_data += time.perf_counter() - td

        ts = time.perf_counter()
        state, metrics = train_step(state, batch)
        t_step += time.perf_counter() - ts
        acc_vec = _acc_metrics(acc_vec, metrics)
        n_acc += 1

        if (it + 1) % log_interval == 0 and n_acc:
            keys = sorted(metrics)
            vals = np.asarray(jax.device_get(acc_vec)) / n_acc
            avg = dict(zip(keys, (float(v) for v in vals)))
            acc_vec, n_acc = None, 0
            elapsed = time.perf_counter() - t0
            line = {
                "iter": it + 1, "elapsed_s": round(elapsed, 1),
                "data_time": round(t_data / log_interval, 4),
                "step_time": round(t_step / log_interval, 4),
                **{k: round(v, 5) for k, v in avg.items()},
            }
            if is_main:
                logger(f"[{it + 1}/{max_iters}] " + json.dumps(line))
                with open(log_path, "a") as f:
                    f.write(json.dumps(line) + "\n")
            t_data, t_step = 0.0, 0.0

        if checkpoint_interval and (it + 1) % checkpoint_interval == 0:
            # ALL processes participate: in multi-process runs the state is
            # globally sharded jax.Arrays and orbax's save runs a
            # cross-process barrier + per-process shard writes — a rank-0-only
            # call would deadlock. (The reference's ``master_only`` gate
            # applies to torch host-memory state only.)
            path = save_checkpoint(work_dir, it + 1, state)
            if is_main:
                logger(f"checkpoint saved: {path}")

        if eval_fns and eval_interval and (it + 1) % eval_interval == 0:
            for name, fn in eval_fns.items():
                res = fn(state)
                if res is not None:     # None on non-zero ranks
                    logger(f"eval[{name}] @ {it + 1}: {res}")
                    if is_main:
                        # persist eval metrics next to the loss curve
                        # (reference: EvalHook -> log_buffer -> json log)
                        line = {"iter": it + 1, "mode": "val",
                                "dataset": name}
                        line.update({k: v for k, v in res.items()
                                     if isinstance(v, (int, float))})
                        with open(log_path, "a") as f:
                            f.write(json.dumps(line) + "\n")

    return state
