#!/usr/bin/env python
"""Device-true training-step decomposition (tools/ptime.py): full step
vs forward-only vs fwd+bwd, flagship config, batch [2 SAR:1 RGB:1 IR]
at 800^2. Deltas give backward and optimizer/DLA cost."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import copy

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from ptime import device_time  # noqa: E402

IMG = 800


def log(m):
    print(m, flush=True)


def main():
    from sm3det_tpu.models.detectors.trisource import (DEFAULT_MODEL_CFG,
                                                       TriSourceDetector)
    from sm3det_tpu.train.optim import make_optimizer
    from sm3det_tpu.train.train_state import (TrainState,
                                              build_train_step,
                                              init_trisource)

    cfg = copy.deepcopy(DEFAULT_MODEL_CFG)
    model = TriSourceDetector(cfg=cfg)
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

    batch = {"sar": mk(2, False), "rgb": mk(1, True), "ifr": mk(1, True)}
    batch = jax.tree.map(jnp.asarray, batch)
    params = init_trisource(jax.random.PRNGKey(0), model, batch)
    init_fn, update_fn, _ = make_optimizer(base_lr=1e-4,
                                           weight_decay=0.05)
    state = TrainState(params=params, opt=init_fn(params),
                       rng=jax.random.PRNGKey(1), prev_losses=None,
                       ema=None)
    step = build_train_step(model, init_fn, update_fn,
                            source_ratio=(2, 1, 1))

    # full step (state-carried loop: the state IS the carry)
    @jax.jit
    def loop_full(st, b, iters):
        def body(_, s):
            s2, _ = step(s, b)
            return s2
        return jax.lax.fori_loop(0, iters, body, st)

    import time
    ITERS = 8
    st = loop_full(state, batch, 1)      # compile
    jax.block_until_ready(st.params)
    t0 = time.perf_counter()
    st = loop_full(state, batch, ITERS)
    _ = float(jax.tree_util.tree_leaves(st.params)[0].sum())
    full = (time.perf_counter() - t0) / ITERS * 1000
    log(f"full train step (loop)     {full:8.1f} ms")

    def step_scalar(st_, b_):
        # return the FULL new state: returning only the loss lets XLA
        # dead-code-eliminate the backward + optimizer entirely
        s2, m = step(st_, b_)
        return (s2.params, s2.opt, m["loss"])

    def perturb_state(a, e):
        b = dict(a[1])
        b["sar"] = dict(b["sar"], img=b["sar"]["img"] + e * 1e-9)
        return (a[0], b)

    dt = device_time(step_scalar, (state, batch), iters=8,
                     perturb=perturb_state)
    log(f"full train step (ptime)    {dt:8.1f} ms")

    # forward-only (loss eval, no grad)
    def fwd(p, b, r):
        losses = model.apply(
            {"params": p}, b, source_ratio=(2, 1, 1), train=True,
            rngs={"dropout": r, "moe_noise": r, "sampling": r})
        return sum(jnp.sum(v) for v in losses.values())

    r = jax.random.PRNGKey(2)

    def perturb(a, e):
        # loop-variant input so XLA cannot hoist the body out of the
        # timing loop
        b = dict(a[1])
        b["sar"] = dict(b["sar"], img=b["sar"]["img"] + e * 1e-9)
        return (a[0], b)

    dt = device_time(lambda p, b: fwd(p, b, r), (params, batch),
                     iters=8, perturb=perturb)
    log(f"forward (loss) only        {dt:8.1f} ms")

    # fwd+bwd without optimizer
    def fb(p, b, r):
        # consume EVERY grad leaf: truncating lets XLA drop the
        # weight-gradient matmuls of unconsumed layers
        l, grads = jax.value_and_grad(fwd)(p, b, r)
        return l + sum(jnp.sum(jnp.abs(g)) * 1e-9
                       for g in jax.tree_util.tree_leaves(grads))

    dt = device_time(lambda p, b: fb(p, b, r), (params, batch),
                     iters=8, perturb=perturb)
    log(f"forward+backward           {dt:8.1f} ms")

    # bf16 compute-policy full step
    from sm3det_tpu.train.train_state import build_train_step as _bts
    cfg16 = copy.deepcopy(DEFAULT_MODEL_CFG)
    cfg16["compute_dtype"] = "bfloat16"
    model16 = TriSourceDetector(cfg=cfg16)
    step16 = build_train_step(model16, init_fn, update_fn,
                              source_ratio=(2, 1, 1))

    def step16_out(st_, b_):
        s2, m = step16(st_, b_)
        return (s2.params, s2.opt, m["loss"])

    dt = device_time(step16_out, (state, batch), iters=8,
                     perturb=perturb_state)
    log(f"full train step bf16       {dt:8.1f} ms")





def optimizer_only():
    """Appendable second entry point: time update_fn alone."""
    from sm3det_tpu.models.detectors.trisource import (DEFAULT_MODEL_CFG,
                                                       TriSourceDetector)
    from sm3det_tpu.train.optim import make_optimizer
    from sm3det_tpu.train.train_state import init_trisource
    import copy as _copy

    cfg = _copy.deepcopy(DEFAULT_MODEL_CFG)
    model = TriSourceDetector(cfg=cfg)
    rng = np.random.RandomState(0)
    g = 16
    batch = {
        "sar": {"img": rng.rand(2, 64, 64, 3).astype(np.float32),
                "gt_bboxes": np.zeros((2, g, 4), np.float32),
                "gt_labels": np.zeros((2, g), np.int32),
                "gt_mask": np.ones((2, g), bool)},
        "rgb": {"img": rng.rand(1, 64, 64, 3).astype(np.float32),
                "gt_obbs": np.zeros((1, g, 5), np.float32),
                "gt_labels": np.zeros((1, g), np.int32),
                "gt_mask": np.ones((1, g), bool)},
        "ifr": {"img": rng.rand(1, 64, 64, 3).astype(np.float32),
                "gt_obbs": np.zeros((1, g, 5), np.float32),
                "gt_labels": np.zeros((1, g), np.int32),
                "gt_mask": np.ones((1, g), bool)}}
    batch = jax.tree.map(jnp.asarray, batch)
    params = init_trisource(jax.random.PRNGKey(0), model, batch)
    init_fn, update_fn, _ = make_optimizer(base_lr=1e-4,
                                           weight_decay=0.05)
    opt = init_fn(params)
    grads = jax.tree.map(lambda p: p * 1e-3, params)

    def fn(g_, o_, p_):
        upd, o2 = update_fn(g_, o_, p_, None)
        p2 = jax.tree.map(lambda a, b: a + b, p_, upd)
        return p2

    def perturb(a, e):
        g2 = dict(a[0])
        return (jax.tree.map(lambda x: x + e * 1e-12, a[0]),) + a[1:]

    dt = device_time(lambda g_, o_, p_: fn(g_, o_, p_),
                     (grads, opt, params), iters=8, perturb=perturb)
    log(f"optimizer update only      {dt:8.1f} ms")




if __name__ == "__main__":
    if os.environ.get("SM3DET_PROF_OPT") == "1":
        optimizer_only()
    else:
        main()
