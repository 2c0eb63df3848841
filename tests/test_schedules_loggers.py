"""LR-schedule trajectory + logger/LogBuffer tests — the rebuild's
counterpart of mmcv's hook tests (``mmcv/tests/test_runner/
test_hooks.py:1268 test_step_runner_hook`` asserts exact LR values per
iteration; logger hooks are asserted via recorded calls)."""
import json
import os

import numpy as np

import jax.numpy as jnp

from sm3det_tpu.train.loggers import TextLogger, build_loggers
from sm3det_tpu.train.loop import LogBuffer
from sm3det_tpu.train.optim import step_lr


def test_step_lr_trajectory_matches_mmcv_semantics():
    # warmup 4 iters at ratio 1/3, steps at 8 and 12, gamma 0.1
    sched = step_lr(base_lr=0.02, step_iters=(8, 12), gamma=0.1,
                    warmup_iters=4, warmup_ratio=1.0 / 3.0)
    got = [float(sched(np.int32(i))) for i in range(14)]
    # mmcv get_warmup_lr: lr * (1 - (1 - i/w) * (1 - ratio))
    expect = []
    for i in range(14):
        lr = 0.02 * (0.1 ** ((i >= 8) + (i >= 12)))
        if i < 4:
            k = (1 - i / 4) * (1 - 1 / 3)
            lr = lr * (1 - k)
        expect.append(lr)
    np.testing.assert_allclose(got, expect, rtol=1e-5)
    # spot values: iter0 = base/3, warmup end = base, post-step = base/10
    assert abs(got[0] - 0.02 / 3) < 1e-8
    assert abs(got[4] - 0.02) < 1e-8
    assert abs(got[8] - 0.002) < 1e-8
    assert abs(got[12] - 0.0002) < 1e-9


def test_log_buffer_windowed_means():
    buf = LogBuffer(window=3)
    for v in (1.0, 2.0, 3.0, 4.0):
        buf.update({"loss": v})
    # window 3 -> mean of last three
    assert abs(buf.averages()["loss"] - 3.0) < 1e-9


def test_text_logger_jsonl(tmp_path):
    lg = TextLogger(str(tmp_path))
    lg.log({"loss": 1.5, "lr": 0.01}, step=7)
    lg.log({"loss": 1.25}, step=8)
    lg.close()
    files = [f for f in os.listdir(tmp_path) if f.endswith(".jsonl")]
    assert files
    lines = [json.loads(line) for line in
             open(os.path.join(tmp_path, files[0]))]
    assert lines[0]["iter"] == 7 and lines[0]["loss"] == 1.5
    assert lines[1]["iter"] == 8


def test_build_loggers_text_only(tmp_path):
    logs = build_loggers(["text"], str(tmp_path))
    assert len(logs) == 1
    logs[0].log({"a": 1.0}, step=0)
    for lg in logs:
        lg.close()


def test_cosine_lr_trajectory_matches_mmcv_semantics():
    """CosineAnnealingLrUpdaterHook (lr_updater.py:269 + annealing_cos
    :708): target + 0.5*(base-target)*(1+cos(pi*t/T)), linear warmup."""
    import numpy as np
    from sm3det_tpu.train.optim import make_lr_schedule
    base, ratio, T, wi, wr = 1e-3, 0.05, 1000, 100, 1.0 / 3
    sched = make_lr_schedule("cosine", base, min_lr_ratio=ratio,
                             max_iters=T, warmup="linear",
                             warmup_iters=wi, warmup_ratio=wr)
    target = base * ratio
    for it in (0, 50, 99, 100, 250, 500, 999, 1000):
        regular = target + 0.5 * (base - target) * \
            (1 + np.cos(np.pi * min(it / T, 1.0)))
        if it < wi:
            k = (1 - it / wi) * (1 - wr)
            expect = regular * (1 - k)
        else:
            expect = regular
        got = float(sched(jnp.asarray(it)))
        assert abs(got - expect) < 1e-9, (it, got, expect)
    # min_lr form
    sched2 = make_lr_schedule("cosine", base, min_lr=1e-5, max_iters=T,
                              warmup=None, warmup_iters=0)
    assert abs(float(sched2(jnp.asarray(T))) - 1e-5) < 1e-10


def test_poly_exp_inv_fixed_lr_trajectories():
    """Poly/Exp/Inv/Fixed updaters (lr_updater.py:222-265)."""
    from sm3det_tpu.train.optim import make_lr_schedule
    base = 2e-3
    poly = make_lr_schedule("poly", base, min_lr=1e-4, power=0.9,
                            max_iters=100, warmup=None, warmup_iters=0)
    expect = (base - 1e-4) * (1 - 40 / 100) ** 0.9 + 1e-4
    assert abs(float(poly(jnp.asarray(40))) - expect) < 1e-9
    assert abs(float(poly(jnp.asarray(100))) - 1e-4) < 1e-9

    exp = make_lr_schedule("exp", base, gamma=0.999, warmup=None,
                           warmup_iters=0)
    assert abs(float(exp(jnp.asarray(500))) - base * 0.999 ** 500) < 1e-7

    inv = make_lr_schedule("inv", base, gamma=0.001, power=0.75,
                           warmup=None, warmup_iters=0)
    assert abs(float(inv(jnp.asarray(200))) -
               base * (1 + 0.001 * 200) ** -0.75) < 1e-9

    fixed = make_lr_schedule("fixed", base, warmup="constant",
                             warmup_iters=10, warmup_ratio=0.1)
    assert abs(float(fixed(jnp.asarray(5))) - base * 0.1) < 1e-9
    assert abs(float(fixed(jnp.asarray(50))) - base) < 1e-9


def test_exp_warmup_matches_mmcv():
    """exp warmup: lr * ratio^(1 - t/w) (lr_updater.py:97-99)."""
    import numpy as np
    from sm3det_tpu.train.optim import make_lr_schedule
    sched = make_lr_schedule("fixed", 1.0, warmup="exp",
                             warmup_iters=20, warmup_ratio=0.1)
    for it in (0, 7, 19):
        expect = 0.1 ** (1 - it / 20)
        assert abs(float(sched(jnp.asarray(it))) - expect) < 1e-7
    assert abs(float(sched(jnp.asarray(20))) - 1.0) < 1e-7
