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


def _ref_annealing_cos(start, end, factor, weight=1.0):
    """lr_updater.py:708 verbatim."""
    import math
    cos_out = math.cos(math.pi * factor) + 1
    return end + 0.5 * weight * (start - end) * cos_out


def _ref_cyclic(it, base, target_ratio, cyclic_times, step_ratio_up,
                gamma, max_iters, anneal="cos"):
    """CyclicLrUpdaterHook.get_lr verbatim (lr_updater.py:433-540)."""
    max_iter_per_phase = max_iters // cyclic_times
    iter_up_phase = int(step_ratio_up * max_iter_per_phase)
    phases = [[0, iter_up_phase, 1, target_ratio[0]],
              [iter_up_phase, max_iter_per_phase, target_ratio[0],
               target_ratio[1]]]
    curr_iter = it % max_iter_per_phase
    curr_cycle = it // max_iter_per_phase
    scale = gamma ** curr_cycle
    for (start_iter, end_iter, start_ratio, end_ratio) in phases:
        if start_iter <= curr_iter < end_iter:
            if start_iter == 0:
                end_ratio = 1 - scale + end_ratio * scale
            else:
                start_ratio = 1 - scale + start_ratio * scale
            progress = curr_iter - start_iter
            if anneal == "cos":
                return _ref_annealing_cos(
                    base * start_ratio, base * end_ratio,
                    progress / (end_iter - start_iter))
            return base * start_ratio + (
                base * end_ratio - base * start_ratio) * (
                progress / (end_iter - start_iter))
    raise AssertionError


def test_cyclic_lr_trajectory_matches_mmcv():
    from sm3det_tpu.train.optim import make_lr_schedule
    for gamma_cycle, anneal in ((1.0, "cos"), (0.7, "cos"),
                                (1.0, "linear")):
        sched = make_lr_schedule(
            "cyclic", base_lr=0.01, max_iters=40, warmup=None,
            warmup_iters=0, target_ratio=(10.0, 1e-4), cyclic_times=2,
            step_ratio_up=0.4, anneal_strategy=anneal,
            cyclic_gamma=gamma_cycle)
        got = [float(sched(np.int32(i))) for i in range(40)]
        expect = [_ref_cyclic(i, 0.01, (10.0, 1e-4), 2, 0.4,
                              gamma_cycle, 40, anneal)
                  for i in range(40)]
        np.testing.assert_allclose(got, expect, rtol=1e-5,
                                   err_msg=f"{gamma_cycle} {anneal}")


def test_cosine_restart_lr_trajectory_matches_mmcv():
    from sm3det_tpu.train.optim import make_lr_schedule
    periods, weights = (10, 15, 20), (1.0, 0.5, 0.25)
    cum = [10, 25, 45]
    sched = make_lr_schedule(
        "cosine_restart", base_lr=0.02, min_lr=1e-4, warmup=None,
        warmup_iters=0, periods=periods, restart_weights=weights)
    got = [float(sched(np.int32(i))) for i in range(45)]

    def ref(it):
        # CosineRestartLrUpdaterHook.get_lr (lr_updater.py:383-404)
        idx = next(i for i, p in enumerate(cum) if it < p)
        nearest = 0 if idx == 0 else cum[idx - 1]
        alpha = min((it - nearest) / periods[idx], 1)
        return _ref_annealing_cos(0.02, 1e-4, alpha, weights[idx])

    np.testing.assert_allclose(got, [ref(i) for i in range(45)],
                               rtol=1e-5)


def test_flat_cosine_lr_trajectory_matches_mmcv():
    from sm3det_tpu.train.optim import make_lr_schedule
    sched = make_lr_schedule(
        "flat_cosine", base_lr=0.01, min_lr_ratio=0.1, max_iters=20,
        start_percent=0.6, warmup=None, warmup_iters=0)
    got = [float(sched(np.int32(i))) for i in range(20)]

    def ref(it):
        # FlatCosineAnnealingLrUpdaterHook.get_lr (lr_updater.py:336-356)
        start = round(20 * 0.6)
        progress = it - start
        if progress < 0:
            return 0.01
        return _ref_annealing_cos(0.01, 0.001, progress / (20 - start))

    np.testing.assert_allclose(got, [ref(i) for i in range(20)],
                               rtol=1e-5)


def test_momentum_schedules_match_mmcv():
    from sm3det_tpu.train.optim import make_momentum_schedule

    # step momentum with min clip (StepMomentumUpdaterHook:196-214)
    s = make_momentum_schedule("step", base_momentum=0.9,
                               step_iters=(4, 8), gamma=0.5,
                               min_momentum=0.3)
    got = [float(s(np.int32(i))) for i in range(12)]
    expect = [max(0.9 * 0.5 ** ((i >= 4) + (i >= 8)), 0.3)
              for i in range(12)]
    np.testing.assert_allclose(got, expect, rtol=1e-6)

    # cosine momentum (CosineAnnealingMomentumUpdaterHook:237-250)
    s = make_momentum_schedule("cosine", base_momentum=0.95,
                               min_momentum_ratio=0.85 / 0.95,
                               max_iters=10)
    got = [float(s(np.int32(i))) for i in range(10)]
    expect = [_ref_annealing_cos(0.95, 0.85, i / 10) for i in range(10)]
    np.testing.assert_allclose(got, expect, rtol=1e-6)

    # cyclic momentum mirrors cyclic LR with inverted default ratios
    # (CyclicMomentumUpdaterHook:291-396)
    s = make_momentum_schedule("cyclic", base_momentum=0.9,
                               target_ratio=(0.85 / 0.95, 1.0),
                               cyclic_times=1, step_ratio_up=0.4,
                               max_iters=20)
    got = [float(s(np.int32(i))) for i in range(20)]
    expect = [_ref_cyclic(i, 0.9, (0.85 / 0.95, 1.0), 1, 0.4, 1.0, 20)
              for i in range(20)]
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_momentum_warmup_divides():
    """Momentum warmup divides the regular value
    (get_warmup_momentum, momentum_updater.py:78-101)."""
    from sm3det_tpu.train.optim import make_momentum_schedule
    s = make_momentum_schedule("step", base_momentum=0.9, step_iters=(),
                               warmup="linear", warmup_iters=5,
                               warmup_ratio=0.8)
    for i in range(8):
        got = float(s(np.int32(i)))
        if i < 5:
            k = (1 - i / 5) * (1 - 0.8)
            assert abs(got - 0.9 / (1 - k)) < 1e-7, i
        else:
            assert abs(got - 0.9) < 1e-7


def test_dynamic_b1_adam_matches_static_when_constant():
    """scale_by_adam_dynamic_b1 with a constant schedule must equal
    optax.scale_by_adam exactly."""
    import jax
    import optax
    from sm3det_tpu.train.optim import scale_by_adam_dynamic_b1

    params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    ref_t = optax.scale_by_adam(b1=0.9, b2=0.999)
    dyn_t = scale_by_adam_dynamic_b1(lambda it: jnp.float32(0.9))
    s_ref, s_dyn = ref_t.init(params), dyn_t.init(params)
    key = jax.random.PRNGKey(0)
    for i in range(5):
        key, k = jax.random.split(key)
        g = {"w": jax.random.normal(k, (4,)),
             "b": jax.random.normal(k, (2,))}
        u_ref, s_ref = ref_t.update(g, s_ref)
        u_dyn, s_dyn = dyn_t.update(g, s_dyn)
        for n in ("w", "b"):
            np.testing.assert_allclose(np.asarray(u_ref[n]),
                                       np.asarray(u_dyn[n]),
                                       rtol=1e-5, atol=1e-6)


def test_one_cycle_and_linear_lr_match_mmcv():
    from sm3det_tpu.train.optim import make_lr_schedule

    # one_cycle two-phase (OneCycleLrUpdaterHook:646-670): phases
    # [pct*T-1, 1, div] then [T-1, div, 1/final_div]; get_lr anneals
    # base_lr(=max/div) * ratios
    T, pct, div, fdiv = 20, 0.3, 25.0, 1e4
    sched = make_lr_schedule("one_cycle", base_lr=0.01, max_iters=T,
                             start_percent=pct, div_factor=div,
                             final_div_factor=fdiv, warmup=None,
                             warmup_iters=0)
    got = [float(sched(np.int32(i))) for i in range(T)]

    def ref(it):
        base = 0.01 / div
        phases = [(pct * T - 1, 1.0, div), (T - 1, div, 1.0 / fdiv)]
        start = 0.0
        for end, s, e in phases:
            if it <= end:
                p = (it - start) / (end - start)
                return _ref_annealing_cos(base * s, base * e, p)
            start = end
        raise AssertionError

    np.testing.assert_allclose(got, [ref(i) for i in range(T)],
                               rtol=1e-5)
    # peak = max_lr at the phase boundary
    assert abs(max(got) - 0.01) < 1e-8

    # linear annealing (LinearAnnealingLrUpdaterHook:673-703)
    sched = make_lr_schedule("linear", base_lr=0.01, min_lr_ratio=0.1,
                             max_iters=10, warmup=None, warmup_iters=0)
    got = [float(sched(np.int32(i))) for i in range(10)]
    expect = [0.01 + (0.001 - 0.01) * (i / 10) for i in range(10)]
    np.testing.assert_allclose(got, expect, rtol=1e-6)
