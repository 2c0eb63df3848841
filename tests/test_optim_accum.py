"""GradientCumulativeOptimizerHook parity: ``make_optimizer(accumulate=N)``
defers N-1 steps (zero updates, untouched Adam state) then applies exactly
the update a plain optimizer computes from the mean gradient
(mmcv/mmcv/runner/hooks/optimizer.py:103 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from sm3det_tpu.train.optim import make_optimizer

KW = dict(base_lr=1e-3, weight_decay=0.0, warmup_ratio=1.0)


def _tree_eq(a, b, tol=0.0):
    ok = jax.tree.map(
        lambda x, y: np.abs(np.asarray(x) - np.asarray(y)).max() <= tol,
        a, b)
    return all(jax.tree.leaves(ok))


def test_accumulate_defers_then_applies_mean_update():
    params = {"w": jnp.ones((4, 3)), "b": jnp.zeros((3,))}
    g1 = jax.tree.map(lambda p: jnp.full_like(p, 0.1), params)
    g2 = jax.tree.map(lambda p: jnp.full_like(p, 0.3), params)

    init_a, update_a, _ = make_optimizer(accumulate=2, **KW)
    s = init_a(params)
    u1, s = update_a(g1, s, params)
    assert _tree_eq(u1, jax.tree.map(jnp.zeros_like, params))
    u2, s = update_a(g2, s, params)

    init_b, update_b, _ = make_optimizer(**KW)
    sb = init_b(params)
    mean = jax.tree.map(lambda a, b: (a + b) / 2.0, g1, g2)
    ub, sb = update_b(mean, sb, params)

    assert _tree_eq(u2, ub, tol=1e-7)
    # accumulator reset after the apply step
    acc, count = s.accum
    assert int(count) == 0
    assert _tree_eq(acc, jax.tree.map(jnp.zeros_like, params))


def test_accumulate_cycle_repeats():
    params = {"w": jnp.ones((2,))}
    g = {"w": jnp.full((2,), 0.5)}
    init_a, update_a, _ = make_optimizer(accumulate=3, **KW)
    s = init_a(params)
    applied = []
    for i in range(6):
        u, s = update_a(g, s, params)
        applied.append(float(np.abs(np.asarray(u["w"])).max()) > 0)
    assert applied == [False, False, True, False, False, True]
