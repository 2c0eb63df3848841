"""DLA trajectory tests: the in-graph policy must reproduce the reference
hook's math (``dynamic_lr.py:107-175``) — EMA priming during warmup,
per-head softmax weights, sigmoid_kl backbone multiplier."""

import numpy as np
import jax.numpy as jnp

from sm3det_tpu.train.dla import (DLAState, dla_multipliers,
                                  init_dla_state, make_dla_config,
                                  label_params)


def _reference_step(ema, initialized, steps, losses, names, subnet_of,
                    T, b, beta, warmup_iters, policy="sigmoid_kl"):
    """Straight python re-derivation of the reference formulas."""
    cur = np.array([losses[k] for k in names], np.float64)
    primed = steps >= warmup_iters
    if primed:
        w = ema / np.maximum(cur, 1e-12)
        e = np.exp(w / T - np.max(w / T))
        batch_weight = len(cur) * e / e.sum()
    else:
        batch_weight = np.ones(len(cur))
    subnets = list(dict.fromkeys(subnet_of))
    sub_mult = {}
    for s in subnets:
        idx = [i for i, sn in enumerate(subnet_of) if sn == s]
        sub_mult[s] = batch_weight[idx].mean()
    if primed and policy == "sigmoid_kl":
        p = np.exp(ema - ema.max()); p /= p.sum()
        q = np.exp(cur - cur.max()); q /= q.sum()
        kl = np.sum(p * (np.log(p) - np.log(q))) / len(p)
        shared = 2.0 / (1.0 + np.exp(-(1.0 - kl - b) * T))
    else:
        shared = 1.0
    new_ema = np.where(initialized, (1 - beta) * ema + beta * cur, cur)
    return sub_mult, shared, new_ema


def test_dla_matches_reference_math():
    cfg = make_dla_config(T=3.0, b=0.4, ema_beta=0.01, warmup_iters=3)
    state = init_dla_state(cfg)
    rng = np.random.RandomState(0)

    ema_ref = np.full(len(cfg.loss_names), 1e-3)
    initialized = np.zeros(len(cfg.loss_names), bool)

    for step in range(8):
        losses = {k: float(rng.uniform(0.1, 2.0))
                  for k in cfg.loss_names}
        jl = {k: jnp.asarray(v) for k, v in losses.items()}
        mults, state = dla_multipliers(state, jl, cfg)

        sub_ref, shared_ref, ema_ref_new = _reference_step(
            ema_ref, initialized, step, losses, cfg.loss_names,
            cfg.subnet_of, cfg.T, cfg.b, cfg.ema_beta, cfg.warmup_iters)
        for s in cfg.subnets:
            if step < cfg.warmup_iters:
                assert float(mults[s]) == 1.0, (step, s)
            else:
                assert np.isclose(float(mults[s]), sub_ref[s],
                                  rtol=1e-4), (step, s)
        if step < cfg.warmup_iters:
            assert float(mults["_shared_"]) == 1.0
        else:
            assert np.isclose(float(mults["_shared_"]), shared_ref,
                              rtol=1e-4), step
        ema_ref = ema_ref_new
        initialized[:] = True
        assert np.allclose(np.asarray(state.ema), ema_ref, rtol=1e-5)


def test_label_params():
    params = {
        "backbone": {"w": np.zeros(2)},
        "neck": {"w": np.zeros(2)},
        "sar_bbox_head": {"w": np.zeros(2)},
        "rgb_rpn_head": {"w": np.zeros(2)},
        "rgb_roi_head": {"w": np.zeros(2)},
        # nested under a wrapper module: must still label (the reference
        # walks named_parameters, so nesting inherits the prefix)
        "heads": {"ifr_rpn_head": {"w": np.zeros(2)},
                  "ifr_roi_head": {"w": np.zeros(2)}},
    }
    cfg = make_dla_config()
    labels = label_params(params, cfg.subnets)
    assert labels["backbone"]["w"] == "_shared_"
    assert labels["neck"]["w"] == "_shared_"
    assert labels["sar_bbox_head"]["w"] == "sar_bbox_head"
    assert labels["rgb_rpn_head"]["w"] == "rgb_rpn_head"
    assert labels["heads"]["ifr_rpn_head"]["w"] == "ifr_rpn_head"
    assert labels["heads"]["ifr_roi_head"]["w"] == "ifr_roi_head"


def test_label_params_missing_subnet_raises():
    """A configured subnet that matches no leaf must raise, not silently
    fall to '_shared_' (which would disable DLA for that head)."""
    import pytest
    params = {"backbone": {"w": np.zeros(2)},
              "sar_bbox_head": {"w": np.zeros(2)}}
    cfg = make_dla_config()
    with pytest.raises(ValueError, match="matched no parameter leaf"):
        label_params(params, cfg.subnets)
