"""Optimizer + LR schedule + DLA-scaled updates.

Reference semantics:
- AdamW lr 1e-4, wd 0.05 (``SM3Det_convnext_t.py:266-283``), grad clip from
  ``optimizer_config`` (mmrotate schedule_1x uses ``grad_clip=None`` by
  default; clip kept configurable).
- Step LR decay x0.1 at the configured iters, linear warmup 500 iters at
  ratio 1/3 (``lr_config``, mmcv ``LrUpdaterHook.get_warmup_lr``).
- DLA multiplies each submodule's LR per iteration
  (``dynamic_lr.py:163-175``); here the multiplier scales the AdamW update
  in-graph (identical effect on the weight delta).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from .dla import (DLAConfig, DLAState, dla_multipliers, init_dla_state,
                  label_params)


def _apply_warmup(lr, it, warmup: str, warmup_iters: int,
                  warmup_ratio: float):
    """mmcv ``LrUpdaterHook.get_warmup_lr`` (lr_updater.py:87-100):
    constant / linear / exp warmup applied to the regular lr."""
    if not warmup_iters or warmup is None:
        return lr
    if warmup == "constant":
        warm = lr * warmup_ratio
    elif warmup == "linear":
        k = (1.0 - it / warmup_iters) * (1.0 - warmup_ratio)
        warm = lr * (1.0 - k)
    elif warmup == "exp":
        warm = lr * warmup_ratio ** (1.0 - it / warmup_iters)
    else:
        raise ValueError(f"unknown warmup {warmup!r}")
    return jnp.where(it < warmup_iters, warm, lr)


def _annealing_cos(start, end, factor, weight=1.0):
    """mmcv ``annealing_cos`` (lr_updater.py:708): cosine from
    ``weight*start + (1-weight)*end`` to ``end``."""
    cos_out = jnp.cos(jnp.pi * factor) + 1.0
    return end + 0.5 * weight * (start - end) * cos_out


def _annealing_linear(start, end, factor):
    """mmcv ``annealing_linear`` (lr_updater.py:729)."""
    return start + (end - start) * factor


def _cyclic_value(it, base, target_ratio, cyclic_times, step_ratio_up,
                  anneal, gamma, max_iters):
    """mmcv ``CyclicLrUpdaterHook.get_lr`` (lr_updater.py:433-540) and
    the identical ``CyclicMomentumUpdaterHook`` (momentum_updater.py:291):
    per-cycle up-phase to ``base*target_ratio[0]`` then down to
    ``base*target_ratio[1]``, cosine or linear annealing inside each
    phase, cycle decay ``gamma`` shrinking the max-base gap."""
    max_iter_per_phase = max_iters // cyclic_times
    iter_up = int(step_ratio_up * max_iter_per_phase)
    curr_iter = jnp.mod(it, max_iter_per_phase)
    curr_cycle = jnp.floor_divide(it, max_iter_per_phase)
    scale = gamma ** curr_cycle
    fn = _annealing_cos if anneal == "cos" else _annealing_linear
    # up phase [0, iter_up): 1 -> target_ratio[0], end scaled
    end_up = 1.0 - scale + target_ratio[0] * scale
    v_up = fn(base * 1.0, base * end_up,
              jnp.where(iter_up > 0, curr_iter / max(iter_up, 1), 0.0))
    # down phase [iter_up, max_iter_per_phase): target_ratio[0] (scaled)
    # -> target_ratio[1]
    start_dn = 1.0 - scale + target_ratio[0] * scale
    v_dn = fn(base * start_dn, base * target_ratio[1],
              (curr_iter - iter_up) / max(max_iter_per_phase - iter_up, 1))
    return jnp.where(curr_iter < iter_up, v_up, v_dn)


def _cosine_restart_value(it, base, target, periods, restart_weights):
    """mmcv ``CosineRestartLrUpdaterHook.get_lr`` (lr_updater.py:358-404):
    per-period cosine annealing, each restart scaled by its weight."""
    cum = []
    total = 0
    for p in periods:
        total += p
        cum.append(total)
    lr = jnp.full((), base, jnp.float32)
    for i, (p, w) in enumerate(zip(periods, restart_weights)):
        nearest = 0 if i == 0 else cum[i - 1]
        alpha = jnp.minimum((it - nearest) / p, 1.0)
        v = _annealing_cos(base, target, alpha, w)
        in_period = (it >= nearest) & (it < cum[i])
        lr = jnp.where(in_period, v, lr)
    # past the last period: the reference raises; clamp to the final value
    last = _annealing_cos(base, target, 1.0, restart_weights[-1])
    return jnp.where(it >= cum[-1], last, lr)


def make_lr_schedule(policy: str = "step", base_lr: float = 1e-4,
                     step_iters: Sequence[int] = (), gamma: float = 0.1,
                     min_lr: Optional[float] = None,
                     min_lr_ratio: Optional[float] = None,
                     power: float = 1.0, max_iters: int = 1,
                     warmup: str = "linear", warmup_iters: int = 500,
                     warmup_ratio: float = 1.0 / 3.0,
                     periods: Sequence[int] = (),
                     restart_weights: Sequence[float] = (1.0,),
                     target_ratio=(10.0, 1e-4), cyclic_times: int = 1,
                     step_ratio_up: float = 0.4,
                     anneal_strategy: str = "cos",
                     cyclic_gamma: float = 1.0,
                     start_percent: float = 0.75,
                     div_factor: float = 25.0,
                     final_div_factor: float = 1e4):
    """LR-updater zoo as jnp schedule fns (by-iter policies of
    ``mmcv/mmcv/runner/hooks/lr_updater.py``):

    - ``step``: x gamma at each configured iter (``:171``)
    - ``cosine``: annealing_cos to min_lr / min_lr_ratio*base over
      max_iters (``:269``, ``annealing_cos`` ``:708``)
    - ``flat_cosine``: flat until start_percent*max_iters, then cosine
      (``FlatCosineAnnealingLrUpdaterHook`` ``:303``)
    - ``cosine_restart``: per-period cosine with restart weights
      (``CosineRestartLrUpdaterHook`` ``:358``)
    - ``cyclic``: CLR up/down phases with cycle decay
      (``CyclicLrUpdaterHook`` ``:433``)
    - ``one_cycle``: 1cycle policy, ``base_lr`` as max_lr,
      ``start_percent`` as pct_start (``OneCycleLrUpdaterHook`` ``:540``)
    - ``linear``: annealing_linear to min (``LinearAnnealingLrUpdaterHook``
      ``:673``)
    - ``poly``: (base - min) * (1 - t/T)^power + min (``:234``)
    - ``exp``: base * gamma^iter (``:222``)
    - ``inv``: base * (1 + gamma*iter)^-power (``:256``)
    - ``fixed``: constant (``:161``)

    DLA ('dynamic') runs as step + in-graph multipliers (train/dla.py).
    """
    step_iters = tuple(step_iters)

    def regular(it):
        if policy in ("step", "dynamic"):
            exp = jnp.zeros((), jnp.float32)
            for s in step_iters:
                exp = exp + (it >= s).astype(jnp.float32)
            lr = base_lr * (gamma ** exp)
            return jnp.maximum(lr, min_lr) if min_lr is not None else lr
        if policy == "cosine":
            target = base_lr * min_lr_ratio if min_lr_ratio is not None \
                else (min_lr or 0.0)
            frac = jnp.clip(it / max_iters, 0.0, 1.0)
            return target + 0.5 * (base_lr - target) * \
                (1.0 + jnp.cos(jnp.pi * frac))
        if policy == "flat_cosine":
            target = base_lr * min_lr_ratio if min_lr_ratio is not None \
                else (min_lr or 0.0)
            start = round(max_iters * start_percent)
            frac = jnp.clip((it - start) / max(max_iters - start, 1),
                            0.0, 1.0)
            return jnp.where(
                it < start, jnp.full((), base_lr, jnp.float32),
                _annealing_cos(base_lr, target, frac))
        if policy == "cosine_restart":
            target = base_lr * min_lr_ratio if min_lr_ratio is not None \
                else (min_lr or 0.0)
            return _cosine_restart_value(
                it, base_lr, target, tuple(periods),
                tuple(restart_weights))
        if policy == "cyclic":
            # NB: the reference cyclic hook's ``gamma`` (cycle decay,
            # default 1) is a different knob than step's decay gamma;
            # exposed as ``cyclic_gamma`` to avoid the collision
            return _cyclic_value(
                it, base_lr, tuple(target_ratio), cyclic_times,
                step_ratio_up, anneal_strategy, cyclic_gamma, max_iters)
        if policy == "one_cycle":
            # OneCycleLrUpdaterHook (lr_updater.py:540-670): base_lr is
            # max_lr/div_factor; up phase to max_lr, down to
            # base/final_div_factor (two-phase form)
            fn = _annealing_cos if anneal_strategy == "cos" \
                else _annealing_linear
            base = base_lr / div_factor
            e1 = float(start_percent * max_iters) - 1
            e2 = max_iters - 1
            pct1 = jnp.clip(it / max(e1, 1e-9), 0.0, 1.0)
            pct2 = jnp.clip((it - e1) / max(e2 - e1, 1e-9), 0.0, 1.0)
            up = fn(base * 1.0, base * div_factor, pct1)
            down = fn(base * div_factor, base / final_div_factor, pct2)
            return jnp.where(it <= e1, up, down)
        if policy == "linear":
            target = base_lr * min_lr_ratio if min_lr_ratio is not None \
                else (min_lr or 0.0)
            frac = jnp.clip(it / max_iters, 0.0, 1.0)
            return _annealing_linear(base_lr, target, frac)
        if policy == "poly":
            lo = min_lr or 0.0
            coeff = (1.0 - jnp.clip(it / max_iters, 0.0, 1.0)) ** power
            return (base_lr - lo) * coeff + lo
        if policy == "exp":
            return base_lr * gamma ** it
        if policy == "inv":
            return base_lr * (1.0 + gamma * it) ** (-power)
        if policy == "fixed":
            return jnp.full((), base_lr, jnp.float32)
        raise ValueError(f"unknown lr policy {policy!r}")

    def schedule(it):
        it = it.astype(jnp.float32) if hasattr(it, "astype") else \
            jnp.asarray(it, jnp.float32)
        return _apply_warmup(regular(it), it, warmup, warmup_iters,
                             warmup_ratio)

    return schedule


def step_lr(base_lr: float, step_iters: Sequence[int], gamma: float = 0.1,
            warmup_iters: int = 500, warmup_ratio: float = 1.0 / 3.0):
    """mmcv step policy + linear warmup as a jnp schedule fn."""
    return make_lr_schedule("step", base_lr, step_iters, gamma,
                            warmup_iters=warmup_iters,
                            warmup_ratio=warmup_ratio)


def make_momentum_schedule(policy: str = "cyclic",
                           base_momentum: float = 0.9,
                           step_iters: Sequence[int] = (),
                           gamma: float = 0.5,
                           min_momentum: Optional[float] = None,
                           min_momentum_ratio: Optional[float] = None,
                           max_iters: int = 1,
                           warmup: Optional[str] = None,
                           warmup_iters: int = 0,
                           warmup_ratio: float = 0.9,
                           target_ratio=(0.85 / 0.95, 1.0),
                           cyclic_times: int = 1,
                           step_ratio_up: float = 0.4,
                           anneal_strategy: str = "cos",
                           cyclic_gamma: float = 1.0):
    """Momentum-updater zoo as jnp schedule fns
    (``mmcv/mmcv/runner/hooks/momentum_updater.py``):

    - ``step``: x gamma at each configured iter, min clip
      (``StepMomentumUpdaterHook`` ``:165``)
    - ``cosine``: annealing_cos to the target
      (``CosineAnnealingMomentumUpdaterHook`` ``:217``)
    - ``linear``: annealing_linear (``:254``)
    - ``cyclic``: same phase machinery as cyclic LR
      (``CyclicMomentumUpdaterHook`` ``:291``)

    Momentum warmup DIVIDES the regular value (``get_warmup_momentum``
    ``:78-101``) — the inverse of LR warmup, so effective
    lr*momentum stays smooth.
    """
    step_iters = tuple(step_iters)

    def regular(it):
        if policy == "step":
            exp = jnp.zeros((), jnp.float32)
            for s in step_iters:
                exp = exp + (it >= s).astype(jnp.float32)
            m = base_momentum * (gamma ** exp)
            return jnp.maximum(m, min_momentum) \
                if min_momentum is not None else m
        if policy in ("cosine", "linear"):
            target = base_momentum * min_momentum_ratio \
                if min_momentum_ratio is not None else min_momentum
            frac = jnp.clip(it / max_iters, 0.0, 1.0)
            fn = _annealing_cos if policy == "cosine" \
                else _annealing_linear
            return fn(base_momentum, target, frac)
        if policy == "cyclic":
            return _cyclic_value(
                it, base_momentum, tuple(target_ratio), cyclic_times,
                step_ratio_up, anneal_strategy, cyclic_gamma, max_iters)
        raise ValueError(f"unknown momentum policy {policy!r}")

    def schedule(it):
        it = jnp.asarray(it, jnp.float32)
        m = regular(it)
        if not warmup_iters or warmup is None:
            return m
        if warmup == "constant":
            warm = m / warmup_ratio
        elif warmup == "linear":
            k = (1.0 - it / warmup_iters) * (1.0 - warmup_ratio)
            warm = m / (1.0 - k)
        elif warmup == "exp":
            warm = m / (warmup_ratio ** (1.0 - it / warmup_iters))
        else:
            raise ValueError(f"unknown warmup {warmup!r}")
        return jnp.where(it < warmup_iters, warm, m)

    return schedule


def scale_by_adam_dynamic_b1(momentum_schedule, b2: float = 0.999,
                             eps: float = 1e-8):
    """``optax.scale_by_adam`` with a per-step b1 driven by a momentum
    schedule — the TPU-native analog of mmcv's MomentumUpdaterHook
    writing ``betas[0]`` into AdamW param groups every iteration
    (``momentum_updater.py:38-53``: torch uses the CURRENT group betas
    for both the moment update and bias correction)."""

    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params))

    def update(updates, state, params=None):
        del params
        b1 = momentum_schedule(state.count)
        mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1.0 - b2) * g * g,
                          state.nu, updates)
        count = state.count + 1
        mu_hat = jax.tree.map(lambda m: m / (1.0 - b1 ** count), mu)
        nu_hat = jax.tree.map(lambda v: v / (1.0 - b2 ** count), nu)
        out = jax.tree.map(
            lambda m, v: m / (jnp.sqrt(v) + eps), mu_hat, nu_hat)
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


class TrainOptState(NamedTuple):
    adam: optax.OptState
    dla: DLAState
    step: jnp.ndarray
    # gradient accumulation carry: () when disabled, else
    # (grad_accumulator_tree, count) — GradientCumulativeOptimizerHook
    # semantics (mmcv/mmcv/runner/hooks/optimizer.py:103)
    accum: tuple = ()


def make_optimizer(base_lr: float = 1e-4, weight_decay: float = 0.05,
                   betas=(0.9, 0.999), grad_clip: Optional[float] = None,
                   step_iters: Sequence[int] = (), gamma: float = 0.1,
                   warmup_iters: int = 500, warmup_ratio: float = 1. / 3.,
                   dla_cfg: Optional[DLAConfig] = None,
                   accumulate: int = 1,
                   layer_decay: Optional[Dict] = None,
                   lr_policy: str = "step", warmup: str = "linear",
                   min_lr: Optional[float] = None,
                   min_lr_ratio: Optional[float] = None,
                   power: float = 1.0, max_iters: int = 1,
                   lr_schedule_kwargs: Optional[Dict] = None,
                   momentum_policy: Optional[str] = None,
                   momentum_kwargs: Optional[Dict] = None):
    """Returns (init_fn(params) -> TrainOptState,
                update_fn(grads, state, params, losses) -> (updates, state)).

    ``losses`` feeds DLA; pass None (or dla_cfg=None) for plain AdamW+step.
    ``accumulate=N`` applies averaged updates every N steps
    (``GradientCumulativeOptimizerHook``, mmcv optimizer.py:103).
    ``layer_decay=dict(rate, num_layers)`` applies per-depth LR multipliers
    (``LayerDecayOptimizerConstructor``,
    mmcv_custom/layer_decay_optimizer_constructor.py:30).
    ``lr_policy`` selects from the LR-updater zoo (see make_lr_schedule).
    """
    schedule = make_lr_schedule(
        lr_policy, base_lr, step_iters, gamma, min_lr=min_lr,
        min_lr_ratio=min_lr_ratio, power=power, max_iters=max_iters,
        warmup=warmup, warmup_iters=warmup_iters,
        warmup_ratio=warmup_ratio, **(lr_schedule_kwargs or {}))
    # learning_rate=1.0: the schedule (and DLA multiplier) scales updates
    # explicitly per-label below.
    if momentum_policy is not None:
        # per-iter b1 (MomentumUpdaterHook analog): the schedule drives
        # AdamW's first-moment beta exactly as mmcv writes betas[0]
        # into param groups each iteration
        m_sched = make_momentum_schedule(
            momentum_policy, base_momentum=betas[0],
            max_iters=max_iters, **(momentum_kwargs or {}))
        chain = [scale_by_adam_dynamic_b1(m_sched, b2=betas[1])]
    else:
        chain = [optax.scale_by_adam(b1=betas[0], b2=betas[1])]
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    adam = optax.chain(*chain)

    def init_fn(params):
        dla = init_dla_state(dla_cfg) if dla_cfg is not None \
            else init_dla_state(
                DLAConfig((), (), ()))
        accum = () if accumulate <= 1 else (
            jax.tree.map(jnp.zeros_like, params),
            jnp.zeros((), jnp.int32))
        return TrainOptState(adam=adam.init(params), dla=dla,
                             step=jnp.zeros((), jnp.int32), accum=accum)

    def apply_update(grads, state: TrainOptState, params, losses):
        if grad_clip:
            g_norm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip / jnp.maximum(g_norm, 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, adam_state = adam.update(grads, state.adam, params)
        lr = schedule(state.step)

        if dla_cfg is not None and losses is not None:
            mults, dla_state = dla_multipliers(state.dla, losses, dla_cfg)
            labels = label_params(params, dla_cfg.subnets)
            # during warmup the reference applies ONLY the warmup lr
            in_warmup = state.step < dla_cfg.warmup_iters
            updates = jax.tree_util.tree_map(
                lambda u, lab: u * (-lr) * jnp.where(
                    in_warmup, 1.0, mults[lab]),
                updates, labels)
        else:
            dla_state = state.dla
            updates = jax.tree.map(lambda u: u * (-lr), updates)

        if layer_decay is not None:
            from .extras import apply_layer_decay, layer_decay_scales
            scales = layer_decay_scales(
                params, num_layers=int(layer_decay["num_layers"]),
                decay_rate=float(layer_decay["rate"]))
            updates = apply_layer_decay(updates, scales)

        return updates, adam_state, dla_state

    def update_fn(grads, state: TrainOptState, params,
                  losses: Optional[Dict[str, jnp.ndarray]] = None):
        if accumulate <= 1:
            updates, adam_state, dla_state = apply_update(
                grads, state, params, losses)
            return updates, TrainOptState(
                adam=adam_state, dla=dla_state, step=state.step + 1,
                accum=())

        acc, count = state.accum
        acc = jax.tree.map(lambda a, g: a + g, acc, grads)
        count = count + 1

        def do_apply(_):
            mean = jax.tree.map(lambda a: a / accumulate, acc)
            updates, adam_state, dla_state = apply_update(
                mean, state, params, losses)
            zero = jax.tree.map(jnp.zeros_like, acc)
            return updates, adam_state, dla_state, \
                (zero, jnp.zeros((), jnp.int32))

        def skip(_):
            return (jax.tree.map(jnp.zeros_like, params), state.adam,
                    state.dla, (acc, count))

        updates, adam_state, dla_state, accum = jax.lax.cond(
            count >= accumulate, do_apply, skip, None)
        return updates, TrainOptState(
            adam=adam_state, dla=dla_state, step=state.step + 1,
            accum=accum)

    return init_fn, update_fn, schedule
