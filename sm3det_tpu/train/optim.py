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


def make_lr_schedule(policy: str = "step", base_lr: float = 1e-4,
                     step_iters: Sequence[int] = (), gamma: float = 0.1,
                     min_lr: Optional[float] = None,
                     min_lr_ratio: Optional[float] = None,
                     power: float = 1.0, max_iters: int = 1,
                     warmup: str = "linear", warmup_iters: int = 500,
                     warmup_ratio: float = 1.0 / 3.0):
    """LR-updater zoo as jnp schedule fns (by-iter policies of
    ``mmcv/mmcv/runner/hooks/lr_updater.py``):

    - ``step``: x gamma at each configured iter (``:171``)
    - ``cosine``: annealing_cos to min_lr / min_lr_ratio*base over
      max_iters (``:269``, ``annealing_cos`` ``:708``)
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
                   power: float = 1.0, max_iters: int = 1):
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
        warmup_ratio=warmup_ratio)
    # learning_rate=1.0: the schedule (and DLA multiplier) scales updates
    # explicitly per-label below.
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
