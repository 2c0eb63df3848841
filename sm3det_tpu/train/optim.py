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


def step_lr(base_lr: float, step_iters: Sequence[int], gamma: float = 0.1,
            warmup_iters: int = 500, warmup_ratio: float = 1.0 / 3.0):
    """mmcv step policy + linear warmup as a jnp schedule fn."""
    step_iters = tuple(step_iters)

    def schedule(it):
        it = it.astype(jnp.float32) if hasattr(it, "astype") else \
            jnp.asarray(it, jnp.float32)
        exp = jnp.zeros((), jnp.float32)
        for s in step_iters:
            exp = exp + (it >= s).astype(jnp.float32)
        lr = base_lr * (gamma ** exp)
        # linear warmup: lr * (1 - (1 - it/warmup) * (1 - ratio))
        k = (1.0 - it / warmup_iters) * (1.0 - warmup_ratio)
        warm = lr * (1.0 - k)
        return jnp.where(it < warmup_iters, warm, lr)

    return schedule


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
                   layer_decay: Optional[Dict] = None):
    """Returns (init_fn(params) -> TrainOptState,
                update_fn(grads, state, params, losses) -> (updates, state)).

    ``losses`` feeds DLA; pass None (or dla_cfg=None) for plain AdamW+step.
    ``accumulate=N`` applies averaged updates every N steps
    (``GradientCumulativeOptimizerHook``, mmcv optimizer.py:103).
    ``layer_decay=dict(rate, num_layers)`` applies per-depth LR multipliers
    (``LayerDecayOptimizerConstructor``,
    mmcv_custom/layer_decay_optimizer_constructor.py:30).
    """
    schedule = step_lr(base_lr, step_iters, gamma, warmup_iters,
                       warmup_ratio)
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
