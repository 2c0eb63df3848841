"""Train step builder: one jitted SPMD program = forward + losses + DLA +
AdamW update (replaces IterBasedRunner.train + OptimizerHook +
DynamicLrUpdaterHook per-iter host logic, SURVEY.md §3.1 hot loop).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.detectors.trisource import TriSourceDetector
from .dla import DLAConfig
from .optim import TrainOptState, make_optimizer


class TrainState(NamedTuple):
    params: Any
    opt: TrainOptState
    rng: jax.Array
    # previous-iteration reweighted losses (DWA carry; zeros = unset)
    prev_losses: Any = None
    # EMA of params (EMAHook parity; None = disabled)
    ema: Any = None


def init_trisource(rng, model: TriSourceDetector, sample_batch,
                   source_ratio=(2, 1, 1)):
    p_rng, d_rng, n_rng, s_rng = jax.random.split(rng, 4)

    # jit the whole init: eager per-op dispatch is pathological on the
    # TPU tunnel (each op compiles separately)
    @jax.jit
    def _init(batch):
        return model.init(
            {"params": p_rng, "dropout": d_rng, "moe_noise": n_rng,
             "sampling": s_rng},
            batch, source_ratio=source_ratio, train=True)

    return _init(sample_batch)["params"]


def build_train_step(model: TriSourceDetector, init_fn, update_fn,
                     source_ratio=(2, 1, 1), loss_weights=None,
                     multi_tasks_reweight=None, dwa_T: float = 2.0,
                     donate: bool = True, ema_decay: float = 0.0):
    """Returns train_step(state, batch) -> (state, metrics).

    The loss is the plain sum of the loss dict (the reference's
    ``_parse_losses``). ``multi_tasks_reweight='dwa'`` applies Dynamic
    Weight Averaging (``trisource_...:355-367``): per-loss weight
    ``N * softmax((L_t / L_{t-1}) / T)`` with the previous losses carried
    in the train state ('uncertainty' lives inside the model).
    """
    from ..models.detectors.trisource import REWEIGHT_LOSS_KEYS

    compute_dtype = model.cfg.get("compute_dtype") \
        if isinstance(model.cfg, dict) else None

    def loss_fn(params, batch, rngs, prev_losses):
        # bf16 policy: master params stay fp32 in the optimizer; the
        # forward sees a bf16 copy (grad of the cast upcasts back), loss
        # math is fp32 via the detector's head-output casts. TPU needs
        # no loss scaling (bf16 exponent range == fp32).
        p = params if compute_dtype is None else jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if x.dtype == jnp.float32 else x, params)
        losses = model.apply(
            {"params": p}, batch, source_ratio=source_ratio,
            train=True, rngs=rngs)
        total = jnp.zeros(())
        if "reweighted_total_losses" in losses:
            # uncertainty mode: the reweighted sum replaces the
            # individual task losses (kept as stop-grad metrics)
            for k, v in losses.items():
                if k in REWEIGHT_LOSS_KEYS:
                    continue
                total = total + v
        elif multi_tasks_reweight == "dwa":
            cur = jnp.stack([losses[k] for k in REWEIGHT_LOSS_KEYS
                             if k in losses])
            prev = prev_losses
            has_prev = jnp.any(prev > 0)
            w_i = jax.lax.stop_gradient(cur) / jnp.maximum(prev, 1e-12)
            n = cur.shape[0]
            bw = jnp.where(has_prev,
                           n * jax.nn.softmax(w_i / dwa_T),
                           jnp.ones((n,)))
            total = jnp.sum(cur * bw)
            for k, v in losses.items():
                if k not in REWEIGHT_LOSS_KEYS:
                    total = total + v
        else:
            for k, v in losses.items():
                w = 1.0 if loss_weights is None \
                    else loss_weights.get(k, 1.0)
                total = total + w * v
        return total, losses

    def train_step(state: TrainState, batch):
        rng, r_drop, r_noise, r_samp = jax.random.split(state.rng, 4)
        rngs = {"dropout": r_drop, "moe_noise": r_noise, "sampling": r_samp}
        n_rw = len(REWEIGHT_LOSS_KEYS)
        prev = state.prev_losses if state.prev_losses is not None \
            else jnp.zeros((n_rw,))
        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, rngs, prev)
        updates, opt_state = update_fn(
            grads, state.opt, state.params, losses)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        metrics = dict(losses)
        metrics["loss"] = total
        new_prev = jnp.stack([
            jax.lax.stop_gradient(losses[k]) if k in losses
            else jnp.zeros(()) for k in REWEIGHT_LOSS_KEYS]) \
            if multi_tasks_reweight == "dwa" else state.prev_losses
        ema = state.ema
        if ema_decay and ema is not None:
            from .extras import ema_update
            ema = ema_update(ema, params, decay=ema_decay)
        return TrainState(params=params, opt=opt_state, rng=rng,
                          prev_losses=new_prev, ema=ema), metrics

    return train_step


def state_sharding(mesh, state: TrainState,
                   zero1: bool = False) -> TrainState:
    """Sharding tree for a TrainState: expert-stacked params (and their
    mirrored AdamW moments / accumulators, whose pytree paths contain the
    same ``experts`` scope) over 'expert'; everything else replicated.
    ``zero1=True`` additionally shards the optimizer moments over the
    'data' axis (ZeRO-1 analog, ``parallel/mesh.py::zero1_opt_sharding``)."""
    from ..parallel.mesh import param_sharding, zero1_opt_sharding

    return TrainState(
        params=param_sharding(mesh, state.params),
        opt=zero1_opt_sharding(mesh, state.opt) if zero1
        else param_sharding(mesh, state.opt),
        rng=NamedSharding(mesh, P()),
        prev_losses=None if state.prev_losses is None
        else jax.tree.map(lambda _: NamedSharding(mesh, P()),
                          state.prev_losses),
        ema=None if state.ema is None
        else param_sharding(mesh, state.ema))


def shard_train_step(train_step, mesh, state, batch, donate: bool = True,
                     zero1: bool = False):
    """jit the step over the mesh: batch sharded on 'data', state
    replicated except expert-parallel params/moments (and, with
    ``zero1=True``, data-axis-sharded optimizer moments). Returns
    (jitted_step, sharded_state, put_batch) where ``put_batch`` shards a
    host batch onto the mesh."""
    from ..parallel.mesh import batch_sharding

    st_sh = state_sharding(mesh, state, zero1=zero1)
    b_sh = batch_sharding(mesh, batch)
    if jax.process_count() > 1:
        # multi-process: device_put onto non-addressable shardings runs a
        # cross-process assert_equal allgather (deadlock-prone before the
        # SPMD program exists). Build global arrays collective-free from
        # each process's full host copy instead: the callback hands every
        # addressable shard its slice.
        def to_global(x, sh):
            arr = np.asarray(x)
            return jax.make_array_from_callback(
                arr.shape, sh, lambda idx: arr[idx])

        sharded_state = jax.tree.map(to_global, state, st_sh)
    else:
        sharded_state = jax.device_put(state, st_sh)
    jstep = jax.jit(
        train_step,
        in_shardings=(st_sh, b_sh),
        out_shardings=(st_sh, NamedSharding(mesh, P())),
        donate_argnums=(0,) if donate else ())

    def put_batch(b):
        if jax.process_count() > 1:
            # multi-host: each process holds only its local slice of the
            # global batch (per-host loader shard); assemble the global
            # array from process-local data
            return jax.tree.map(
                lambda s, x: jax.make_array_from_process_local_data(s, x),
                b_sh, b)
        return jax.device_put(b, b_sh)

    return jstep, sharded_state, put_batch
