"""Dynamic Learning-rate Adjustment (DLA), fully in-graph.

Parity target: ``mmrotate/core/hook/dynamic_lr.py:45-220``. The reference
is a host-side hook that rewrites per-param-group LRs each iteration from
EMA loss ratios; here the whole policy lives inside the jitted train step:
per-head multipliers ``N * softmax((ema_i / loss_i) / T)`` averaged per
subnet, and a shared-backbone multiplier from one of the policies
{min, avg, max, kl, sigmoid_kl} over the softmaxed loss distributions
(``:144-161``). EMA priming during warmup matches ``:194-218``: EMAs
update every iteration, multipliers switch on once
``steps >= warmup_iters``.

State is a tiny pytree carried in the optimizer state — zero host syncs.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# flagship mapping (config ``lr_config.reweight_losses``,
# SM3Det_convnext_t.py:300-304)
DEFAULT_REWEIGHT_LOSSES: Tuple[Tuple[str, str], ...] = (
    ("sar_loss_cls", "sar_bbox_head"),
    ("sar_loss_bbox", "sar_bbox_head"),
    ("sar_loss_dfl", "sar_bbox_head"),
    ("rgb_loss_rpn_cls", "rgb_rpn_head"),
    ("rgb_loss_rpn_bbox", "rgb_rpn_head"),
    ("rgb_loss_cls", "rgb_roi_head"),
    ("rgb_loss_bbox", "rgb_roi_head"),
    ("ifr_loss_rpn_cls", "ifr_rpn_head"),
    ("ifr_loss_rpn_bbox", "ifr_rpn_head"),
    ("ifr_loss_cls", "ifr_roi_head"),
    ("ifr_loss_bbox", "ifr_roi_head"),
)


class DLAState(NamedTuple):
    ema: jnp.ndarray          # (L,) per-loss EMA
    initialized: jnp.ndarray  # (L,) bool — EMA seeded with first value
    steps: jnp.ndarray        # () int32


class DLAConfig(NamedTuple):
    loss_names: Tuple[str, ...]
    subnet_of: Tuple[str, ...]          # subnet per loss, same order
    subnets: Tuple[str, ...]            # unique subnet names
    T: float = 3.0
    b: float = 0.4
    ema_beta: float = 0.001
    backbone_policy: str = "sigmoid_kl"
    head_policy: str = "normal"
    warmup_iters: int = 500


def reweight_for_variant(sar_stages: int = 1, rot_stages: int = 2):
    """Loss->subnet mapping matching each TriSource variant's loss names
    (the reference configures ``reweight_losses`` per experiment)."""
    out = []
    if sar_stages == 1:
        out += [("sar_loss_cls", "sar_bbox_head"),
                ("sar_loss_bbox", "sar_bbox_head"),
                ("sar_loss_dfl", "sar_bbox_head")]
    else:
        out += [("sar_loss_rpn_cls", "sar_rpn_head"),
                ("sar_loss_rpn_bbox", "sar_rpn_head"),
                ("sar_loss_cls", "sar_roi_head"),
                ("sar_loss_bbox", "sar_roi_head")]
    for m in ("rgb", "ifr"):
        if rot_stages == 1:
            out += [(f"{m}_loss_cls", f"{m}_bbox_head"),
                    (f"{m}_loss_bbox", f"{m}_bbox_head")]
        else:
            out += [(f"{m}_loss_rpn_cls", f"{m}_rpn_head"),
                    (f"{m}_loss_rpn_bbox", f"{m}_rpn_head"),
                    (f"{m}_loss_cls", f"{m}_roi_head"),
                    (f"{m}_loss_bbox", f"{m}_roi_head")]
    return tuple(out)


def make_dla_config(reweight=DEFAULT_REWEIGHT_LOSSES, T=3.0, b=0.4,
                    ema_beta=0.001, backbone_policy="sigmoid_kl",
                    head_policy="normal", warmup_iters=500) -> DLAConfig:
    names = tuple(k for k, _ in reweight)
    subnet_of = tuple(v for _, v in reweight)
    subnets = tuple(dict.fromkeys(subnet_of))
    return DLAConfig(names, subnet_of, subnets, T, b, ema_beta,
                     backbone_policy, head_policy, warmup_iters)


def init_dla_state(cfg: DLAConfig) -> DLAState:
    # min size 1: a DLA-less run carries an empty config, and orbax
    # refuses to checkpoint zero-size arrays ("Cannot save arrays with
    # zero size") — the padded slot is never read without a config
    n = max(len(cfg.loss_names), 1)
    return DLAState(
        ema=jnp.full((n,), 1e-3, jnp.float32),
        initialized=jnp.zeros((n,), bool),
        steps=jnp.zeros((), jnp.int32))


def _kl(p, q):
    """KL(p || q)/len — matches torch F.kl_div(q.log(), p, 'batchmean')."""
    return jnp.sum(p * (jnp.log(jnp.clip(p, 1e-12))
                        - jnp.log(jnp.clip(q, 1e-12)))) / p.shape[0]


def dla_multipliers(state: DLAState, losses: Dict[str, jnp.ndarray],
                    cfg: DLAConfig):
    """One DLA iteration: (subnet multipliers dict incl. '_shared_',
    new state). Multipliers are 1.0 while EMA is priming."""
    cur = jnp.stack([losses[k] for k in cfg.loss_names])   # (L,)
    cur = jax.lax.stop_gradient(cur)
    n = cur.shape[0]

    ema = state.ema
    primed = state.steps >= cfg.warmup_iters

    # per-loss weights
    if cfg.head_policy == "reverse":
        w = cur / jnp.clip(ema, 1e-12)
    else:
        w = ema / jnp.clip(cur, 1e-12)
    batch_weight = n * jax.nn.softmax(w / cfg.T)
    batch_weight = jnp.where(primed & (cfg.head_policy != "None"),
                             batch_weight, jnp.ones_like(batch_weight))

    # average per subnet
    subnet_mult = {}
    for s in cfg.subnets:
        mask = jnp.asarray(
            [1.0 if sn == s else 0.0 for sn in cfg.subnet_of])
        subnet_mult[s] = jnp.sum(batch_weight * mask) / jnp.sum(mask)

    # shared (backbone/neck) multiplier
    vals = jnp.stack(list(subnet_mult.values()))
    if cfg.backbone_policy == "min":
        shared = jnp.min(vals)
    elif cfg.backbone_policy == "avg":
        shared = jnp.mean(vals)
    elif cfg.backbone_policy == "max":
        shared = jnp.max(vals)
    elif cfg.backbone_policy in ("kl", "sigmoid_kl"):
        hist_p = jax.nn.softmax(ema)
        cur_p = jax.nn.softmax(cur)
        kl = _kl(hist_p, cur_p)
        if cfg.backbone_policy == "kl":
            shared = 1.0 + (1.0 - kl) / np.sqrt(cfg.T)
        else:
            shared = jax.nn.sigmoid((1.0 - kl - cfg.b) * cfg.T) * 2.0
    else:
        shared = jnp.ones(())
    shared = jnp.where(primed, shared, 1.0)
    subnet_mult["_shared_"] = shared

    # EMA update (reference EMA_meter: first update seeds with the value)
    beta = cfg.ema_beta
    new_ema = jnp.where(state.initialized,
                        (1 - beta) * ema + beta * cur, cur)
    new_state = DLAState(
        ema=new_ema,
        initialized=jnp.ones_like(state.initialized),
        steps=state.steps + 1)
    return subnet_mult, new_state


def label_params(params, subnets: Sequence[str]):
    """Label each param leaf with its subnet or '_shared_' — the
    reference maps param-groups by name prefix (``dynamic_lr.py:177-191``,
    which walks named_parameters so nested modules inherit the subnet).

    Matches every dotted-path component (not just the top-level module
    name) so a head registered under a wrapper module still labels
    correctly; raises if a configured subnet matches no leaf (a silent
    fall-through to '_shared_' would quietly disable DLA for that head).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_of_path(path):
        comps = [str(p.key) for p in path if hasattr(p, "key")]
        for s in subnets:
            if any(s in comp for comp in comps):
                return s
        return "_shared_"

    labels = [label_of_path(path) for path, _ in flat]
    matched = set(labels)
    missing = [s for s in subnets if s not in matched]
    if missing:
        raise ValueError(
            f"DLA subnets {missing} matched no parameter leaf; "
            f"check the model's module names (labels seen: "
            f"{sorted(matched)})")
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, labels)
