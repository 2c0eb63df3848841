"""Training extras: EMA, mixed precision, layer-decay scales.

Parity targets (SURVEY.md §2.3/§2.8):
- ``GradientCumulativeOptimizerHook`` (``mmcv/runner/hooks/optimizer.py:103``)
  -> ``make_optimizer(accumulate=N)`` in optim.py (in-graph lax.cond).
- ``EMAHook`` -> params EMA carried in the train state
  (``build_train_step(ema_decay=...)``).
- ``Fp16OptimizerHook``/``wrap_fp16_model`` -> bf16 compute policy (TPU
  needs no loss scaling; params stay fp32, compute casts to bf16).
- ``LayerDecayOptimizerConstructor`` (``mmcv_custom/layer_decay_optimizer_
  constructor.py:30``) -> per-depth LR multipliers as an optax mask tree,
  applied by ``make_optimizer(layer_decay=...)`` (uses the backbone's
  layer-depth convention: stem=0, blocks by stage).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def ema_update(ema_params, params, decay: float = 0.9998):
    """EMAHook semantics: ema = decay*ema + (1-decay)*params."""
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)


def bf16_policy(params):
    """Cast-to-compute helper: params stay fp32 (master weights); returns
    a bf16 copy for the forward (wrap_fp16_model equivalent — bf16 on TPU
    needs no loss scaling)."""
    return jax.tree.map(
        lambda p: p.astype(jnp.bfloat16)
        if p.dtype == jnp.float32 else p, params)


def layer_decay_scales(params, num_layers: int, decay_rate: float,
                       depth_of: Optional[Callable] = None):
    """Per-parameter LR multiplier tree: ``decay_rate^(num_layers-depth)``.

    ``depth_of(path_keys) -> int`` maps a param path to its layer depth;
    the default understands our ConvNeXt/Swin naming (stem=0,
    stage{i}_block{j} by cumulative block index, heads = max depth).
    """
    def default_depth(keys):
        depth = num_layers  # heads / necks get max depth (lr x1)
        for k in keys:
            s = str(k)
            if "stem" in s or "patch_embed" in s or s == "pos_embed":
                return 0
            if s.startswith("stage"):
                try:
                    stage = int(s[5])
                    block = int(s.split("block")[1].split("_")[0])
                except (ValueError, IndexError):
                    return depth
                return stage * 3 + block + 1
            if s.startswith("block") and s[5:].isdigit():
                # flat ViT naming block{i} -> depth i+1 (the reference's
                # get_num_layer_for_vit, mmcv_custom/
                # layer_decay_optimizer_constructor.py:20-28)
                return int(s[5:]) + 1
        return depth

    depth_fn = depth_of or default_depth

    def scale_for(path, _):
        keys = [getattr(p, "key", "") for p in path]
        d = min(depth_fn(keys), num_layers)
        return decay_rate ** (num_layers - d)

    return jax.tree_util.tree_map_with_path(scale_for, params)


def apply_layer_decay(updates, scales):
    return jax.tree.map(lambda u, s: u * s, updates, scales)
