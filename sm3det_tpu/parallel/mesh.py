"""Device mesh + sharding rules (TPU-native replacement for the
reference's NCCL DDP, SURVEY.md §2.5).

The reference is data-parallel only (``MMDistributedDataParallel``); the
TPU re-design adds expert parallelism for free: the MoE expert weights are
stacked on a leading expert axis, so sharding that axis over the 'expert'
mesh dimension turns the per-expert FFN einsum into an all-to-all-routed
EP matmul — XLA/GSPMD inserts the collectives. Everything else is DP:
batch sharded over 'data', parameters replicated, gradients psum'd by XLA.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, expert_parallel: int = 1):
    """Mesh over ('data', 'expert')."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % expert_parallel == 0, (n, expert_parallel)
    arr = np.asarray(devices).reshape(n // expert_parallel, expert_parallel)
    return Mesh(arr, ("data", "expert"))


def param_sharding(mesh: Mesh, params):
    """Sharding tree: MoE expert-stacked weights over 'expert', rest
    replicated. Expert weights are identified by their leading expert axis
    inside an ``experts`` module scope (see models/moe.py ExpertFFN)."""
    def spec_for(path, leaf):
        names = [str(getattr(p, "key", "")) for p in path]
        if any("experts" in n for n in names) and leaf.ndim >= 2:
            return NamedSharding(mesh, P("expert"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def batch_sharding(mesh: Mesh, batch):
    """Shard every array's leading (batch) dim over 'data'."""
    sh = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda _: sh, batch)


def replicated(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda _: sh, tree)


def zero1_opt_sharding(mesh: Mesh, opt_state, min_size: int = 2 ** 12):
    """ZeRO-1-analog sharding tree for optimizer state (SURVEY §2.5:
    the reference's only optimizer-state sharding is DeepSpeed ZeRO in
    BabelRS_pretrain; on TPU it falls out of pjit sharding rules).

    Every AdamW moment / accumulator leaf is sharded over the 'data'
    mesh axis along its largest divisible dimension (expert-stacked
    leaves keep their 'expert' axis-0 sharding and additionally shard a
    later axis over 'data' when possible); tiny leaves and scalars stay
    replicated. The update math is elementwise in the moments, so GSPMD
    keeps the sharded layout through the step — cutting per-device
    optimizer-state memory by ~dp with no semantic change
    (tests/test_mesh_sharding.py asserts step equality).
    """
    dp = mesh.shape["data"]

    def spec_for(path, leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim == 0 or \
                getattr(leaf, "size", 0) < min_size:
            return NamedSharding(mesh, P())
        names = [str(getattr(p, "key", "")) for p in path]
        expert = any("experts" in n for n in names) and leaf.ndim >= 2
        axes = [None] * leaf.ndim
        if expert:
            axes[0] = "expert"
        # largest remaining axis divisible by dp carries 'data'
        for ax in sorted(range(1 if expert else 0, leaf.ndim),
                         key=lambda a: -leaf.shape[a]):
            if leaf.shape[ax] % dp == 0:
                axes[ax] = "data"
                break
        return NamedSharding(mesh, P(*axes))

    return jax.tree_util.tree_map_with_path(spec_for, opt_state)
