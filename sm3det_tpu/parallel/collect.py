"""Multi-process result collection for distributed evaluation.

Parity target: ``mmcv/mmcv/engine/test.py:97-164`` (``collect_results_cpu``:
rank-sharded eval parts are pickled to a shared tmpdir, rank 0 interleaves
them back into dataset order). The TPU-native version replaces the
torch.distributed barrier/broadcast with ``multihost_utils`` sync over the
JAX global mesh, so it works on any ``jax.distributed`` run (CPU gloo or
TPU pods) with a shared filesystem.
"""

from __future__ import annotations

import os
import pickle
import tempfile
from typing import List, Optional, Sequence

import jax


def _barrier(name: str):
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def shard_indices(n: int, process_id: Optional[int] = None,
                  num_processes: Optional[int] = None) -> List[int]:
    """This process's stride of ``range(n)`` (rank-interleaved, matching
    the reference's ``DistributedSampler``-style eval sharding)."""
    p = jax.process_index() if process_id is None else process_id
    np_ = jax.process_count() if num_processes is None else num_processes
    return list(range(p, n, np_))


def collect_results_cpu(part_results: Sequence, size: int,
                        tmpdir: Optional[str] = None):
    """Gather rank-sharded eval results.

    ``part_results[j]`` must be the result for global index
    ``shard_indices(size)[j]``. Returns the full ordered list on process 0
    and ``None`` elsewhere (reference contract, ``engine/test.py:97-139``).
    Single-process: returns ``list(part_results)`` directly.
    """
    if jax.process_count() == 1:
        return list(part_results)[:size]
    if tmpdir is None:
        # per-run unique dir shared by all ranks: rank 0 draws a random
        # token and broadcasts it, so two concurrent jobs on one machine
        # can never overwrite each other's part files (the reference
        # broadcasts a mkdtemp name the same way, ``engine/test.py:97``)
        import numpy as np
        from jax.experimental import multihost_utils
        token = int(multihost_utils.broadcast_one_to_all(
            np.int64(np.random.randint(0, 2**31 - 1))))
        tmpdir = os.path.join(tempfile.gettempdir(),
                              f"sm3det_collect_{token}")
    os.makedirs(tmpdir, exist_ok=True)
    rank = jax.process_index()
    with open(os.path.join(tmpdir, f"part_{rank}.pkl"), "wb") as f:
        pickle.dump(list(part_results), f)
    _barrier("collect_results_write")
    if rank != 0:
        _barrier("collect_results_read")
        return None
    world = jax.process_count()
    ordered: List = [None] * size
    for r in range(world):
        with open(os.path.join(tmpdir, f"part_{r}.pkl"), "rb") as f:
            part = pickle.load(f)
        for j, idx in enumerate(shard_indices(size, r, world)):
            if j < len(part):
                ordered[idx] = part[j]
    # delete BEFORE releasing the other ranks so a subsequent round's
    # fresh part files can never race with this round's cleanup
    for r in range(world):
        p = os.path.join(tmpdir, f"part_{r}.pkl")
        if os.path.exists(p):
            os.remove(p)
    _barrier("collect_results_read")
    return ordered
