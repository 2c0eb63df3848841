"""Deterministic multi-source batch composition.

Parity target: ``mmrotate/datasets/samplers/multi_source_sampler.py:185-385``
— an infinite sampler over a concatenation of datasets that draws exactly
``source_ratio[i]`` samples from dataset i per batch, via per-rank strided
infinite permutation streams.

TPU re-design: a pure-python deterministic index generator parameterized by
(seed, host_id, num_hosts). Unlike the reference's per-rank strided streams,
every host enumerates the SAME global permutation stream and keeps its
contiguous per-source slice of each global batch draw, so the assembled
global batch is byte-identical for any process count (single-process ==
multi-process; no ``sync_random_seed`` broadcast needed and exact loss
parity is testable, tests/test_multiprocess.py).
"""

from __future__ import annotations

from typing import Iterator, List, Sequence, Tuple

import numpy as np


class MultiSourceSampler:
    """Yields batches of (source_id, index-within-source) tuples."""

    def __init__(self, source_sizes: Sequence[int],
                 source_ratio: Sequence[int], seed: int = 0,
                 host_id: int = 0, num_hosts: int = 1,
                 shuffle: bool = True):
        assert len(source_sizes) == len(source_ratio)
        self.sizes = list(source_sizes)
        self.ratio = list(source_ratio)
        self.seed = seed
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.shuffle = shuffle

    def _stream(self, source: int) -> Iterator[int]:
        """Infinite GLOBAL index stream for one source (identical on every
        host; cf. the reference's rank-strided variant,
        ``multi_source_sampler.py:287``)."""
        n = self.sizes[source]
        rng = np.random.RandomState(self.seed * 1000003 + source)
        while True:
            perm = rng.permutation(n) if self.shuffle else np.arange(n)
            for i in range(n):
                yield int(perm[i])

    def __iter__(self) -> Iterator[List[Tuple[int, int]]]:
        """Per batch, each source draws ``ratio[s] * num_hosts`` global
        indices; this host keeps its contiguous slice
        ``[host_id*ratio[s] : (host_id+1)*ratio[s]]``. Concatenating all
        hosts' batches per source reproduces the num_hosts=1 stream."""
        streams = [self._stream(s) for s in range(len(self.sizes))]
        while True:
            batch = []
            for s, r in enumerate(self.ratio):
                draw = [next(streams[s]) for _ in range(r * self.num_hosts)]
                batch.extend(
                    (s, draw[self.host_id * r + j]) for j in range(r))
            yield batch


class GroupMultiSourceSampler(MultiSourceSampler):
    """Aspect-ratio-grouped variant (``multi_source_sampler.py:317``):
    each batch draws all samples of a source from one aspect-ratio group
    (0 = landscape, 1 = portrait) so padded batch shapes stay tight.

    ``group_of``: callable (source, index) -> group id. Since our pipeline
    pads to a fixed square the grouping only matters for IO efficiency;
    semantics match the reference (group chosen per source per batch,
    proportional to group sizes).
    """

    def __init__(self, source_sizes, source_ratio, group_of,
                 seed: int = 0, host_id: int = 0, num_hosts: int = 1):
        super().__init__(source_sizes, source_ratio, seed=seed,
                         host_id=host_id, num_hosts=num_hosts)
        # split every source's indices into the two groups
        self._group_indices = []
        for s, n in enumerate(self.sizes):
            groups = {0: [], 1: []}
            for i in range(n):
                groups[int(group_of(s, i)) & 1].append(i)
            self._group_indices.append(groups)

    def _stream_group(self, source: int, group: int) -> Iterator[int]:
        idxs = self._group_indices[source][group]
        rng = np.random.RandomState(
            self.seed * 1000003 + source * 31 + group)
        while True:
            perm = rng.permutation(len(idxs)) if self.shuffle \
                else np.arange(len(idxs))
            for i in range(len(idxs)):
                yield idxs[perm[i]]

    def __iter__(self):
        # group choice is part of the global stream (same on every host)
        rng = np.random.RandomState(self.seed * 7)
        streams = {(s, g): self._stream_group(s, g)
                   for s in range(len(self.sizes)) for g in (0, 1)
                   if self._group_indices[s][g]}
        while True:
            batch = []
            for s, r in enumerate(self.ratio):
                sizes = [len(self._group_indices[s][g]) for g in (0, 1)]
                tot = max(sum(sizes), 1)
                g = int(rng.rand() >= sizes[0] / tot)
                if (s, g) not in streams:
                    g = 1 - g
                draw = [next(streams[(s, g)])
                        for _ in range(r * self.num_hosts)]
                batch.extend(
                    (s, draw[self.host_id * r + j]) for j in range(r))
            yield batch
