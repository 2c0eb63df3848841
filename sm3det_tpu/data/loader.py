"""TriSource batch loader: pipeline + multi-source sampling -> static
device batches (replaces DataLoader workers + DataContainer collate +
MultiBranch re-keying, ``mmrotate/datasets/pipelines/transforms.py:64-121``).

Each global step yields one dict:
  {'sar': {img (Ns,S,S,3), gt_bboxes, gt_labels, gt_mask},
   'rgb': {img (Nr,S,S,3), gt_obbs,  gt_labels, gt_mask},
   'ifr': {...}}
ready for ``jax.device_put`` with a 'data'-sharded layout.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from . import transforms as T
from .datasets import BaseDetDataset
from .sampler import MultiSourceSampler

MODALITIES = ("sar", "rgb", "ifr")


class PipelineCfg:
    """Per-modality train pipeline flags.

    Mirrors the reference pipeline dicts
    (``configs/_base_/datasets/SOI_Det.py:20-80``): the SAR branch uses
    ``flip_prob=0.5`` horizontal only; RGB/IFR use 3-direction flip
    ``[0.25, 0.25, 0.25]`` + ``PolyRandomRotate(rotate_ratio=0.5,
    angles_range=180, rect_classes=[0,1,2,3,4,5,16,18])``.
    ``crop_size``/``mosaic_prob`` expose RRandomCrop/RMosaic
    (``mmrotate/datasets/pipelines/transforms.py:413,521``).
    """

    def __init__(self, img_size: int = 800, max_gt: int = 256,
                 flip_prob=0.5, rotate_ratio: float = 0.0,
                 version: str = "le90",
                 mean=(123.675, 116.28, 103.53),
                 std=(58.395, 57.12, 57.375),
                 flip_directions: Sequence[str] = ("horizontal",),
                 angles_range: int = 180,
                 rotate_mode: str = "range",
                 discrete_angles: Sequence[float] = (),
                 rect_classes: Sequence[int] = (),
                 crop_size: Optional[Sequence[int]] = None):
        self.img_size = img_size
        self.max_gt = max_gt
        self.flip_prob = flip_prob
        self.rotate_ratio = rotate_ratio
        self.version = version
        self.mean = mean
        self.std = std
        self.flip_directions = tuple(flip_directions)
        self.angles_range = angles_range
        self.rotate_mode = rotate_mode
        self.discrete_angles = tuple(discrete_angles)
        self.rect_classes = tuple(rect_classes)
        self.crop_size = tuple(crop_size) if crop_size else None

    @classmethod
    def from_config(cls, dcfg, img_size: int, version: str,
                    max_gt: int = 256):
        """Build from a ``data.<modality>`` config dict carrying an
        optional ``pipeline`` sub-dict (the config-schema analogue of the
        reference's per-branch pipeline lists)."""
        p = dcfg.get("pipeline", {})
        if hasattr(p, "to_dict"):
            p = p.to_dict()
        return cls(img_size=img_size, max_gt=max_gt, version=version,
                   flip_prob=p.get("flip_ratio", 0.5),
                   flip_directions=p.get("flip_directions",
                                         ("horizontal",)),
                   rotate_ratio=p.get("rotate_ratio", 0.0),
                   angles_range=p.get("angles_range", 180),
                   rotate_mode=p.get("rotate_mode", "range"),
                   discrete_angles=p.get("discrete_angles", ()),
                   rect_classes=p.get("rect_classes", ()),
                   crop_size=p.get("crop_size"))


def run_pipeline(rng: np.random.RandomState, sample: Dict,
                 cfg: PipelineCfg, train: bool = True) -> Dict:
    """LoadImage -> RResize -> RRandomFlip -> (PolyRandomRotate) ->
    (RRandomCrop) -> Normalize -> Pad -> fixed-size GT pack."""
    img = sample["img"]
    obbs = sample.get("obbs")
    hbbs = sample.get("hbbs")
    labels = sample["labels"]

    img, obbs, hbbs, _ = T.resize(
        img, (cfg.img_size, cfg.img_size), obbs, hbbs, keep_ratio=True)
    if train:
        img, obbs, hbbs, _ = T.random_flip(
            rng, img, obbs, hbbs, prob=cfg.flip_prob, version=cfg.version,
            direction=cfg.flip_directions)
        if cfg.rotate_ratio > 0 and obbs is not None:
            img, obbs, labels = T.poly_random_rotate(
                rng, img, obbs, labels, rotate_ratio=cfg.rotate_ratio,
                angles_range=cfg.angles_range, mode=cfg.rotate_mode,
                discrete_angles=cfg.discrete_angles,
                rect_classes=cfg.rect_classes, version=cfg.version)
        if cfg.crop_size is not None and obbs is not None:
            cimg, cobbs, clabels = T.random_crop(
                rng, img, obbs, labels, cfg.crop_size,
                allow_negative=False)
            if cimg is not None:    # else: keep the uncropped sample
                img, obbs, labels = cimg, cobbs, clabels
    img = T.normalize(img, cfg.mean, cfg.std)
    img = T.pad_to(img, (cfg.img_size, cfg.img_size))

    out = {"img": img.astype(np.float32)}
    if obbs is not None:
        b, l, m = T.pad_gt(obbs, labels, cfg.max_gt, 5)
        out.update(gt_obbs=b, gt_labels=l, gt_mask=m)
    else:
        b, l, m = T.pad_gt(hbbs, labels, cfg.max_gt, 4)
        out.update(gt_bboxes=b, gt_labels=l, gt_mask=m)
    return out


class TriSourceLoader:
    """Infinite iterator over composed [sar*k, rgb*m, ifr*n] batches.

    Async by default: a producer thread assembles batches with a
    thread-pool running the per-sample pipeline (the reference's
    multi-worker DataLoader, ``mmrotate/datasets/builder.py:120-190``)
    and keeps ``prefetch`` ready batches in a queue, so host-side IO +
    augmentation overlaps the device step. ``num_workers=0`` restores
    the synchronous path. Per-sample RNG is derived from
    (seed, step, slot), so augmentations are deterministic and
    independent of worker scheduling.
    """

    def __init__(self, datasets: Sequence[BaseDetDataset],
                 source_ratio: Sequence[int],
                 pipelines: Sequence[PipelineCfg],
                 batches_per_step: int = 1,   # = data-parallel replicas
                 seed: int = 0, host_id: int = 0, num_hosts: int = 1,
                 num_workers: int = 4, prefetch: int = 2):
        assert len(datasets) == 3 and len(source_ratio) == 3
        self.datasets = list(datasets)
        self.ratio = list(source_ratio)
        self.pipelines = list(pipelines)
        self.batches_per_step = batches_per_step
        self.sampler = MultiSourceSampler(
            [len(d) for d in datasets],
            [r * batches_per_step for r in source_ratio],
            seed=seed, host_id=host_id, num_hosts=num_hosts)
        # per-sample RNG is keyed by the GLOBAL batch slot (not the local
        # one) so host shards assemble into exactly the single-process
        # global batch — augmentations included (tests/test_multiprocess.py)
        self.seed = seed * 7919
        local_counts = [r * batches_per_step for r in source_ratio]
        self._gslot = []
        goff = 0
        for s, r_local in enumerate(local_counts):
            base = goff + host_id * r_local
            self._gslot.extend(base + p for p in range(r_local))
            goff += r_local * num_hosts
        self.num_workers = num_workers
        self.prefetch = max(prefetch, 1)

    def _load_one(self, src: int, idx: int, step: int, slot: int) -> Dict:
        rng = np.random.RandomState(
            (self.seed + step * 1000003 + slot * 7907) % (2 ** 31 - 1))
        raw = self.datasets[src].get_raw(idx)
        return run_pipeline(rng, raw, self.pipelines[src])

    def _assemble(self, samples_by_src: List[List[Dict]]) -> Dict:
        out = {}
        for mi, mod in enumerate(MODALITIES):
            samples = samples_by_src[mi]
            out[mod] = {k: np.stack([s[k] for s in samples])
                        for k in samples[0]}
        return out

    def _iter_sync(self) -> Iterator[Dict]:
        for step, batch_indices in enumerate(self.sampler):
            per_source: List[List[Dict]] = [[], [], []]
            for slot, (src, idx) in enumerate(batch_indices):
                per_source[src].append(
                    self._load_one(src, idx, step, self._gslot[slot]))
            yield self._assemble(per_source)

    def __iter__(self) -> Iterator[Dict]:
        if self.num_workers <= 0:
            yield from self._iter_sync()
            return

        import queue
        import threading
        from concurrent.futures import ThreadPoolExecutor

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for step, batch_indices in enumerate(self.sampler):
                    if stop.is_set():
                        return
                    futs = [(src, pool.submit(
                        self._load_one, src, idx, step, self._gslot[slot]))
                        for slot, (src, idx) in enumerate(batch_indices)]
                    per_source: List[List[Dict]] = [[], [], []]
                    for src, f in futs:
                        per_source[src].append(f.result())
                    batch = self._assemble(per_source)
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.5)
                            break
                        except queue.Full:
                            continue

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()
