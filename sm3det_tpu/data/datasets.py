"""Dataset loaders (host-side, numpy).

Capability parity with ``mmrotate/datasets/``:

- ``DOTADataset``: DOTA-style TXT polygon annotation folders
  (``dota.py:61-162``) with pickle caching; ``CLASSES`` per benchmark.
- ``CocoDetDataset``: COCO-json HBB datasets (SARDet-50K path,
  ``sardet_hbb_trisource.py:6``).
- ``SyntheticDetDataset``: in-memory fixture generator (the fake-dataset
  harness of SURVEY.md §4) so train/eval run without external data.

Every dataset yields samples with STATIC-shape tensors after the pipeline:
``img (S,S,3) float32``, padded gts + mask (see data/transforms.py).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..ops.box_convert import poly2obb_np
from . import transforms as T

# 26-class union of SARDet-50K + DOTA + DroneVehicle
# (``sardet_dota_ifred.py:8`` / ``sardet_hbb_trisource.py:6``)
SOI_CLASSES = (
    "ship", "aircraft", "car", "tank", "bridge", "harbor",
    "plane", "baseball-diamond", "ground-track-field",
    "small-vehicle", "large-vehicle", "tennis-court",
    "basketball-court", "storage-tank", "soccer-ball-field",
    "roundabout", "swimming-pool", "helicopter",
    "container-crane", "freight-car", "truck", "bus", "van",
    "trailer", "excavator", "helipad")

DOTA_CLASSES = (
    "plane", "baseball-diamond", "bridge", "ground-track-field",
    "small-vehicle", "large-vehicle", "ship", "tennis-court",
    "basketball-court", "storage-tank", "soccer-ball-field",
    "roundabout", "harbor", "swimming-pool", "helicopter")


class BaseDetDataset:
    """Sample dict: {img uint8 HWC, obbs (N,5) or hbbs (N,4), labels}."""

    CLASSES: Sequence[str] = ()
    box_type = "obb"   # 'obb' | 'hbb'

    def __len__(self):
        raise NotImplementedError

    def get_raw(self, idx: int) -> Dict:
        raise NotImplementedError


class DOTADataset(BaseDetDataset):
    """DOTA TXT-poly annotation folder loader (``dota.py:61-162``).

    ann_folder contains ``<img_id>.txt`` files with lines
    ``x1 y1 x2 y2 x3 y3 x4 y4 class difficulty``.
    """

    box_type = "obb"

    def __init__(self, ann_folder: str, img_folder: str,
                 classes: Sequence[str] = DOTA_CLASSES,
                 version: str = "le90", filter_difficulty: int = 100,
                 cache: bool = True):
        self.CLASSES = tuple(classes)
        self.cls_to_id = {c: i for i, c in enumerate(self.CLASSES)}
        self.ann_folder = ann_folder
        self.img_folder = img_folder
        self.version = version
        self.filter_difficulty = filter_difficulty
        # annotation pickle cache through fileio (dota.py:66,156); v2
        # carries the ignore arrays — stale v1 caches are rebuilt
        from ..utils import fileio
        cache_path = os.path.join(ann_folder, ".sm3det_cache_v2.pkl")
        if cache and os.path.exists(cache_path):
            self.infos = fileio.load(cache_path)
        else:
            self.infos = self._load_annotations()
            if cache:
                try:
                    fileio.dump(self.infos, cache_path)
                except OSError:
                    pass

    def _load_annotations(self) -> List[Dict]:
        infos = []
        for fname in sorted(os.listdir(self.ann_folder)):
            if not fname.endswith(".txt"):
                continue
            img_id = fname[:-4]
            polys, labels = [], []
            polys_ign, labels_ign = [], []
            with open(os.path.join(self.ann_folder, fname)) as f:
                for line in f:
                    parts = line.split()
                    if len(parts) < 9:
                        continue
                    try:
                        poly = [float(x) for x in parts[:8]]
                    except ValueError:
                        continue
                    cls = parts[8]
                    diff = int(parts[9]) if len(parts) > 9 else 0
                    if cls not in self.cls_to_id:
                        continue
                    if diff > self.filter_difficulty:
                        # difficult gts are KEPT as ignore boxes, not
                        # dropped: the reference routes them to
                        # gt_bboxes_ignore so eval scores detections on
                        # them as neither tp nor fp (dota.py:97-139)
                        polys_ign.append(poly)
                        labels_ign.append(self.cls_to_id[cls])
                    else:
                        polys.append(poly)
                        labels.append(self.cls_to_id[cls])

            def to_obb(p):
                return poly2obb_np(np.asarray(p, np.float32),
                                   self.version) \
                    if p else np.zeros((0, 5), np.float32)

            infos.append(dict(
                img_id=img_id, obbs=to_obb(polys),
                labels=np.asarray(labels, np.int32),
                obbs_ignore=to_obb(polys_ign),
                labels_ignore=np.asarray(labels_ign, np.int32)))
        return infos

    def __len__(self):
        return len(self.infos)

    def get_raw(self, idx: int) -> Dict:
        info = self.infos[idx]
        img = self._read_image(info["img_id"])
        out = dict(img=img, obbs=info["obbs"].copy(),
                   labels=info["labels"].copy(), img_id=info["img_id"])
        if len(info.get("obbs_ignore", ())):
            out["obbs_ignore"] = info["obbs_ignore"].copy()
            out["labels_ignore"] = info["labels_ignore"].copy()
        return out

    def _read_image(self, img_id: str) -> np.ndarray:
        for ext in (".png", ".jpg", ".bmp", ".tif"):
            p = os.path.join(self.img_folder, img_id + ext)
            if os.path.exists(p):
                return _imread(p)
        raise FileNotFoundError(img_id)


class CocoDetDataset(BaseDetDataset):
    """COCO-json HBB dataset (SARDet-50K)."""

    box_type = "hbb"

    def __init__(self, ann_file: str, img_folder: str,
                 classes: Optional[Sequence[str]] = None):
        from ..utils import fileio
        coco = fileio.load(ann_file, file_format="json")
        cats = sorted(coco["categories"], key=lambda c: c["id"])
        self.CLASSES = tuple(classes) if classes else tuple(
            c["name"] for c in cats)
        cat_to_label = {}
        for c in cats:
            if c["name"] in self.CLASSES:
                cat_to_label[c["id"]] = self.CLASSES.index(c["name"])
        imgs = {im["id"]: im for im in coco["images"]}
        anns_by_img: Dict[int, List] = {}
        for a in coco["annotations"]:
            anns_by_img.setdefault(a["image_id"], []).append(a)
        self.infos = []
        for img_id, im in imgs.items():
            anns = anns_by_img.get(img_id, [])
            boxes, labels, areas = [], [], []
            cboxes, clabels, careas = [], [], []
            for a in anns:
                if a["category_id"] not in cat_to_label:
                    continue
                x, y, w, h = a["bbox"]
                # COCO eval uses the annotation's 'area' field (w*h
                # for box-only jsons) for the area-range breakdown
                area = float(a.get("area", w * h))
                if a.get("iscrowd", 0):
                    # crowd regions: excluded from training targets,
                    # kept as ignore regions for COCO-protocol eval
                    # (mmdet routes them to gt_bboxes_ignore)
                    cboxes.append([x, y, x + w, y + h])
                    clabels.append(cat_to_label[a["category_id"]])
                    careas.append(area)
                else:
                    boxes.append([x, y, x + w, y + h])
                    labels.append(cat_to_label[a["category_id"]])
                    areas.append(area)
            self.infos.append(dict(
                file_name=im["file_name"], img_id=img_id,
                hbbs=np.asarray(boxes, np.float32).reshape(-1, 4),
                labels=np.asarray(labels, np.int32),
                areas=np.asarray(areas, np.float64),
                hbbs_crowd=np.asarray(cboxes, np.float32).reshape(-1, 4),
                labels_crowd=np.asarray(clabels, np.int32),
                areas_crowd=np.asarray(careas, np.float64)))
        self.img_folder = img_folder

    def __len__(self):
        return len(self.infos)

    def get_raw(self, idx: int) -> Dict:
        info = self.infos[idx]
        img = _imread(os.path.join(self.img_folder, info["file_name"]))
        return dict(img=img, hbbs=info["hbbs"].copy(),
                    labels=info["labels"].copy(), img_id=info["img_id"],
                    areas=info["areas"].copy(),
                    hbbs_crowd=info["hbbs_crowd"].copy(),
                    labels_crowd=info["labels_crowd"].copy(),
                    areas_crowd=info["areas_crowd"].copy())


HRSC_CLASSES = ("ship",)

# class lists for the remaining dataset families (mmrotate/datasets/)
DOTA15_CLASSES = DOTA_CLASSES + ("container-crane",)
FAIR_CLASSES = (
    "Boeing737", "Boeing747", "Boeing777", "Boeing787", "C919", "A220",
    "A321", "A330", "A350", "ARJ21", "Passenger-Ship", "Motorboat",
    "Fishing-Boat", "Tugboat", "Engineering-Ship", "Liquid-Cargo-Ship",
    "Dry-Cargo-Ship", "Warship", "Small-Car", "Bus", "Cargo-Truck",
    "Dump-Truck", "Van", "Trailer", "Tractor", "Excavator",
    "Truck-Tractor", "Basketball-Court", "Tennis-Court",
    "Football-Field", "Baseball-Field", "Intersection", "Roundabout",
    "Bridge")
SSDD_CLASSES = ("ship",)
DRONEVEHICLE_CLASSES = ("car", "truck", "bus", "van", "freight-car")
SARDET_CLASSES = (
    "ship", "aircraft", "car", "tank", "bridge", "harbor")


def DOTA15Dataset(ann_folder, img_folder, **kw):
    """DOTA-v1.5 (``dota_1_5.py``): DOTA loader with the 16-class list."""
    kw.setdefault("classes", DOTA15_CLASSES)
    return DOTADataset(ann_folder, img_folder, **kw)


def FairDataset(ann_folder, img_folder, **kw):
    """FAIR1M (``fair.py``): DOTA-format annotations, FAIR classes."""
    kw.setdefault("classes", FAIR_CLASSES)
    return DOTADataset(ann_folder, img_folder, **kw)


def SSDDDataset(ann_folder, img_folder, **kw):
    """SSDD SAR ship detection (``sar.py``), DOTA-format annotations."""
    kw.setdefault("classes", SSDD_CLASSES)
    return DOTADataset(ann_folder, img_folder, **kw)


def DroneVehicleDataset(ann_folder, img_folder, **kw):
    """DroneVehicle infrared (``dronevehicle.py``), DOTA-format."""
    kw.setdefault("classes", DRONEVEHICLE_CLASSES)
    return DOTADataset(ann_folder, img_folder, **kw)


class HRSCDataset(BaseDetDataset):
    """HRSC2016 XML annotations (``mmrotate/datasets/hrsc.py`` contract):
    per-image XML with rotated boxes (cx, cy, w, h, ang)."""

    box_type = "obb"

    def __init__(self, ann_folder: str, img_folder: str,
                 classes: Sequence[str] = HRSC_CLASSES,
                 version: str = "le90"):
        import xml.etree.ElementTree as ET
        self.CLASSES = tuple(classes)
        self.img_folder = img_folder
        self.version = version
        self.infos = []
        for fname in sorted(os.listdir(ann_folder)):
            if not fname.endswith(".xml"):
                continue
            tree = ET.parse(os.path.join(ann_folder, fname))
            root = tree.getroot()
            boxes, labels = [], []
            for obj in root.iter("HRSC_Object"):
                def g(tag):
                    el = obj.find(tag)
                    return float(el.text) if el is not None else 0.0
                cx, cy = g("mbox_cx"), g("mbox_cy")
                w, h = g("mbox_w"), g("mbox_h")
                ang = g("mbox_ang")
                boxes.append([cx, cy, w, h, ang])
                labels.append(0)
            obbs = np.asarray(boxes, np.float32).reshape(-1, 5)
            if len(obbs):
                # canonicalize angle into the target version
                from ..ops.box_convert import obb2poly_np
                obbs = poly2obb_np(obb2poly_np(obbs, "le90"),
                                   self.version)
            self.infos.append(dict(
                img_id=fname[:-4], obbs=obbs,
                labels=np.asarray(labels, np.int32)))

    def __len__(self):
        return len(self.infos)

    def get_raw(self, idx: int) -> Dict:
        info = self.infos[idx]
        for ext in (".bmp", ".png", ".jpg"):
            p = os.path.join(self.img_folder, info["img_id"] + ext)
            if os.path.exists(p):
                img = _imread(p)
                break
        else:
            raise FileNotFoundError(info["img_id"])
        return dict(img=img, obbs=info["obbs"].copy(),
                    labels=info["labels"].copy(), img_id=info["img_id"])


class SyntheticDetDataset(BaseDetDataset):
    """In-memory random dataset for tests/benchmarks (fake-data harness)."""

    def __init__(self, n: int = 32, img_size: int = 256,
                 num_classes: int = 26, box_type: str = "obb",
                 max_objects: int = 12, seed: int = 0):
        self.n = n
        self.img_size = img_size
        self.num_classes = num_classes
        self.box_type = box_type
        self.max_objects = max_objects
        self.seed = seed
        self.CLASSES = tuple(f"class_{i}" for i in range(num_classes))

    def __len__(self):
        return self.n

    def get_raw(self, idx: int) -> Dict:
        rng = np.random.RandomState(self.seed * 100003 + idx)
        s = self.img_size
        img = (rng.rand(s, s, 3) * 255).astype(np.uint8)
        k = rng.randint(1, self.max_objects + 1)
        labels = rng.randint(0, self.num_classes, k).astype(np.int32)
        if self.box_type == "obb":
            obbs = np.stack([
                rng.uniform(0.15 * s, 0.85 * s, k),
                rng.uniform(0.15 * s, 0.85 * s, k),
                rng.uniform(0.05 * s, 0.2 * s, k),
                rng.uniform(0.03 * s, 0.1 * s, k),
                rng.uniform(-np.pi / 2, np.pi / 2, k)],
                -1).astype(np.float32)
            return dict(img=img, obbs=obbs, labels=labels, img_id=str(idx))
        cx = rng.uniform(0.15 * s, 0.85 * s, k)
        cy = rng.uniform(0.15 * s, 0.85 * s, k)
        w = rng.uniform(0.05 * s, 0.2 * s, k)
        h = rng.uniform(0.05 * s, 0.2 * s, k)
        hbbs = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                        -1).astype(np.float32)
        return dict(img=img, hbbs=hbbs, labels=labels, img_id=str(idx))


def _imread(path: str) -> np.ndarray:
    """BGR image read through the host image library
    (``utils/image.py::imread``, FileClient-routed like the reference's
    ``mmcv.imread``)."""
    from ..utils.image import imread
    return imread(path)


# ---------------------------------------------------------------------------
# dataset wrappers (``mmrotate/datasets/builder.py:36`` -> mmdet
# ``datasets/dataset_wrappers.py``: ConcatDataset / RepeatDataset /
# ClassBalancedDataset). Same protocol as BaseDetDataset so they compose
# with the samplers/loaders transparently.
# ---------------------------------------------------------------------------


class ConcatDataset(BaseDetDataset):
    """Concatenation of datasets with identical CLASSES
    (mmdet ``ConcatDataset``): indices map to (dataset, local index) by
    cumulative length."""

    def __init__(self, datasets):
        assert datasets, "empty ConcatDataset"
        self.datasets = list(datasets)
        self.CLASSES = self.datasets[0].CLASSES
        self.box_type = self.datasets[0].box_type
        self._cum = np.cumsum([len(d) for d in self.datasets])

    def __len__(self):
        return int(self._cum[-1])

    def get_raw(self, idx: int) -> Dict:
        di = int(np.searchsorted(self._cum, idx, side="right"))
        local = idx - (0 if di == 0 else int(self._cum[di - 1]))
        return self.datasets[di].get_raw(local)


class RepeatDataset(BaseDetDataset):
    """Repeat a dataset ``times`` times (mmdet ``RepeatDataset``) — an
    epoch-lengthening trick for small datasets."""

    def __init__(self, dataset, times: int):
        self.dataset = dataset
        self.times = int(times)
        self.CLASSES = dataset.CLASSES
        self.box_type = dataset.box_type

    def __len__(self):
        return len(self.dataset) * self.times

    def get_raw(self, idx: int) -> Dict:
        return self.dataset.get_raw(idx % len(self.dataset))


class ClassBalancedDataset(BaseDetDataset):
    """Category-frequency rebalancing (mmdet ``ClassBalancedDataset``,
    LVIS recipe): image i is repeated ``ceil(max_c 1[c in i] *
    r(c))`` times where ``r(c) = max(1, sqrt(oversample_thr / f(c)))``
    and ``f(c)`` is the fraction of images containing class c."""

    def __init__(self, dataset, oversample_thr: float = 1e-3):
        self.dataset = dataset
        self.CLASSES = dataset.CLASSES
        self.box_type = dataset.box_type
        n = len(dataset)
        cat_in_img = []
        counts = {}
        for i in range(n):
            raw = dataset.get_raw(i)
            cats = set(int(c) for c in np.asarray(raw["labels"]).ravel())
            cat_in_img.append(cats)
            for c in cats:
                counts[c] = counts.get(c, 0) + 1
        freqs = {c: v / max(n, 1) for c, v in counts.items()}
        ratios = {c: max(1.0, np.sqrt(oversample_thr / max(f, 1e-12)))
                  for c, f in freqs.items()}
        self._indices = []
        for i, cats in enumerate(cat_in_img):
            r = max([ratios[c] for c in cats], default=1.0)
            self._indices.extend([i] * int(np.ceil(r)))

    def __len__(self):
        return len(self._indices)

    def get_raw(self, idx: int) -> Dict:
        return self.dataset.get_raw(self._indices[idx])


class StructuredSyntheticDetDataset(BaseDetDataset):
    """Learnable synthetic data: class-coded rotated rectangles PAINTED
    into the image (vs. ``SyntheticDetDataset``'s pure noise, which only
    supports memorization tests). Each class has a distinct fill
    intensity pattern so a detector can generalize to held-out draws —
    used by the convergence-evidence run (configs/convergence_synth.py)
    standing in for the reference's real-dataset training loop
    (``tools/train.py`` of SM3Det)."""

    def __init__(self, n: int = 256, img_size: int = 256,
                 num_classes: int = 4, box_type: str = "obb",
                 max_objects: int = 6, seed: int = 0):
        self.n = n
        self.img_size = img_size
        self.num_classes = num_classes
        self.box_type = box_type
        self.max_objects = max_objects
        self.seed = seed
        self.CLASSES = tuple(f"class_{i}" for i in range(num_classes))

    def __len__(self):
        return self.n

    def _paint(self, img, cx, cy, w, h, theta, cls):
        s = self.img_size
        # bounding patch of the rotated rect
        ext = int(np.ceil(np.hypot(w, h) / 2)) + 1
        x0 = max(int(cx) - ext, 0)
        y0 = max(int(cy) - ext, 0)
        x1 = min(int(cx) + ext + 1, s)
        y1 = min(int(cy) + ext + 1, s)
        ys, xs = np.mgrid[y0:y1, x0:x1]
        dx = xs - cx
        dy = ys - cy
        ct, st = np.cos(theta), np.sin(theta)
        fx = ct * dx + st * dy
        fy = -st * dx + ct * dy
        inside = (np.abs(fx) <= w / 2) & (np.abs(fy) <= h / 2)
        # class-coded appearance: distinct base color + stripe frequency
        base = 60 + 150 * (cls + 1) / self.num_classes
        stripes = 0.5 + 0.5 * np.sin(fx * (0.3 + 0.25 * cls))
        for ch in range(3):
            chan = img[y0:y1, x0:x1, ch]
            val = base * (0.6 + 0.4 * stripes) * (0.5 + 0.5 * (ch == cls % 3))
            chan[inside] = np.clip(val[inside], 0, 255)

    def get_raw(self, idx: int) -> Dict:
        rng = np.random.RandomState(self.seed * 1000003 + idx)
        s = self.img_size
        img = (rng.rand(s, s, 3) * 40 + 20).astype(np.float32)
        k = rng.randint(1, self.max_objects + 1)
        labels = rng.randint(0, self.num_classes, k).astype(np.int32)
        boxes = []
        for j in range(k):
            cx = rng.uniform(0.18 * s, 0.82 * s)
            cy = rng.uniform(0.18 * s, 0.82 * s)
            w = rng.uniform(0.14 * s, 0.3 * s)
            h = rng.uniform(0.07 * s, 0.15 * s)
            theta = (rng.uniform(-np.pi / 2, np.pi / 2)
                     if self.box_type == "obb" else 0.0)
            self._paint(img, cx, cy, w, h, theta, int(labels[j]))
            boxes.append([cx, cy, w, h, theta])
        img = img.astype(np.uint8)
        boxes = np.asarray(boxes, np.float32)
        if self.box_type == "obb":
            return dict(img=img, obbs=boxes, labels=labels,
                        img_id=str(idx))
        cx, cy, w, h = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
        hbbs = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                        -1).astype(np.float32)
        return dict(img=img, hbbs=hbbs, labels=labels, img_id=str(idx))


# ---------------------------------------------------------------------------
# Config-driven builder (reference ``mmrotate/datasets/builder.py:36``):
# wrapper types recurse, leaf types construct directly.
# ---------------------------------------------------------------------------

_LEAF_TYPES = {}


def _register_leaves():
    for name, cls in (("DOTADataset", DOTADataset),
                      ("DOTA15Dataset", DOTA15Dataset),
                      ("FairDataset", FairDataset),
                      ("SSDDDataset", SSDDDataset),
                      ("DroneVehicleDataset", DroneVehicleDataset),
                      ("HRSCDataset", HRSCDataset),
                      ("CocoDetDataset", CocoDetDataset),
                      ("SyntheticDetDataset", SyntheticDetDataset),
                      ("StructuredSyntheticDetDataset",
                       StructuredSyntheticDetDataset)):
        _LEAF_TYPES[name] = cls


_register_leaves()

# keys in a data config that parameterize the *pipeline*, not the dataset
_PIPELINE_KEYS = ("pipeline", "max_gt")


def build_dataset(dcfg, version: str = "le90", synthetic_fallback=None):
    """Build a dataset tree from a config dict
    (``mmrotate/datasets/builder.py:36-60`` semantics).

    Wrapper types: ``ConcatDataset`` (key ``datasets``), ``RepeatDataset``
    (keys ``dataset``, ``times``), ``ClassBalancedDataset`` (keys
    ``dataset``, ``oversample_thr``) — each recurses on its children.
    Leaf types construct directly; ``pipeline``/``max_gt`` keys are
    stripped (they configure the loader pipeline, not the dataset).

    ``synthetic_fallback``: optional kwargs dict for
    ``SyntheticDetDataset``; when given and a leaf's filesystem paths are
    absent, the leaf falls back to synthetic fixtures (the tools'
    no-real-data mode).
    """
    import os

    if hasattr(dcfg, "to_dict"):
        dcfg = dcfg.to_dict()
    dcfg = dict(dcfg)
    for k in _PIPELINE_KEYS:
        dcfg.pop(k, None)
    dtype = dcfg.pop("type")
    if dtype == "ConcatDataset":
        return ConcatDataset([
            build_dataset(c, version, synthetic_fallback)
            for c in dcfg["datasets"]])
    if dtype == "RepeatDataset":
        return RepeatDataset(
            build_dataset(dcfg["dataset"], version, synthetic_fallback),
            times=dcfg.get("times", 1))
    if dtype == "ClassBalancedDataset":
        return ClassBalancedDataset(
            build_dataset(dcfg["dataset"], version, synthetic_fallback),
            oversample_thr=dcfg.get("oversample_thr", 1e-3))
    cls = _LEAF_TYPES.get(dtype)
    if cls is None:
        raise KeyError(f"unknown dataset type {dtype!r}")
    if cls in (SyntheticDetDataset, StructuredSyntheticDetDataset):
        return cls(**dcfg)
    paths_ok = all(os.path.exists(v) for k, v in dcfg.items()
                   if isinstance(v, str) and "/" in v)
    if not paths_ok:
        if synthetic_fallback is not None:
            return SyntheticDetDataset(**synthetic_fallback)
        raise FileNotFoundError(
            f"{dtype}: missing data paths in {dcfg}")
    if cls is CocoDetDataset:
        return cls(**dcfg)
    return cls(**dcfg, version=version)
