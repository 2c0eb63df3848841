"""Huge-image patch inference: multi-scale sliding-window split + rotated
NMS merge.

Parity targets: ``mmrotate/core/patch/split.py`` (``get_multiscale_patch``,
``slide_window``), ``merge_results.py``, and the DOTA patch-merge /
submission writer (``mmrotate/datasets/dota.py:243-389``).
"""

from __future__ import annotations

import os
import re
import zipfile
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax

from ...ops.nms import nms_rotated
from ...ops.box_convert import obb2poly_np


def get_multiscale_patch(sizes: Sequence[int], steps: Sequence[int],
                         ratios: Sequence[float]):
    """Expand (sizes, steps) by test scales (``split.py`` behavior)."""
    assert len(sizes) == len(steps)
    out_sizes, out_steps, out_ratios = [], [], []
    for r in ratios:
        for s, st in zip(sizes, steps):
            out_sizes.append(int(s / r))
            out_steps.append(int(st / r))
            out_ratios.append(r)
    return out_sizes, out_steps, out_ratios


def slide_window(width: int, height: int, sizes: Sequence[int],
                 steps: Sequence[int],
                 img_ratios: Optional[Sequence[float]] = None):
    """Sliding windows (x, y, w, h[, ratio]) covering the image."""
    windows = []
    ratios = img_ratios or [1.0] * len(sizes)
    for size, step, ratio in zip(sizes, steps, ratios):
        assert size >= step, (size, step)
        x_num = 1 if width <= size else int(np.ceil(
            (width - size) / step + 1))
        y_num = 1 if height <= size else int(np.ceil(
            (height - size) / step + 1))
        for i in range(x_num):
            for j in range(y_num):
                x = min(i * step, max(width - size, 0))
                y = min(j * step, max(height - size, 0))
                windows.append((x, y, size, size, ratio))
    return windows


def merge_patch_results(patch_dets: List[np.ndarray],
                        patch_labels: List[np.ndarray],
                        offsets: List[Tuple[float, float, float]],
                        num_classes: int, iou_thr: float = 0.1,
                        max_per_img: int = 2000):
    """Translate per-patch OBB dets into image coords + per-class rotated
    NMS (``merge_results.py`` / ``dota.py:365`` semantics).

    Args:
        patch_dets: per patch (N, 6) [cx, cy, w, h, theta, score].
        offsets: per patch (x0, y0, scale) — boxes map as
            (b / scale) translated by (x0, y0).

    Returns:
        per-class list of (M, 6) arrays.
    """
    all_dets, all_labels = [], []
    for dets, labels, (x0, y0, sc) in zip(patch_dets, patch_labels,
                                          offsets):
        if len(dets) == 0:
            continue
        d = dets.copy()
        d[:, :4] /= sc
        d[:, 0] += x0
        d[:, 1] += y0
        all_dets.append(d)
        all_labels.append(labels)
    if not all_dets:
        return [np.zeros((0, 6), np.float32) for _ in range(num_classes)]
    dets = np.concatenate(all_dets)
    labels = np.concatenate(all_labels)

    out = []
    nms_j = jax.jit(lambda b, s, m: nms_rotated(b, s, iou_thr, m),
                    static_argnums=2)
    for c in range(num_classes):
        sel = labels == c
        d = dets[sel]
        if len(d) == 0:
            out.append(np.zeros((0, 6), np.float32))
            continue
        kept, idx, valid = nms_j(
            d[:, :5].astype(np.float32), d[:, 5].astype(np.float32),
            min(max_per_img, len(d)))
        out.append(np.asarray(kept)[np.asarray(valid)])
    return out


PATCH_NAME_RE = re.compile(r"^(.*?)__(\d+(?:\.\d+)?)__(\d+)___(\d+)$")


def parse_patch_id(patch_id: str):
    """'P0001__1.0__0___600' -> (base, scale, x0, y0) (``dota.py:256``)."""
    m = PATCH_NAME_RE.match(patch_id)
    if not m:
        return patch_id, 1.0, 0.0, 0.0
    return (m.group(1), float(m.group(2)), float(m.group(3)),
            float(m.group(4)))


def merge_det_by_patch_ids(patch_ids: List[str],
                           patch_results: List[List[np.ndarray]],
                           num_classes: int, iou_thr: float = 0.1):
    """Group patch results by base image and merge (``dota.py:243-283``)."""
    groups: Dict[str, List[int]] = {}
    metas = [parse_patch_id(p) for p in patch_ids]
    for i, (base, _, _, _) in enumerate(metas):
        groups.setdefault(base, []).append(i)

    merged: Dict[str, List[np.ndarray]] = {}
    for base, idxs in groups.items():
        per_class_out = []
        for c in range(num_classes):
            # translate per patch then NMS within the class
            translated = []
            for i in idxs:
                d = patch_results[i][c]
                if not len(d):
                    continue
                _, sc, x0, y0 = metas[i]
                dd = d.copy()
                dd[:, :4] /= sc
                dd[:, 0] += x0
                dd[:, 1] += y0
                translated.append(dd)
            if translated:
                cat = np.concatenate(translated).astype(np.float32)
                kept, idx, valid = nms_rotated(
                    cat[:, :5], cat[:, 5], iou_thr, max_out=len(cat))
                per_class_out.append(np.asarray(kept)[np.asarray(valid)])
            else:
                per_class_out.append(np.zeros((0, 6), np.float32))
        merged[base] = per_class_out
    return merged


def write_dota_submission(merged: Dict[str, List[np.ndarray]],
                          class_names: Sequence[str], out_dir: str,
                          version: str = "le90",
                          zip_name: Optional[str] = None) -> str:
    """Task1_<cls>.txt files + zip (``dota.py:285-323``)."""
    os.makedirs(out_dir, exist_ok=True)
    files = {}
    for c, cname in enumerate(class_names):
        path = os.path.join(out_dir, f"Task1_{cname}.txt")
        files[c] = open(path, "w")
    try:
        for img_id, per_class in merged.items():
            for c, dets in enumerate(per_class):
                if not len(dets):
                    continue
                polys = obb2poly_np(dets[:, :5], version)
                for poly, score in zip(polys, dets[:, 5]):
                    coords = " ".join(f"{v:.2f}" for v in poly)
                    files[c].write(f"{img_id} {score:.4f} {coords}\n")
    finally:
        for f in files.values():
            f.close()
    zip_path = os.path.join(out_dir, zip_name or "submission.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for cname in class_names:
            p = os.path.join(out_dir, f"Task1_{cname}.txt")
            zf.write(p, os.path.basename(p))
    return zip_path
