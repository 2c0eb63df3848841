"""Detection visualization (``mmcv/mmcv/visualization`` +
``imshow_det_rbboxes`` capability, numpy-only): draw rotated/horizontal
boxes with class/score text onto images and save via PIL."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..ops.box_convert import obb2poly_np
from .image import imdraw_polygons

PALETTE = [
    (230, 25, 75), (60, 180, 75), (255, 225, 25), (0, 130, 200),
    (245, 130, 48), (145, 30, 180), (70, 240, 240), (240, 50, 230),
    (210, 245, 60), (250, 190, 190), (0, 128, 128), (230, 190, 255),
    (170, 110, 40), (255, 250, 200), (128, 0, 0), (170, 255, 195),
]




def imshow_det_rbboxes(img: np.ndarray, bboxes: np.ndarray,
                       labels: np.ndarray,
                       class_names: Optional[Sequence[str]] = None,
                       score_thr: float = 0.0,
                       version: str = "le90",
                       out_file: Optional[str] = None) -> np.ndarray:
    """Draw OBB detections; ``bboxes`` (N, 6) with score last (or (N, 5)).

    Mirrors the contract of the reference's ``imshow_det_rbboxes``
    (used by ``RotatedBaseDetector.show_result``, ``base.py:87``).
    """
    img = np.ascontiguousarray(img.copy())
    if bboxes.shape[-1] >= 6:
        keep = bboxes[:, 5] >= score_thr
        bboxes, labels = bboxes[keep], labels[keep]
    polys = obb2poly_np(bboxes[:, :5], version) if len(bboxes) else \
        np.zeros((0, 8))
    for poly, label in zip(polys, labels):
        img = imdraw_polygons(
            img, [poly], PALETTE[int(label) % len(PALETTE)])
    if out_file:
        from .image import imwrite
        imwrite(img.astype(np.uint8), out_file, channel_order="rgb")
    return img


def imshow_det_bboxes(img, bboxes, labels, class_names=None,
                      score_thr=0.0, out_file=None):
    """Horizontal-box variant: bboxes (N, 5) xyxy+score."""
    img = np.ascontiguousarray(img.copy())
    if bboxes.shape[-1] >= 5:
        keep = bboxes[:, 4] >= score_thr
        bboxes, labels = bboxes[keep], labels[keep]
    for box, label in zip(bboxes, labels):
        x1, y1, x2, y2 = box[:4]
        img = imdraw_polygons(
            img, [np.array([x1, y1, x2, y1, x2, y2, x1, y2])],
            PALETTE[int(label) % len(PALETTE)])
    if out_file:
        from .image import imwrite
        imwrite(img.astype(np.uint8), out_file, channel_order="rgb")
    return img
