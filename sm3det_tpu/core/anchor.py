"""Anchor generation (mmdet ``AnchorGenerator`` semantics, static shapes).

Mirrors the behavior of mmdet's ``AnchorGenerator`` (consumed via
``mmrotate/core/anchor/anchor_generator.py:10``): per-level base anchors from
``scales x ratios`` around ``base_size = stride``, shifted over the feature
grid. Anchors are xyxy; ``RotatedAnchorGenerator`` re-expresses them as
``(cx, cy, w, h, 0)``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class AnchorGenerator:
    def __init__(self, strides, ratios, scales=None, octave_base_scale=None,
                 scales_per_octave=None, base_sizes=None, center_offset=0.0):
        self.strides = list(strides)
        self.ratios = np.asarray(ratios, np.float32)
        if scales is not None:
            self.scales = np.asarray(scales, np.float32)
        else:
            assert octave_base_scale is not None
            octave_scales = np.array(
                [2 ** (i / scales_per_octave)
                 for i in range(scales_per_octave)], np.float32)
            self.scales = octave_scales * octave_base_scale
        self.base_sizes = list(base_sizes) if base_sizes is not None \
            else list(strides)
        self.center_offset = center_offset

    @property
    def num_base_anchors(self):
        return len(self.ratios) * len(self.scales)

    def base_anchors(self, level: int) -> np.ndarray:
        """(A, 4) xyxy base anchors for one level, centered per offset."""
        base = self.base_sizes[level]
        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        # mmdet ordering: scales vary fastest within a ratio
        ws = (base * w_ratios[:, None] * self.scales[None, :]).reshape(-1)
        hs = (base * h_ratios[:, None] * self.scales[None, :]).reshape(-1)
        cx = self.center_offset * base
        cy = self.center_offset * base
        return np.stack(
            [cx - 0.5 * ws, cy - 0.5 * hs, cx + 0.5 * ws, cy + 0.5 * hs],
            axis=-1).astype(np.float32)

    def grid_anchors(self, featmap_sizes):
        """List over levels of (H*W*A, 4) xyxy anchors (numpy, host-side).

        Anchor layout matches mmdet: row-major over (y, x), base anchors
        fastest.
        """
        out = []
        for lvl, (h, w) in enumerate(featmap_sizes):
            stride = self.strides[lvl]
            base = self.base_anchors(lvl)                      # (A, 4)
            xs = np.arange(w, dtype=np.float32) * stride
            ys = np.arange(h, dtype=np.float32) * stride
            shift_x, shift_y = np.meshgrid(xs, ys)
            shifts = np.stack(
                [shift_x.ravel(), shift_y.ravel(),
                 shift_x.ravel(), shift_y.ravel()], axis=-1)   # (H*W, 4)
            anchors = (shifts[:, None, :] + base[None, :, :]).reshape(-1, 4)
            out.append(jnp.asarray(anchors))
        return out

    def grid_priors_centers(self, featmap_sizes):
        """Per-level (H*W, 2) anchor-center points ((x+0)*stride style)."""
        out = []
        for lvl, (h, w) in enumerate(featmap_sizes):
            stride = self.strides[lvl]
            xs = (np.arange(w, dtype=np.float32)) * stride
            ys = (np.arange(h, dtype=np.float32)) * stride
            shift_x, shift_y = np.meshgrid(xs, ys)
            out.append(jnp.asarray(
                np.stack([shift_x.ravel(), shift_y.ravel()], axis=-1)))
        return out


class RotatedAnchorGenerator(AnchorGenerator):
    """Grid priors as (cx, cy, w, h, 0) — ``anchor_generator.py:10``."""

    def grid_anchors(self, featmap_sizes):
        out = []
        for anchors in super().grid_anchors(featmap_sizes):
            cx = (anchors[:, 0] + anchors[:, 2]) * 0.5
            cy = (anchors[:, 1] + anchors[:, 3]) * 0.5
            w = anchors[:, 2] - anchors[:, 0]
            h = anchors[:, 3] - anchors[:, 1]
            out.append(jnp.stack(
                [cx, cy, w, h, jnp.zeros_like(cx)], axis=-1))
        return out


class PseudoAnchorGenerator(AnchorGenerator):
    """Anchor-free stand-in that only provides per-level valid flags
    (``mmrotate/core/anchor/anchor_generator.py:55``): one pseudo anchor
    per grid point, ``grid_anchors`` unsupported by design (RepPoints-style
    heads generate their own points)."""

    def __init__(self, strides):
        self.strides = [s if isinstance(s, (tuple, list)) else (s, s)
                        for s in strides]

    @property
    def num_base_anchors(self):
        return [1 for _ in self.strides]

    def grid_anchors(self, featmap_sizes):
        raise NotImplementedError(
            "PseudoAnchorGenerator provides valid flags only")
