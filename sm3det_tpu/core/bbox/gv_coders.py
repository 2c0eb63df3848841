"""Gliding-Vertex coders (``mmrotate/core/bbox/coder/gliding_vertex_coder
.py`` parity): GVFixCoder encodes an OBB as 4 sliding fractions of its
enclosing HBB's edges; GVRatioCoder encodes the area ratio obb/hbb."""

from __future__ import annotations

import jax.numpy as jnp

from ...ops.box_convert import obb2poly, obb2xyxy


class GVFixCoder:
    def __init__(self, angle_range: str = "le90"):
        self.version = angle_range

    def encode(self, obbs):
        """(..., 5) -> (..., 4) edge-sliding fractions (t, r, d, l)."""
        polys = obb2poly(obbs, self.version)
        xs = polys[..., 0::2]
        ys = polys[..., 1::2]
        xmin = jnp.min(xs, -1)
        xmax = jnp.max(xs, -1)
        ymin = jnp.min(ys, -1)
        ymax = jnp.max(ys, -1)
        w = jnp.maximum(xmax - xmin, 1e-6)
        h = jnp.maximum(ymax - ymin, 1e-6)
        # vertex touching each hbb edge: top edge -> x of the min-y vertex
        top_x = jnp.take_along_axis(
            xs, jnp.argmin(ys, -1)[..., None], -1)[..., 0]
        right_y = jnp.take_along_axis(
            ys, jnp.argmax(xs, -1)[..., None], -1)[..., 0]
        down_x = jnp.take_along_axis(
            xs, jnp.argmax(ys, -1)[..., None], -1)[..., 0]
        left_y = jnp.take_along_axis(
            ys, jnp.argmin(xs, -1)[..., None], -1)[..., 0]
        return jnp.stack([
            (top_x - xmin) / w, (right_y - ymin) / h,
            (xmax - down_x) / w, (ymax - left_y) / h], -1)

    def decode(self, hbbs, fix_deltas):
        """hbbs (..., 4) xyxy + fractions (..., 4) -> polys (..., 8)."""
        x1, y1, x2, y2 = (hbbs[..., i] for i in range(4))
        w = x2 - x1
        h = y2 - y1
        t, r, d, l = (jnp.clip(fix_deltas[..., i], 0, 1)
                      for i in range(4))
        p1 = (x1 + t * w, y1)
        p2 = (x2, y1 + r * h)
        p3 = (x2 - d * w, y2)
        p4 = (x1, y2 - l * h)
        return jnp.stack([p1[0], p1[1], p2[0], p2[1],
                          p3[0], p3[1], p4[0], p4[1]], -1)


class GVRatioCoder:
    def __init__(self, angle_range: str = "le90"):
        self.version = angle_range

    def encode(self, obbs):
        """(..., 5) -> (..., 1) area(obb)/area(hbb)."""
        hbb = obb2xyxy(obbs, self.version)
        area_h = jnp.maximum(
            (hbb[..., 2] - hbb[..., 0]) * (hbb[..., 3] - hbb[..., 1]),
            1e-6)
        area_o = obbs[..., 2] * obbs[..., 3]
        return (area_o / area_h)[..., None]
