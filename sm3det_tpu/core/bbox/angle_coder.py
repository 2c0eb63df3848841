"""CSL (Circular Smooth Label) angle coder
(``mmrotate/core/bbox/coder/angle_coder.py`` parity).

Encodes continuous angles into ``omega``-binned circularly-smoothed
one-hot targets (gaussian / triangle / rect / pulse windows); decodes by
argmax bin center. Static shapes, jnp.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

PI = np.pi


class CSLCoder:
    def __init__(self, angle_version: str = "le90", omega: int = 1,
                 window: str = "gaussian", radius: int = 6):
        assert angle_version in ("oc", "le90", "le135")
        self.version = angle_version
        self.omega = omega
        self.window = window
        self.radius = radius
        # angle range per version (degrees)
        self.angle_range = 90 if angle_version == "oc" else 180
        self.angle_offset = {"oc": 0, "le90": 90, "le135": 45}[
            angle_version]
        self.coding_len = int(self.angle_range // omega)

    def encode(self, angle_targets):
        """(...,) radians -> (..., coding_len) smooth labels."""
        deg = angle_targets * (180.0 / PI) + self.angle_offset
        bin_idx = jnp.clip(deg // self.omega, 0, self.coding_len - 1)
        idx = jnp.arange(self.coding_len, dtype=jnp.float32)
        # circular distance in bins
        d = jnp.abs(idx - bin_idx[..., None])
        d = jnp.minimum(d, self.coding_len - d)
        r = self.radius
        if self.window == "gaussian":
            smooth = jnp.exp(-(d ** 2) / (2 * r * r))
        elif self.window == "triangle":
            smooth = jnp.clip(1 - d / r, 0, 1)
        elif self.window == "rect":
            smooth = (d <= r).astype(jnp.float32)
        else:  # pulse
            smooth = (d == 0).astype(jnp.float32)
        return smooth

    def decode(self, angle_preds):
        """(..., coding_len) logits -> (...,) radians."""
        idx = jnp.argmax(angle_preds, axis=-1).astype(jnp.float32)
        deg = idx * self.omega + self.omega / 2.0 - self.angle_offset
        return deg * (PI / 180.0)
