"""Rotation-equivariant ResNet (ReDet backbone), compact TPU re-design.

Parity target: ``mmrotate/models/backbones/re_resnet.py:406`` (+
``models/utils/enn.py``/``orconv.py``/``ripool.py``): the reference uses
e2cnn cyclic-group (C8) equivariant convolutions. Here equivariance comes
from **weight orbit materialization**: each conv's base weights are
expanded into 8 rotated + orientation-shifted copies via
``active_rotated_filter`` (one static einsum), giving features with an
explicit orientation axis (channels = C * 8). ``rotation_invariant_pool``
max-pools the orientation axis (RiPool), and RiRoIAlign
(``ops.orientation.riroi_align_rotated``) aligns orientation channels to
each RoI's angle.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.orientation import active_rotated_filter


class EquivariantConv(nn.Module):
    """C8-equivariant conv: base weight (k, k, Cin*O, Cout) expanded to an
    orbit of 8; output channels carry the orientation axis (Cout*O)."""

    out_channels: int       # per-orientation output channels
    kernel_size: int = 3
    stride: int = 1
    num_orientations: int = 8
    first_layer: bool = False   # input without orientation channels

    @nn.compact
    def __call__(self, x):
        o = self.num_orientations
        k = self.kernel_size
        cin = x.shape[-1] if self.first_layer else x.shape[-1] // o
        in_total = x.shape[-1]
        if self.first_layer:
            # lift: rotate the spatial kernel only (no orientation dim)
            base = self.param(
                "weight", nn.initializers.lecun_normal(),
                (k, k, in_total, self.out_channels))
            from ...ops.orientation import _rotation_interp_matrix
            import numpy as np
            mats = np.stack([
                _rotation_interp_matrix(k, 2 * np.pi * r / o)
                for r in range(o)])
            w = base.reshape(k * k, in_total, self.out_channels)
            orbit = jnp.einsum("rab,bcd->racd", jnp.asarray(mats), w)
            orbit = orbit.reshape(o, k, k, in_total, self.out_channels)
        else:
            base = self.param(
                "weight", nn.initializers.lecun_normal(),
                (k, k, in_total, self.out_channels))
            orbit = active_rotated_filter(base, o)
        # stack orbit along output channels: (k, k, in, out*O)
        wfull = jnp.concatenate([orbit[r] for r in range(o)], axis=-1)
        pad = (k - 1) // 2
        return jax.lax.conv_general_dilated(
            x, wfull, (self.stride, self.stride),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ReBasicBlock(nn.Module):
    channels: int
    stride: int = 1
    num_orientations: int = 8

    @nn.compact
    def __call__(self, x):
        o = self.num_orientations
        identity = x
        y = EquivariantConv(self.channels, 3, self.stride,
                            num_orientations=o, name="conv1")(x)
        y = nn.relu(nn.LayerNorm(name="norm1")(y))
        y = EquivariantConv(self.channels, 3, 1,
                            num_orientations=o, name="conv2")(y)
        y = nn.LayerNorm(name="norm2")(y)
        if identity.shape != y.shape:
            identity = EquivariantConv(
                self.channels, 1, self.stride,
                num_orientations=o, name="downsample")(x)
        return nn.relu(y + identity)


def rotation_invariant_pool(x, num_orientations: int = 8):
    """RiPool: max over the orientation axis (``ripool.py``)."""
    b, h, w, co = x.shape
    c = co // num_orientations
    return jnp.max(x.reshape(b, h, w, num_orientations, c), axis=3)


class ReResNet(nn.Module):
    """Compact equivariant ResNet (depths configurable; channels are
    per-orientation so actual widths are x8)."""

    stem_channels: int = 8
    stage_channels: Sequence[int] = (8, 16, 32, 64)
    stage_blocks: Sequence[int] = (2, 2, 2, 2)
    num_orientations: int = 8
    out_indices: Sequence[int] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, x, train: bool = False, dataset_ids=None):
        o = self.num_orientations
        x = EquivariantConv(self.stem_channels, 7, 2,
                            num_orientations=o, first_layer=True,
                            name="stem")(x)
        x = nn.relu(nn.LayerNorm(name="stem_norm")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1),
                                                            (1, 1)))
        outs = []
        for i, (ch, nb) in enumerate(zip(self.stage_channels,
                                         self.stage_blocks)):
            for j in range(nb):
                x = ReBasicBlock(
                    ch, stride=2 if (j == 0 and i > 0) else 1,
                    num_orientations=o,
                    name=f"stage{i}_block{j}")(x)
            if i in self.out_indices:
                outs.append(x)   # orientation channels kept for RiRoI
        return tuple(outs), None
