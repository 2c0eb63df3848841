"""Rotation-equivariant ResNet + FPN (ReDet backbone), TPU re-design.

Parity target: ``mmrotate/models/backbones/re_resnet.py:406`` +
``mmrotate/models/necks/re_fpn.py`` (+ ``models/utils/enn.py`` /
``ripool.py``): the reference uses e2cnn cyclic-group (C8) equivariant
convolutions. Here equivariance comes from **weight-orbit
materialization**: each conv's base weights are expanded into 8
rotated + orientation-shifted copies with the EXACT 45-degree
index-table semantics of ``active_rotated_filter``
(:func:`sm3det_tpu.ops.orientation.arf_expand`), i.e. a C8 group
convolution lowered to ONE dense conv on the MXU. Channel layout is
orientation-fastest ``(C, O)`` everywhere, matching
``rotation_invariant_pool`` (RiPool) and ``orientation_align`` /
``riroi_align_rotated`` (RiRoIAlign).

Equivariance is exact at 90-degree multiples (regression-tested);
45-degree steps use the reference's own ring-permutation approximation.
The 7x7 stem lift uses bilinear kernel rotation (exact at 90 degrees) —
the TPU stand-in for e2cnn's steerable basis.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.orientation import (_rotation_interp_matrix, arf_expand,
                                rotation_invariant_pool)


class EquivariantConv(nn.Module):
    """C8-equivariant conv: base weight (k, k, Cin, O_in, Cout) expanded
    to an 8-rotation orbit; output channels carry the orientation axis
    with layout (Cout, O), orientation fastest — consistent with the
    input grouping ``arf_expand`` assumes, so layers compose into a
    genuine group convolution."""

    out_channels: int       # per-orientation output channels
    kernel_size: int = 3
    stride: int = 1
    num_orientations: int = 8
    first_layer: bool = False   # lift: input without orientation channels

    @nn.compact
    def __call__(self, x):
        o = self.num_orientations
        k = self.kernel_size
        o_in = 1 if self.first_layer else o
        cin = x.shape[-1] // o_in
        w = self.param(
            "weight", nn.initializers.lecun_normal(),
            (k, k, cin, o_in, self.out_channels))
        if k in (1, 3):
            # exact ARF index-table rotation (the reference op's spec)
            wfull = arf_expand(w, o)
        else:
            if not self.first_layer:
                raise ValueError(
                    f"ARF index tables only cover k in (1, 3); k={k} is "
                    "only supported for the first-layer lift")
            # lift with bilinear spatial kernel rotation (exact at 90deg)
            mats = np.stack([_rotation_interp_matrix(k, 2 * np.pi * r / o)
                             for r in range(o)])      # (O, kk, kk)
            wf = w.reshape(k * k, cin, self.out_channels)
            orbit = jnp.einsum("rab,bcd->racd", jnp.asarray(mats), wf)
            orbit = orbit.reshape(o, k, k, cin, self.out_channels)
            # (k, k, cin, cout, O) -> orientation-fastest output layout
            wfull = jnp.transpose(orbit, (1, 2, 3, 4, 0)).reshape(
                k, k, cin, self.out_channels * o)
        pad = (k - 1) // 2
        return jax.lax.conv_general_dilated(
            x, wfull.astype(x.dtype), (self.stride, self.stride),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class EquivariantLayerNorm(nn.Module):
    """LayerNorm whose scale/bias are SHARED across the orientation axis
    (e2cnn InnerBatchNorm contract): channel stats are permutation
    invariant, so tying gamma/beta per field keeps exact equivariance."""

    num_orientations: int = 8
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        o = self.num_orientations
        c = x.shape[-1] // o
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        gamma = self.param("scale", nn.initializers.ones, (c,))
        beta = self.param("bias", nn.initializers.zeros, (c,))
        y = y.reshape(x.shape[:-1] + (c, o))
        y = y * gamma[:, None] + beta[:, None]
        return y.reshape(x.shape)


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
        y = nn.relu(EquivariantLayerNorm(o, name="norm1")(y))
        y = EquivariantConv(self.channels, 3, 1,
                            num_orientations=o, name="conv2")(y)
        y = EquivariantLayerNorm(o, name="norm2")(y)
        if identity.shape != y.shape:
            identity = EquivariantConv(
                self.channels, 1, self.stride,
                num_orientations=o, name="downsample")(x)
        return nn.relu(y + identity)


class ReFPN(nn.Module):
    """Equivariant FPN (``mmrotate/models/necks/re_fpn.py``): 1x1
    equivariant laterals (= cyclic group conv over the orientation
    axis), nearest-neighbor top-down pathway, 3x3 equivariant output
    convs. Outputs keep the (C, O) orientation-fastest layout so
    RiRoIAlign can align them per-RoI."""

    out_channels: int           # TOTAL channels (per-orientation * O)
    num_outs: int = 5
    num_orientations: int = 8

    @nn.compact
    def __call__(self, feats):
        o = self.num_orientations
        c = self.out_channels // o
        laterals = [
            EquivariantConv(c, 1, num_orientations=o,
                            name=f"lateral{i}")(f)
            for i, f in enumerate(feats)]
        for i in range(len(laterals) - 1, 0, -1):
            up = jax.image.resize(
                laterals[i], laterals[i - 1].shape, method="nearest")
            laterals[i - 1] = laterals[i - 1] + up
        outs = [EquivariantConv(c, 3, num_orientations=o,
                                name=f"fpn_conv{i}")(l)
                for i, l in enumerate(laterals)]
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return outs


class ReResNet(nn.Module):
    """Equivariant ResNet (depths configurable; ``stage_channels`` are
    per-orientation so actual tensor widths are x ``num_orientations``)."""

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
        x = nn.relu(EquivariantLayerNorm(o, name="stem_norm")(x))
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


__all__ = ["EquivariantConv", "EquivariantLayerNorm", "ReBasicBlock",
           "ReFPN", "ReResNet", "rotation_invariant_pool"]
