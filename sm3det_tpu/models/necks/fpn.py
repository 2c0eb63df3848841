"""FPN + MultitaskFPN (flax, NHWC).

``MultitaskFPN`` (``mmrotate/models/necks/Multitask_FPN.py:15,108-162``)
is an FPN whose *forward* accepts per-call ``start_level`` /
``add_extra_convs`` overrides so ONE set of lateral/fpn convs serves both
the GFL branch (strides 8-128, start_level=1, extra P6 conv on output) and
the Oriented R-CNN branches (strides 4-64, extra level via maxpool) in the
same compiled step. ``extra_level`` adds one extra-conv slot beyond the
backbone levels.

TPU notes: upsampling is nearest-neighbor ``jnp.repeat`` (no resize
gather); all convs are 1x1/3x3 NHWC feeding the MXU.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


def _upsample_nearest_2x(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class MultitaskFPN(nn.Module):
    in_channels: Sequence[int] = (96, 192, 384, 768)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    extra_level: int = 1
    add_extra_convs: str | bool = "on_output"
    relu_before_extra_convs: bool = False

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray],
                 start_level: Optional[int] = None,
                 add_extra_convs: Optional[str | bool] = None,
                 ) -> Tuple[jnp.ndarray, ...]:
        if start_level is None:
            start_level = self.start_level
        if add_extra_convs is None:
            add_extra_convs = self.add_extra_convs
        n_in = len(self.in_channels)

        # declare all lateral/fpn convs once so parameters exist regardless
        # of the per-call start_level
        lateral_convs = [
            nn.Conv(self.out_channels, (1, 1), name=f"lateral{i}")
            for i in range(n_in)]
        fpn_convs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, name=f"fpn{i}")
            for i in range(n_in)]
        # reference sizing (Multitask_FPN.py:90): with 4 backbone levels,
        # num_outs=5, extra_level=1 there are TWO extra convs; the first
        # (stride-64) is shared by both the start_level=0 and start_level=1
        # call modes, the second (stride-128) only serves the SAR path.
        num_extra = max(self.num_outs - n_in + self.extra_level, 0)
        extra_convs = [
            nn.Conv(self.out_channels, (3, 3), strides=2, padding=1,
                    name=f"extra{i}")
            for i in range(num_extra)]

        if self.is_initializing():
            # materialize every conv's params regardless of this call's
            # mode: both start_level modes must share one param set
            for sl in (0, 1):
                if sl == start_level or sl >= n_in:
                    continue
                self._run(inputs, sl, "on_output",
                          lateral_convs, fpn_convs, extra_convs)

        return self._run(inputs, start_level, add_extra_convs,
                         lateral_convs, fpn_convs, extra_convs)

    def _run(self, inputs, start_level, add_extra_convs,
             lateral_convs, fpn_convs, extra_convs):
        n_in = len(self.in_channels)
        laterals = [lateral_convs[i + start_level](inputs[i + start_level])
                    for i in range(n_in - start_level)]

        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + \
                _upsample_nearest_2x(laterals[i])

        outs = [fpn_convs[i + start_level](laterals[i])
                for i in range(len(laterals))]

        if self.num_outs > len(outs):
            if not add_extra_convs:
                while len(outs) < self.num_outs:
                    outs.append(nn.max_pool(
                        outs[-1], (1, 1), strides=(2, 2)))
            else:
                if add_extra_convs == "on_input":
                    extra_source = inputs[-1]
                elif add_extra_convs == "on_lateral":
                    extra_source = laterals[-1]
                else:  # 'on_output'
                    extra_source = outs[-1]
                # the reference indexes extra convs beyond the backbone
                # levels; with start_level=1 the first extra conv used is
                # the same parameter slot, preserved here by indexing from 0
                extra_idx = 0
                outs.append(extra_convs[extra_idx](extra_source))
                extra_idx += 1
                while len(outs) < self.num_outs:
                    src = outs[-1]
                    if self.relu_before_extra_convs:
                        src = nn.relu(src)
                    outs.append(extra_convs[extra_idx](src))
                    extra_idx += 1
        return tuple(outs)


class FPN(MultitaskFPN):
    """Plain FPN: same module with fixed call-time behavior."""


class SimpleFPN(nn.Module):
    """Simple Feature Pyramid for ViTDet-style single-scale backbones
    (``mmrotate/models/necks/simpleFPN.py:22-109``): the single stride-16
    ViT map is re-scaled to 4 levels (4x up via two stride-2 transposed
    convs with LayerNorm+GELU between, 2x up via one transposed conv,
    identity, and 2x max-pool), then per-level 1x1 lateral + 3x3 fpn
    convs; extra outputs are stride-2 1x1 max-pools of the last level.

    TPU notes: NHWC; transposed convs are ``nn.ConvTranspose`` feeding
    the MXU; norm is LayerNorm over channels (the reference's default
    norm for ViTDet necks).
    """

    backbone_channel: int = 768
    in_channels: Sequence[int] = (192, 384, 768, 768)
    out_channels: int = 256
    num_outs: int = 5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        """x: (B, H, W, backbone_channel) single stride-16 map."""
        bc = self.backbone_channel
        up1 = nn.ConvTranspose(bc // 2, (2, 2), strides=(2, 2),
                               name="fpn1_up1")(x)
        up1 = nn.LayerNorm(epsilon=1e-6, name="fpn1_norm")(up1)
        up1 = nn.gelu(up1, approximate=False)
        up1 = nn.ConvTranspose(bc // 4, (2, 2), strides=(2, 2),
                               name="fpn1_up2")(up1)
        up2 = nn.ConvTranspose(bc // 2, (2, 2), strides=(2, 2),
                               name="fpn2_up")(x)
        down4 = nn.max_pool(x, (2, 2), strides=(2, 2))
        inputs = [up1, up2, x, down4]

        outs = []
        for i, feat in enumerate(inputs):
            lat = nn.Conv(self.out_channels, (1, 1),
                          name=f"lateral_conv{i}")(feat)
            outs.append(nn.Conv(self.out_channels, (3, 3), padding=1,
                                name=f"fpn_conv{i}")(lat))
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)
