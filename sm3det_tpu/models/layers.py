"""Common NN building blocks (flax.linen, NHWC layouts).

TPU-native equivalents of the mmcv CNN bricks used by the reference
(``mmcv/mmcv/cnn/bricks/conv_module.py``, ConvNeXt's LayerNorm2d/GRN at
``mmrotate/models/backbones/convnext_moe.py:30,68``, timm DropPath).
NHWC + channels-last norm means "LayerNorm2d" is just LayerNorm here.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class DropPath(nn.Module):
    """Stochastic depth per sample (timm semantics)."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        det = nn.merge_param(
            "deterministic", self.deterministic, deterministic)
        if det or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class GRN(nn.Module):
    """Global Response Normalization (ConvNeXt-V2;
    ``convnext_moe.py:68``). NHWC: norm over spatial dims."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        gx = jnp.sqrt(jnp.sum(x * x, axis=(1, 2), keepdims=True))
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + self.eps)
        return gamma * (x * nx) + beta + x


class SyncBatchNorm(nn.Module):
    """Cross-device BatchNorm (reference ``sync_bn`` CUDA op,
    ``mmcv/mmcv/ops/csrc/pytorch/cuda/sync_bn_cuda.cu`` + the
    ``SyncBN`` norm_cfg knob): flax BatchNorm whose batch statistics
    are psum-averaged over the ``axis_name`` mesh axis — on TPU the
    cross-replica reduction is one XLA collective inside the step, no
    separate op needed. Used when a config requests
    ``norm_cfg=dict(type='SyncBN')``; the SM3Det backbones keep LN by
    design (documented deviation), so this exists for config parity
    and zoo breadth."""

    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = "data"

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param("use_running_average",
                             self.use_running_average,
                             use_running_average)
        # only reduce over the mesh axis when it exists in this trace
        # (single-device eval/jit without a mesh must still work)
        axis = self.axis_name
        try:
            import jax
            jax.lax.axis_index(axis)    # raises outside shard_map/pmap
        except Exception:               # noqa: BLE001
            axis = None
        return nn.BatchNorm(use_running_average=ura,
                            momentum=self.momentum,
                            epsilon=self.epsilon,
                            axis_name=axis, name="bn")(x)


class ConvModule(nn.Module):
    """conv(+norm)(+act) brick (mmcv ``ConvModule`` behavior).

    NHWC; supports 'GN' group norm, 'LN', and 'SyncBN' (cross-device
    batch stats via ``SyncBatchNorm``; note the SM3Det configs' necks/
    heads use no norm or GN — SyncBN exists for config parity).
    """

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int | str = "SAME"
    norm: Optional[str] = None      # None | 'GN' | 'LN' | 'SyncBN'
    num_groups: int = 32
    act: Optional[str] = None       # None | 'relu' | 'gelu'
    use_bias: Optional[bool] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bias = self.use_bias if self.use_bias is not None \
            else self.norm is None
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        x = nn.Conv(self.out_channels, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride), padding=pad,
                    use_bias=bias, name="conv")(x)
        if self.norm == "GN":
            x = nn.GroupNorm(num_groups=self.num_groups, name="gn")(x)
        elif self.norm == "LN":
            x = nn.LayerNorm(epsilon=1e-6, name="ln")(x)
        elif self.norm == "SyncBN":
            x = SyncBatchNorm(name="sync_bn")(
                x, use_running_average=not train)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "gelu":
            x = nn.gelu(x)
        return x


class Scale(nn.Module):
    """Learnable scalar multiplier (GFL per-level reg scale)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param("scale",
                       nn.initializers.constant(self.init_value), ())
        return x * s

def gelu(x):
    """GELU matching the reference's exact-erf ``nn.GELU`` in f32; on the
    bf16 compute path the tanh approximation is used — its error (<0.1%
    of activation scale) is below bf16 quantization noise, while XLA's
    exact erf expansion costs ~6 ms/step at bench shapes
    (tools/profiling/archive/profile_backbone5.py ablation)."""
    import jax.numpy as jnp
    return nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))
