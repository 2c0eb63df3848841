"""ConvNeXt / ConvNeXt-MoE backbone (flax, NHWC).

Capability parity with ``mmrotate/models/backbones/convnext_moe.py``:
stages of (dw7x7 -> LN -> FFN or grid-MoE -> layer-scale -> droppath)
blocks, stem + inter-stage downsampling, per-out-index LayerNorm, and the
``MultiInput`` variant with a dataset-keyed stem dict (the reference
currently shares one ``'single'`` stem across modalities,
``convnext_moe.py:730-820``). Returns ``(features, gate_loss)`` where
``gate_loss`` is the mean of the MoE aux losses (``:846-849``) or None.

TPU notes: NHWC throughout, pointwise convs are Dense on channels-last
(feed the MXU directly); the MoE uses the static capacity dispatch from
:mod:`sm3det_tpu.models.moe`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.pallas.convnext_block_kernel import (fused_block_supported,
                                                 fused_convnext_block,
                                                 fused_dwconv_ln)
from ..layers import DropPath, GRN, gelu as _policy_gelu
from ..moe import MoELayer


def layernorm_math(x, scale, bias, eps: float = 1e-6):
    """Trailing-axis LayerNorm replicating ``flax.linen.LayerNorm``
    exactly (f32 fast-variance stats, flax's promotion rules) so the
    param-container block below is numerically identical to the
    previous ``nn.LayerNorm`` call."""
    xf = x.astype(jnp.promote_types(jnp.float32, x.dtype))
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean)
    y = (x - mean) * (jax.lax.rsqrt(var + eps) * scale) + bias
    return y.astype(jnp.result_type(x.dtype, scale.dtype, bias.dtype))


def _dwconv7(x, kernel, bias):
    """7x7 depthwise conv, flax ``nn.Conv(feature_group_count=C)``
    semantics (dtype promotion included)."""
    dt = jnp.result_type(x.dtype, kernel.dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dt), kernel.astype(dt), window_strides=(1, 1),
        padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])
    return y + bias.astype(dt)


def _dense(x, kernel, bias):
    dt = jnp.result_type(x.dtype, kernel.dtype)
    return jnp.dot(x.astype(dt), kernel.astype(dt)) + bias.astype(dt)


class _ConvP(nn.Module):
    """Parameter container mirroring ``nn.Conv``'s tree (kernel/bias)."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       self.shape)
        b = self.param("bias", nn.initializers.zeros,
                       (self.shape[-1],))
        return k, b


class _LNP(nn.Module):
    """Parameter container mirroring ``nn.LayerNorm`` (scale/bias)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,)),
                self.param("bias", nn.initializers.zeros, (self.dim,)))


class LayerNormOpt(nn.Module):
    """``nn.LayerNorm`` drop-in (same param tree) using the lean
    one-fusion LN math (measured 2x the flax module's multi-pass
    lowering at bench shapes; the Pallas LN kernel measured slower
    still — grid-step overhead beats the saved traffic at these sizes,
    tools/profiling/archive/profile_fused_block.py)."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x, fused: bool = False):
        del fused
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return layernorm_math(x, scale, bias, self.epsilon)

ARCH_SETTINGS = {
    "atto": {"depths": [2, 2, 6, 2], "channels": [40, 80, 160, 320]},
    "femto": {"depths": [2, 2, 6, 2], "channels": [48, 96, 192, 384]},
    "pico": {"depths": [2, 2, 6, 2], "channels": [64, 128, 256, 512]},
    "nano": {"depths": [2, 2, 8, 2], "channels": [80, 160, 320, 640]},
    "tiny": {"depths": [3, 3, 9, 3], "channels": [96, 192, 384, 768]},
    "small": {"depths": [3, 3, 27, 3], "channels": [96, 192, 384, 768]},
    "base": {"depths": [3, 3, 27, 3], "channels": [128, 256, 512, 1024]},
    "large": {"depths": [3, 3, 27, 3], "channels": [192, 384, 768, 1536]},
    "xlarge": {"depths": [3, 3, 27, 3], "channels": [256, 512, 1024, 2048]},
}


class DALayer(nn.Module):
    """Domain-Attention: SE-style channel attention with one FC branch per
    dataset {sar:0, rgb:1, ifr:2} (``convnext_moe_DA.py:295-319``).
    Branch selection is a static one-hot mix over per-sample dataset ids."""

    dim: int
    reduction: int = 16
    num_datasets: int = 3

    @nn.compact
    def __call__(self, x, dataset_ids):
        """x: (B, H, W, C); dataset_ids: (B,) int32."""
        b = x.shape[0]
        y = jnp.mean(x, axis=(1, 2))                       # (B, C)
        scales = []
        for d in range(self.num_datasets):
            h = nn.Dense(self.dim // self.reduction, use_bias=False,
                         name=f"fc{d}_0")(y)
            h = nn.relu(h)
            h = nn.Dense(self.dim, use_bias=False, name=f"fc{d}_1")(h)
            scales.append(nn.sigmoid(h))
        scales = jnp.stack(scales, axis=1)                 # (B, D, C)
        onehot = jax.nn.one_hot(dataset_ids, self.num_datasets,
                                dtype=x.dtype)             # (B, D)
        scale = jnp.einsum("bdc,bd->bc", scales, onehot)
        return x * scale[:, None, None, :]


class ConvNeXtBlock(nn.Module):
    """One ConvNeXt block; ``moe`` config swaps the FFN for a grid MoE
    (``convnext_moe.py:295-380``); ``use_da`` adds Domain Attention after
    the FFN (the DA baseline, ``convnext_moe_DA.py:369``)."""

    dim: int
    drop_path_rate: float = 0.0
    mlp_ratio: float = 4.0
    layer_scale_init_value: float = 1e-6
    use_grn: bool = False
    moe: Optional[Dict[str, Any]] = None
    use_da: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, dataset_ids=None):
        shortcut = x
        aux = None
        b, h, w, c = x.shape
        hidden = int(self.mlp_ratio * self.dim)

        # params declared via containers (same tree/names/inits as the
        # previous nn.Conv/nn.LayerNorm/nn.Dense calls) so both compute
        # routes share them and checkpoints stay compatible
        dwk, dwb = _ConvP((7, 7, 1, self.dim), name="dwconv")()
        lns, lnb = _LNP(self.dim, name="norm")()
        w1 = b1 = w2 = b2 = None
        if self.moe is None:
            w1, b1 = _ConvP((self.dim, hidden), name="pwconv1")()
            w2, b2 = _ConvP((hidden, self.dim), name="pwconv2")()
        gamma = None
        if self.layer_scale_init_value > 0 and not self.use_grn:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,))

        # bf16-only: the fused kernel's MXU partitioning differs from
        # XLA's at f32 (both are bf16-pass decompositions, ~1e-3 apart);
        # the f32 path keeps the XLA formulation as the exact oracle
        fused = (jax.default_backend() == "tpu"
                 and x.dtype == jnp.bfloat16 and not self.use_grn)

        if (fused and not train and self.moe is None and not self.use_da
                and gamma is not None
                and fused_block_supported(h, w, c, hidden)):
            # whole dense block in one Pallas pass (inference)
            return fused_convnext_block(
                x, dwk, dwb, lns, lnb, w1, b1, w2, b2, gamma), aux

        if fused and not train and fused_block_supported(h, w, c):
            # inference-only: a trainable custom-VJP wrapper exists
            # (fused_dwconv_ln_train) but measured NET SLOWER in the
            # train step (126.7 vs 119.2 ms/step device time — the f32
            # in-kernel MACs buy nothing at batch 4 and the recompute
            # backward runs its convs at f32; docs/PERF.md round 4)
            x = fused_dwconv_ln(x, dwk, dwb, lns, lnb)
        else:
            x = _dwconv7(x, dwk, dwb)
            x = layernorm_math(x, lns, lnb)

        if self.moe is not None:
            tokens = x.reshape(-1, c)
            y, aux = MoELayer(
                dim=self.dim,
                hidden=hidden,
                num_experts=self.moe.get("num_experts", 8),
                top_k=self.moe.get("top_k", 2),
                gating=self.moe.get("gating", "cosine"),
                noisy_gating=self.moe.get("noisy_gating", True),
                capacity_factor=self.moe.get("capacity_factor", 1.5),
                use_grn=self.use_grn,
                name="ffn")(tokens, train=train)
            x = y.reshape(b, h, w, c)
        else:
            x = _dense(x, w1, b1)
            x = _policy_gelu(x)
            if self.use_grn:
                x = GRN(hidden, name="grn")(x)
            x = _dense(x, w2, b2)
        if self.use_da and dataset_ids is not None:
            x = DALayer(self.dim, name="da")(x, dataset_ids)
        if gamma is not None:
            x = x * gamma
        x = shortcut + DropPath(self.drop_path_rate, name="drop_path")(
            x, deterministic=not train)
        return x, aux


class ConvNeXtMoE(nn.Module):
    """ConvNeXt with optional grid-MoE blocks (``ConvNeXt_moe``,
    ``convnext_moe.py:407``)."""

    arch: str = "tiny"
    in_channels: int = 3
    stem_patch_size: int = 4
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1e-6
    use_grn: bool = False
    out_indices: Sequence[int] = (0, 1, 2, 3)
    moe_block_inds: Sequence[Sequence[int]] = ((), (), (), ())
    num_experts: int = 2
    top_k: int = 2
    gate: str = "cosine"
    noisy_gating: bool = True
    capacity_factor: float = 1.5
    multi_input: bool = False
    datasets: Sequence[str] = ("single",)
    use_da: bool = False
    da_block_inds: Sequence[Sequence[int]] = ((), (), (), ())

    def _arch(self):
        return ARCH_SETTINGS[self.arch]

    @nn.compact
    def __call__(self, x, train: bool = False, dataset_ids=None):
        depths = self._arch()["depths"]
        channels = self._arch()["channels"]
        total = sum(depths)
        dpr = np.linspace(0, self.drop_path_rate, total)

        if self.multi_input:
            # dataset-keyed stems; the reference currently routes all
            # modalities through the shared 'single' stem after concat
            x = nn.Conv(channels[0],
                        (self.stem_patch_size, self.stem_patch_size),
                        strides=self.stem_patch_size, padding="VALID",
                        name="stem_single")(x)
        else:
            x = nn.Conv(channels[0],
                        (self.stem_patch_size, self.stem_patch_size),
                        strides=self.stem_patch_size, padding="VALID",
                        name="stem_conv")(x)

        outs = []
        gate_losses = []
        block_idx = 0
        fused_ln = not train
        for i, (depth, dim) in enumerate(zip(depths, channels)):
            if i == 0:
                x = LayerNormOpt(name="stem_norm")(x, fused=fused_ln)
            else:
                x = LayerNormOpt(name=f"downsample_norm{i}")(
                    x, fused=fused_ln)
                x = nn.Conv(dim, (2, 2), strides=2, padding="VALID",
                            name=f"downsample_conv{i}")(x)
            moe_inds = [q for q in self.moe_block_inds[i] if q < depth]
            da_inds = [q for q in self.da_block_inds[i] if q < depth] \
                if self.use_da else []
            for j in range(depth):
                moe_cfg = None
                if j in moe_inds:
                    moe_cfg = {
                        "num_experts": self.num_experts,
                        "top_k": self.top_k,
                        "gating": self.gate,
                        "noisy_gating": self.noisy_gating,
                        "capacity_factor": self.capacity_factor,
                    }
                x, aux = ConvNeXtBlock(
                    dim=dim,
                    drop_path_rate=float(dpr[block_idx + j]),
                    layer_scale_init_value=self.layer_scale_init_value,
                    use_grn=self.use_grn,
                    moe=moe_cfg,
                    use_da=self.use_da and j in da_inds,
                    name=f"stage{i}_block{j}")(
                        x, train=train, dataset_ids=dataset_ids)
                if aux is not None:
                    gate_losses.append(aux)
            block_idx += depth
            if i in self.out_indices:
                outs.append(LayerNormOpt(name=f"out_norm{i}")(
                    x, fused=fused_ln))

        gate_loss = None
        if gate_losses:
            gate_loss = sum(gate_losses) / len(gate_losses)
        return tuple(outs), gate_loss
