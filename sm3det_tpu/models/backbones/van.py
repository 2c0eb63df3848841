"""VAN / VAN-MoE backbone (flax, NHWC).

Parity target: ``mmrotate/models/backbones/van_moe.py`` (plain ``van.py``):
Large-Kernel-Attention (5x5 dw + 7x7 dilated-3 dw + 1x1, multiplicative
gating), BN->LN blocks with layer-scale 1e-2, overlapping patch embeds,
MoE optionally replacing MLP fc1/fc2 (same contract as LSKNet).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..layers import DropPath, gelu as _policy_gelu
from .lsknet import ConvMlp


class LKA(nn.Module):
    """Large Kernel Attention (``van_moe.py:318-332``)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        d = self.dim
        attn = nn.Conv(d, (5, 5), padding=2, feature_group_count=d,
                       name="conv0")(x)
        attn = nn.Conv(d, (7, 7), padding=9, kernel_dilation=3,
                       feature_group_count=d, name="conv_spatial")(attn)
        attn = nn.Conv(d, (1, 1), name="conv1")(attn)
        return x * attn


class VANAttention(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.Conv(self.dim, (1, 1), name="proj_1")(x)
        x = _policy_gelu(x)
        x = LKA(self.dim, name="spatial_gating_unit")(x)
        x = nn.Conv(self.dim, (1, 1), name="proj_2")(x)
        return x + shortcut


class VANBlock(nn.Module):
    dim: int
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    moe_fc1: Optional[Dict[str, Any]] = None
    moe_fc2: Optional[Dict[str, Any]] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ls1 = self.param("layer_scale_1",
                         nn.initializers.constant(1e-2), (self.dim,))
        ls2 = self.param("layer_scale_2",
                         nn.initializers.constant(1e-2), (self.dim,))
        dp = DropPath(self.drop_path_rate, name="drop_path")
        y = nn.LayerNorm(name="norm1")(x)
        y = VANAttention(self.dim, name="attn")(y)
        x = x + dp(ls1 * y, deterministic=not train)
        y = nn.LayerNorm(name="norm2")(x)
        y, aux = ConvMlp(self.dim, int(self.dim * self.mlp_ratio),
                         self.moe_fc1, self.moe_fc2, name="mlp")(
                             y, train=train)
        x = x + dp(ls2 * y, deterministic=not train)
        return x, aux


class VANMoE(nn.Module):
    """VAN(-MoE) (``VAN_moe`` ``van_moe.py:410``, MultiInput ``:590``).
    Default arch b1: depths [2,2,4,2], dims [64,128,320,512]; b0:
    [3,3,5,2] / [32,64,160,256]."""

    embed_dims: Sequence[int] = (32, 64, 160, 256)
    depths: Sequence[int] = (3, 3, 5, 2)
    mlp_ratios: Sequence[float] = (8.0, 8.0, 4.0, 4.0)
    drop_path_rate: float = 0.0
    out_indices: Sequence[int] = (0, 1, 2, 3)
    moe_block_inds_fc1: Sequence[Sequence[int]] = ((), (), (), ())
    moe_block_inds_fc2: Sequence[Sequence[int]] = ((), (), (), ())
    num_experts: int = 2
    top_k: int = 2
    gate: str = "cosine"
    noisy_gating: bool = True
    capacity_factor: float = 1.5
    multi_input: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, dataset_ids=None):
        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        moe_cfg = {"num_experts": self.num_experts, "top_k": self.top_k,
                   "gating": self.gate, "noisy_gating": self.noisy_gating,
                   "capacity_factor": self.capacity_factor}
        outs, gate_losses = [], []
        block_idx = 0
        for i, (depth, dim) in enumerate(zip(self.depths, self.embed_dims)):
            if i == 0:
                name = "stem_single" if self.multi_input else "patch_embed0"
                x = nn.Conv(dim, (7, 7), strides=4, padding=3, name=name)(x)
            else:
                x = nn.Conv(dim, (3, 3), strides=2, padding=1,
                            name=f"patch_embed{i}")(x)
            x = nn.LayerNorm(name=f"embed_norm{i}")(x)
            fc1_inds = [q for q in self.moe_block_inds_fc1[i] if q < depth]
            fc2_inds = [q for q in self.moe_block_inds_fc2[i] if q < depth]
            for j in range(depth):
                x, aux = VANBlock(
                    dim=dim, mlp_ratio=self.mlp_ratios[i],
                    drop_path_rate=float(dpr[block_idx + j]),
                    moe_fc1=moe_cfg if j in fc1_inds else None,
                    moe_fc2=moe_cfg if j in fc2_inds else None,
                    name=f"stage{i}_block{j}")(x, train=train)
                if aux is not None:
                    gate_losses.append(aux)
            block_idx += depth
            if i in self.out_indices:
                outs.append(nn.LayerNorm(name=f"out_norm{i}")(x))
        gate_loss = sum(gate_losses) / len(gate_losses) \
            if gate_losses else None
        return tuple(outs), gate_loss
