"""LSKNet / LSKNet-MoE backbone (flax, NHWC).

Parity target: ``mmrotate/models/backbones/lsk_moe.py`` (and plain
``lsknet.py``): Large-Selective-Kernel spatial gating (5x5 dw + 7x7
dilated-3 dw, dual 1x1 projections to C/2, avg/max spatial attention with
a 7x7 squeeze conv), BN-normed blocks with layer-scale 1e-2, overlapping
patch embeds, and MoE optionally replacing the MLP's fc1/fc2 1x1 convs
(``MoE_Block_inds_fc1/fc2``).

TPU notes: BatchNorm is replaced by LayerNorm over channels (batch-stat
sync across devices is a hidden collective; LN is the TPU-native choice
with equivalent capacity for detection backbones) — documented deviation.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..layers import DropPath, gelu as _policy_gelu
from ..moe import MoELayer


class LSKBlock(nn.Module):
    """Spatial gating unit (``lsk_moe.py:319-344``)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        d = self.dim
        attn1 = nn.Conv(d, (5, 5), padding=2, feature_group_count=d,
                        name="conv0")(x)
        attn2 = nn.Conv(d, (7, 7), padding=9, kernel_dilation=3,
                        feature_group_count=d, name="conv_spatial")(attn1)
        attn1 = nn.Conv(d // 2, (1, 1), name="conv1")(attn1)
        attn2 = nn.Conv(d // 2, (1, 1), name="conv2")(attn2)
        attn = jnp.concatenate([attn1, attn2], axis=-1)
        avg_attn = jnp.mean(attn, axis=-1, keepdims=True)
        max_attn = jnp.max(attn, axis=-1, keepdims=True)
        agg = jnp.concatenate([avg_attn, max_attn], axis=-1)
        sig = nn.sigmoid(nn.Conv(2, (7, 7), padding=3,
                                 name="conv_squeeze")(agg))
        attn = attn1 * sig[..., 0:1] + attn2 * sig[..., 1:2]
        attn = nn.Conv(d, (1, 1), name="conv")(attn)
        return x * attn


class LSKAttention(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.Conv(self.dim, (1, 1), name="proj_1")(x)
        x = _policy_gelu(x)
        x = LSKBlock(self.dim, name="spatial_gating_unit")(x)
        x = nn.Conv(self.dim, (1, 1), name="proj_2")(x)
        return x + shortcut


class ConvMlp(nn.Module):
    """1x1 -> dw3x3 -> GELU -> 1x1 MLP with optional MoE fc1/fc2
    (``lsk_moe.py:275-316``)."""

    dim: int
    hidden: int
    moe_fc1: Optional[Dict[str, Any]] = None
    moe_fc2: Optional[Dict[str, Any]] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        losses = []
        b, h, w, c = x.shape

        def run_moe(tokens, cfg, d_in, d_out, name):
            layer = MoELayer(
                dim=d_in, hidden=0, num_experts=cfg["num_experts"],
                top_k=cfg["top_k"], gating=cfg.get("gating", "cosine"),
                noisy_gating=cfg.get("noisy_gating", True),
                capacity_factor=cfg.get("capacity_factor", 1.5),
                expert_kind="linear", out_dim=d_out, name=name)
            return layer(tokens, train=train)

        if self.moe_fc1 is not None:
            y, l1 = run_moe(x.reshape(-1, c), self.moe_fc1, c,
                            self.hidden, "fc1")
            x = y.reshape(b, h, w, self.hidden)
            losses.append(l1)
        else:
            x = nn.Conv(self.hidden, (1, 1), name="fc1")(x)
        x = nn.Conv(self.hidden, (3, 3), padding=1,
                    feature_group_count=self.hidden, name="dwconv")(x)
        x = _policy_gelu(x)
        if self.moe_fc2 is not None:
            y, l2 = run_moe(x.reshape(-1, self.hidden), self.moe_fc2,
                            self.hidden, self.dim, "fc2")
            x = y.reshape(b, h, w, self.dim)
            losses.append(l2)
        else:
            x = nn.Conv(self.dim, (1, 1), name="fc2")(x)
        aux = sum(losses) / len(losses) if losses else None
        return x, aux


class LSKNetBlock(nn.Module):
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
        y = LSKAttention(self.dim, name="attn")(y)
        x = x + dp(ls1 * y, deterministic=not train)
        y = nn.LayerNorm(name="norm2")(x)
        y, aux = ConvMlp(self.dim, int(self.dim * self.mlp_ratio),
                         self.moe_fc1, self.moe_fc2, name="mlp")(
                             y, train=train)
        x = x + dp(ls2 * y, deterministic=not train)
        return x, aux


class LSKNetMoE(nn.Module):
    """LSKNet(-MoE) (``LSKNet_moe`` ``lsk_moe.py:421``, ``LSKNet_moe_
    MultiInput`` ``:601``). Default arch: T (depths [3,3,5,2],
    dims [32,64,160,256])."""

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
                # overlapping patch embed 7x7 s4 (shared 'single' stem in
                # the MultiInput variant)
                name = "stem_single" if self.multi_input else "patch_embed0"
                x = nn.Conv(dim, (7, 7), strides=4, padding=3, name=name)(x)
            else:
                x = nn.Conv(dim, (3, 3), strides=2, padding=1,
                            name=f"patch_embed{i}")(x)
            x = nn.LayerNorm(name=f"embed_norm{i}")(x)
            fc1_inds = [q for q in self.moe_block_inds_fc1[i] if q < depth]
            fc2_inds = [q for q in self.moe_block_inds_fc2[i] if q < depth]
            for j in range(depth):
                x, aux = LSKNetBlock(
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
