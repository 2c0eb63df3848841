"""Swin Transformer (+MoE FFN) backbone, flax NHWC.

Parity target: ``mmrotate/models/backbones/swin_moe.py`` (plain
``swin.py``): 4-stage Swin with 7x7 window attention, shifted windows,
relative position bias, patch merging, and the grid MoE replacing the FFN
of selected blocks (``swin_moe.py:102,710-770``).

TPU notes: window partition is reshape/transpose-only (no gathers); the
attention mask for shifted windows is precomputed per stage as a static
constant.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..layers import DropPath, gelu as _policy_gelu
from ..moe import MoELayer

ARCHS = {
    "tiny": {"depths": (2, 2, 6, 2), "dims": (96, 192, 384, 768),
             "heads": (3, 6, 12, 24)},
    "small": {"depths": (2, 2, 18, 2), "dims": (96, 192, 384, 768),
              "heads": (3, 6, 12, 24)},
    "base": {"depths": (2, 2, 18, 2), "dims": (128, 256, 512, 1024),
             "heads": (4, 8, 16, 32)},
}


def window_partition(x, ws: int):
    """(B, H, W, C) -> (B*nH*nW, ws, ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)


def window_reverse(wins, ws: int, h: int, w: int):
    b = wins.shape[0] // ((h // ws) * (w // ws))
    x = wins.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(
        np.arange(ws), np.arange(ws), indexing="ij"))   # (2, ws, ws)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]           # (2, N, N)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(nW, N, N) additive mask for shifted-window attention."""
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift),
                    slice(-shift, None)):
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    m = img_mask.reshape(1, h // ws, ws, w // ws, ws, 1)
    wins = m.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (nW*B, N, C); mask: (nW, N, N) or None."""
        bn, n, c = x.shape
        ws = self.window_size
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(x)
        qkv = qkv.reshape(bn, n, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        q = q * (head_dim ** -0.5)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32)

        rpb_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, self.num_heads))
        rpi = _relative_position_index(ws)
        bias = rpb_table[rpi.reshape(-1)].reshape(
            n, n, self.num_heads).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bn // nw, nw, self.num_heads, n, n) + \
                mask[None, :, None]
            attn = attn.reshape(bn, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(bn, n, c)
        return nn.Dense(self.dim, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    moe: Optional[Dict[str, Any]] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, C)."""
        b, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        shift = self.shift if ws < min(h, w) else 0
        aux = None

        shortcut = x
        y = nn.LayerNorm(name="norm1")(x)
        # pad to window multiples (mmdet Swin pads then crops)
        hp = int(np.ceil(h / ws)) * ws
        wp = int(np.ceil(w / ws)) * ws
        if (hp, wp) != (h, w):
            y = jnp.pad(y, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        wins = window_partition(y, ws).reshape(-1, ws * ws, c)
        mask = None
        if shift > 0:
            mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
        y = WindowAttention(self.dim, self.num_heads, ws,
                            name="attn")(wins, mask)
        y = window_reverse(y.reshape(-1, ws, ws, c), ws, hp, wp)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        if (hp, wp) != (h, w):
            y = y[:, :h, :w]
        dp = DropPath(self.drop_path_rate, name="drop_path")
        x = shortcut + dp(y, deterministic=not train)

        y = nn.LayerNorm(name="norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        if self.moe is not None:
            tokens = y.reshape(-1, c)
            y2, aux = MoELayer(
                dim=self.dim, hidden=hidden,
                num_experts=self.moe["num_experts"],
                top_k=self.moe["top_k"],
                gating=self.moe.get("gating", "cosine"),
                noisy_gating=self.moe.get("noisy_gating", True),
                capacity_factor=self.moe.get("capacity_factor", 1.5),
                name="ffn")(tokens, train=train)
            y = y2.reshape(b, h, w, c)
        else:
            y = nn.Dense(hidden, name="fc1")(y)
            y = _policy_gelu(y)
            y = nn.Dense(self.dim, name="fc2")(y)
        x = x + dp(y, deterministic=not train)
        return x, aux


class SwinMoE(nn.Module):
    """Swin(-MoE) backbone (``SwinTransformer``/``swin_moe.py``)."""

    arch: str = "tiny"
    window_size: int = 7
    drop_path_rate: float = 0.0
    out_indices: Sequence[int] = (0, 1, 2, 3)
    moe_block_inds: Sequence[Sequence[int]] = ((), (), (), ())
    num_experts: int = 2
    top_k: int = 2
    gate: str = "cosine"
    noisy_gating: bool = True
    capacity_factor: float = 1.5
    multi_input: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, dataset_ids=None):
        a = ARCHS[self.arch]
        depths, dims, heads = a["depths"], a["dims"], a["heads"]
        total = sum(depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        moe_cfg = {"num_experts": self.num_experts, "top_k": self.top_k,
                   "gating": self.gate, "noisy_gating": self.noisy_gating,
                   "capacity_factor": self.capacity_factor}

        stem_name = "stem_single" if self.multi_input else "patch_embed"
        x = nn.Conv(dims[0], (4, 4), strides=4, padding="VALID",
                    name=stem_name)(x)
        x = nn.LayerNorm(name="patch_norm")(x)

        outs, gate_losses = [], []
        block_idx = 0
        for i, (depth, dim, nh) in enumerate(zip(depths, dims, heads)):
            if i > 0:
                # patch merging: 2x2 concat + LN + linear (pad odd dims)
                b, h, w, c = x.shape
                if h % 2 or w % 2:
                    x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2),
                                    (0, 0)))
                    b, h, w, c = x.shape
                x = x.reshape(b, h // 2, 2, w // 2, 2, c)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b, h // 2, w // 2, 4 * c)
                x = nn.LayerNorm(name=f"merge_norm{i}")(x)
                x = nn.Dense(dim, use_bias=False, name=f"merge_fc{i}")(x)
            moe_inds = [q for q in self.moe_block_inds[i] if q < depth]
            for j in range(depth):
                x, aux = SwinBlock(
                    dim=dim, num_heads=nh, window_size=self.window_size,
                    shift=0 if j % 2 == 0 else self.window_size // 2,
                    drop_path_rate=float(dpr[block_idx + j]),
                    moe=moe_cfg if j in moe_inds else None,
                    name=f"stage{i}_block{j}")(x, train=train)
                if aux is not None:
                    gate_losses.append(aux)
            block_idx += depth
            if i in self.out_indices:
                outs.append(nn.LayerNorm(name=f"out_norm{i}")(x))
        gate_loss = sum(gate_losses) / len(gate_losses) \
            if gate_losses else None
        return tuple(outs), gate_loss
