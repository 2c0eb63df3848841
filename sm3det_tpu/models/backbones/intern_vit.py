"""InternViT-300M encoder + ViT-Adapter detection backbone (flax, NHWC).

Parity targets:
- ``mmrotate/models/backbones/intern_vit.py:361`` — ViT encoder with
  RMSNorm option (:30), QK-norm, windowed attention for selected blocks
  (:95), learnable pos-embed with bilinear interpolation.
- ``mmrotate/models/backbones/vit_adapter.py:24`` / ``adapter_modules.py``
  — SpatialPriorModule (conv stem producing 1/4..1/32 features) +
  injector/extractor interaction blocks built on multi-scale deformable
  attention (our jnp ``ms_deform_attn``), producing 4-scale FPN inputs.
- Consumes BabelRS-pretrained safetensors via
  ``train/checkpoint.load_torch_state_dict`` (SURVEY.md §2.7 contract).

The flash-attn path becomes ``jax.nn.dot_product_attention`` (XLA's fused
attention on TPU).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..layers import gelu as _policy_gelu

from ...ops.ms_deform_attn import ms_deform_attn


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        var = jnp.mean(x.astype(jnp.float32) ** 2, -1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * w


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qk_norm: bool = False
    use_rms: bool = False
    window: int = 0           # 0 = global attention

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int]):
        """x: (B, N, C); hw the token grid."""
        norm = RMSNorm if self.use_rms else \
            (lambda dim, name: nn.LayerNorm(epsilon=1e-6, name=name))
        b, n, c = x.shape
        h, w = hw
        hd = self.dim // self.num_heads

        ls1 = self.param("ls1", nn.initializers.constant(0.1), (c,))
        ls2 = self.param("ls2", nn.initializers.constant(0.1), (c,))

        y = norm(self.dim, name="norm1")(x)
        qkv_dense = nn.Dense(3 * self.dim, name="qkv")
        qkv = qkv_dense(y)

        if self.window > 0:
            ws = self.window
            hp = int(np.ceil(h / ws)) * ws
            wp = int(np.ceil(w / ws)) * ws
            qkv_img = qkv.reshape(b, h, w, 3 * c)
            if (hp, wp) != (h, w):
                # the reference pads the NORMED TOKENS with zeros before
                # the qkv projection (WindowedAttention, intern_vit.py:
                # 124-127), so pad rows carry qkv(0) = the qkv bias, and
                # they DO participate in window attention before the
                # crop — pad with that value, not with zeros
                pad_tok = qkv_dense(jnp.zeros((c,), qkv.dtype))
                qkv_img = jnp.pad(
                    qkv_img - pad_tok,
                    ((0, 0), (0, hp - h), (0, wp - w), (0, 0))) + pad_tok
            qkv_w = qkv_img.reshape(b, hp // ws, ws, wp // ws, ws, 3 * c)
            qkv_w = qkv_w.transpose(0, 1, 3, 2, 4, 5).reshape(
                -1, ws * ws, 3 * c)
            att = self._attn(qkv_w, hd)
            att = att.reshape(b, hp // ws, wp // ws, ws, ws, c)
            att = att.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
            att = att[:, :h, :w].reshape(b, n, c)
        else:
            att = self._attn(qkv, hd)
        x = x + ls1 * nn.Dense(self.dim, name="proj")(att)

        y = norm(self.dim, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(y)
        y = _policy_gelu(y)
        y = nn.Dense(self.dim, name="fc2")(y)
        return x + ls2 * y

    def _attn(self, qkv, hd):
        bn, n, _ = qkv.shape
        qkv = qkv.reshape(bn, n, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.qk_norm:
            # learned RMSNorm over the FLATTENED head dim — the
            # reference normalizes q/k as (B, N, C) with InternRMSNorm
            # regardless of norm_layer (intern_vit.py:190-192, :204-207),
            # NOT a per-head L2
            q = RMSNorm(self.dim, name="q_norm")(
                q.reshape(bn, n, -1)).reshape(q.shape)
            k = RMSNorm(self.dim, name="k_norm")(
                k.reshape(bn, n, -1)).reshape(k.shape)
        out = jax.nn.dot_product_attention(q, k, v)
        return out.reshape(bn, n, -1)


class SpatialPriorModule(nn.Module):
    """Conv stem producing 1/4, 1/8, 1/16, 1/32 priors
    (``adapter_modules.py`` SPM)."""

    dim: int = 64
    out_dim: int = 256

    @nn.compact
    def __call__(self, x):
        d = self.dim
        y = nn.relu(nn.GroupNorm(num_groups=1, name="gn1")(
            nn.Conv(d, (3, 3), strides=2, padding=1, name="stem1")(x)))
        y = nn.relu(nn.GroupNorm(num_groups=1, name="gn2")(
            nn.Conv(d, (3, 3), padding=1, name="stem2")(y)))
        c1 = nn.max_pool(y, (2, 2), strides=(2, 2))      # 1/4
        c2 = nn.relu(nn.GroupNorm(num_groups=1, name="gn3")(
            nn.Conv(2 * d, (3, 3), strides=2, padding=1,
                    name="conv2")(c1)))                  # 1/8
        c3 = nn.relu(nn.GroupNorm(num_groups=1, name="gn4")(
            nn.Conv(4 * d, (3, 3), strides=2, padding=1,
                    name="conv3")(c2)))                  # 1/16
        c4 = nn.relu(nn.GroupNorm(num_groups=1, name="gn5")(
            nn.Conv(4 * d, (3, 3), strides=2, padding=1,
                    name="conv4")(c3)))                  # 1/32
        c1 = nn.Conv(self.out_dim, (1, 1), name="fc1")(c1)
        c2 = nn.Conv(self.out_dim, (1, 1), name="fc2")(c2)
        c3 = nn.Conv(self.out_dim, (1, 1), name="fc3")(c3)
        c4 = nn.Conv(self.out_dim, (1, 1), name="fc4")(c4)
        return c1, c2, c3, c4


class DeformAttnModule(nn.Module):
    """Thin MSDeformAttn wrapper: query tokens attend into multi-level
    value maps at learned offsets around reference points."""

    dim: int
    num_heads: int = 8
    num_points: int = 4
    num_levels: int = 3

    @nn.compact
    def __call__(self, query, ref_points, value, value_shapes):
        """query (B, Q, C); ref_points (B, Q, 2) in [0,1];
        value (B, sumHW, C)."""
        b, q, c = query.shape
        nh, npt, nl = self.num_heads, self.num_points, self.num_levels
        hd = c // nh
        v = nn.Dense(c, name="value_proj")(value).reshape(
            value.shape[0], value.shape[1], nh, hd)
        offsets = nn.Dense(nh * nl * npt * 2,
                           kernel_init=nn.initializers.zeros,
                           name="sampling_offsets")(query)
        offsets = offsets.reshape(b, q, nh, nl, npt, 2)
        attn = nn.Dense(nh * nl * npt, name="attention_weights")(query)
        attn = jax.nn.softmax(
            attn.reshape(b, q, nh, nl * npt), -1).reshape(
                b, q, nh, nl, npt)
        # normalize offsets by each level's size
        norm = jnp.asarray([(wl, hl) for hl, wl in value_shapes],
                           jnp.float32)                 # (L, 2)
        loc = ref_points[:, :, None, None, None, :] + \
            offsets / norm[None, None, None, :, None, :]
        out = ms_deform_attn(v, value_shapes, loc, attn)
        return nn.Dense(c, name="output_proj")(out)


class InternViTAdapter(nn.Module):
    """ViT + adapter producing 4-scale detection features
    (``vit_adapter.py:24`` InternViTAdapter)."""

    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch_size: int = 16
    mlp_ratio: float = 4.0
    use_rms: bool = False
    qk_norm: bool = False
    window_blocks: Sequence[int] = ()      # indices using windowed attn
    window_size: int = 14
    interaction_indexes: Sequence[int] = (5, 11, 17, 23)
    adapter_dim: int = 256
    out_channels: Sequence[int] = (256, 256, 256, 256)
    multi_input: bool = False

    def _stem_tokens(self, x):
        """Patch embed + pos embed (``intern_vit.py:336 forward_adapter``:
        tokens = conv(x).flatten + position_embedding[:, 1:])."""
        b = x.shape[0]
        ps = self.patch_size
        stem_name = "stem_single" if self.multi_input else "patch_embed"
        tokens = nn.Conv(self.embed_dim, (ps, ps), strides=ps,
                         padding="VALID", name=stem_name)(x)
        h, w = tokens.shape[1:3]
        tokens = tokens.reshape(b, h * w, self.embed_dim)
        pos = self.param("pos_embed",
                         nn.initializers.truncated_normal(0.02),
                         (1, h * w, self.embed_dim))
        return tokens + pos, h, w

    def _block(self, i, h, w):
        return ViTBlock(
            self.embed_dim, self.num_heads, self.mlp_ratio,
            qk_norm=self.qk_norm, use_rms=self.use_rms,
            window=self.window_size if i in self.window_blocks else 0,
            name=f"block{i}")

    @nn.compact
    def __call__(self, x, train: bool = False, dataset_ids=None,
                 encoder_only: bool = False):
        """``encoder_only=True`` runs stem + pos + every ViT block and
        returns the raw tokens (no adapter interactions) — the numeric
        contract of the reference's ``InternViT.forward_encoder``
        (``intern_vit.py:577``); used by the checkpoint-ingestion oracle
        tests and expert-view tooling."""
        b, ih, iw, _ = x.shape
        tokens, h, w = self._stem_tokens(x)
        if encoder_only:
            for blk_i in range(self.depth):
                tokens = self._block(blk_i, h, w)(tokens, (h, w))
            return tokens

        # spatial priors
        c1, c2, c3, c4 = SpatialPriorModule(
            out_dim=self.adapter_dim, name="spm")(x)
        shapes = [tuple(c.shape[1:3]) for c in (c2, c3, c4)]
        spatial = jnp.concatenate(
            [c.reshape(b, -1, self.adapter_dim) for c in (c2, c3, c4)],
            axis=1)

        # reference grids
        def grid(hh, ww):
            ys = (jnp.arange(hh) + 0.5) / hh
            xs = (jnp.arange(ww) + 0.5) / ww
            gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
            return jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)

        vit_ref = jnp.broadcast_to(grid(h, w)[None], (b, h * w, 2))
        spa_ref = jnp.concatenate(
            [jnp.broadcast_to(grid(hh, ww)[None], (b, hh * ww, 2))
             for hh, ww in shapes], axis=1)

        vit_proj = nn.Dense(self.adapter_dim, name="vit_proj")
        vit_unproj = nn.Dense(self.embed_dim, name="vit_unproj")

        idx = 0
        inter = list(self.interaction_indexes)
        n_inter = len(inter)
        for blk_i in range(self.depth):
            tokens = self._block(blk_i, h, w)(tokens, (h, w))
            if idx < n_inter and blk_i == inter[idx]:
                # injector: spatial <- deform-attn over ViT tokens
                q_tok = vit_proj(tokens)
                spatial = spatial + DeformAttnModule(
                    self.adapter_dim, num_levels=1,
                    name=f"extract{idx}")(
                        spatial, spa_ref,
                        q_tok, [(h, w)])
                # extractor: ViT tokens <- deform-attn over spatial maps
                tok_upd = DeformAttnModule(
                    self.adapter_dim, num_levels=3,
                    name=f"inject{idx}")(
                        q_tok, vit_ref, spatial, shapes)
                tokens = tokens + vit_unproj(tok_upd)
                idx += 1

        # rebuild pyramid: c1 enhanced by upsampled c2-path
        s2 = spatial[:, :shapes[0][0] * shapes[0][1]].reshape(
            b, *shapes[0], self.adapter_dim)
        s3 = spatial[:, shapes[0][0] * shapes[0][1]:
                     shapes[0][0] * shapes[0][1]
                     + shapes[1][0] * shapes[1][1]].reshape(
            b, *shapes[1], self.adapter_dim)
        s4 = spatial[:, -shapes[2][0] * shapes[2][1]:].reshape(
            b, *shapes[2], self.adapter_dim)
        up2 = jnp.repeat(jnp.repeat(s2, 2, axis=1), 2, axis=2)
        up2 = up2[:, :c1.shape[1], :c1.shape[2]]
        f1 = c1 + up2
        return (f1, s2, s3, s4), None
