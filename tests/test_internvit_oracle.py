"""InternViT checkpoint-ingestion oracle (VERDICT r3 item 5).

A tiny HF-format InternViT state dict (exact key schema of
``modeling_intern_vit`` / the reference's ``intern_vit.py`` classes) is
ingested through ``internvit_torch_to_jax`` and the encoder token path is
asserted to match the reference's pure-torch
``InternVisionEmbeddings`` + ``InternVisionEncoderLayer`` stack executed
as an oracle — including RMSNorm, learned QK-normalization, a WINDOWED
block with non-divisible padding, layer scales, and a pos-embed
grid-size change (bicubic interpolation, ``_get_pos_embed``
``intern_vit.py:329-335``).
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from reference_torch import load_reference_source  # noqa: E402

REF_VIT = "/root/reference/mmrotate/models/backbones/intern_vit.py"


@pytest.fixture(scope="module")
def ref_vit():
    def mod(name):
        m = sys.modules.get(name)
        if m is None:
            m = types.ModuleType(name)
            sys.modules[name] = m
        return m

    class _Reg:
        @staticmethod
        def register_module(*a, **k):
            return lambda c: c

    mod("mmdet.models.builder").BACKBONES = _Reg()
    mod("mmdet.models").builder = sys.modules["mmdet.models.builder"]
    mod("mmdet.utils").get_root_logger = lambda *a, **k: None
    tl = mod("timm.models.layers")
    tl.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)
    return load_reference_source(REF_VIT, "ref_intern_vit")


E, H, DEPTH, PS = 32, 4, 3, 16
CKPT_GRID = 7          # checkpoint trained at 112px -> 7x7 (+cls)
IMG = 96               # model runs at 96px -> 6x6 grid (interp needed),
#                        window 4 on a 6x6 grid -> non-divisible padding


def make_hf_sd(seed=0):
    rng = np.random.RandomState(seed)

    def t(*shape, scale=0.5):
        return rng.normal(0, scale, shape).astype(np.float32)

    sd = {
        "vision_model.embeddings.patch_embedding.weight": t(E, 3, PS, PS,
                                                            scale=0.2),
        "vision_model.embeddings.patch_embedding.bias": t(E),
        "vision_model.embeddings.position_embedding":
            t(1, CKPT_GRID * CKPT_GRID + 1, E),
    }
    for i in range(DEPTH):
        p = f"vision_model.encoder.layers.{i}."
        sd[p + "attn.qkv.weight"] = t(3 * E, E, scale=0.2)
        sd[p + "attn.qkv.bias"] = t(3 * E, scale=0.1)
        sd[p + "attn.q_norm.weight"] = 1.0 + t(E, scale=0.1)
        sd[p + "attn.k_norm.weight"] = 1.0 + t(E, scale=0.1)
        sd[p + "attn.proj.weight"] = t(E, E, scale=0.2)
        sd[p + "attn.proj.bias"] = t(E, scale=0.1)
        sd[p + "norm1.weight"] = 1.0 + t(E, scale=0.1)
        sd[p + "norm2.weight"] = 1.0 + t(E, scale=0.1)
        sd[p + "mlp.fc1.weight"] = t(4 * E, E, scale=0.2)
        sd[p + "mlp.fc1.bias"] = t(4 * E, scale=0.1)
        sd[p + "mlp.fc2.weight"] = t(E, 4 * E, scale=0.2)
        sd[p + "mlp.fc2.bias"] = t(E, scale=0.1)
        sd[p + "ls1"] = t(E, scale=0.2)
        sd[p + "ls2"] = t(E, scale=0.2)
    return sd


def ref_encode(ref, sd, x_nchw, windowed_idx=(1,), window_size=4):
    """Reference token path: patch embed + bicubic-interpolated pos
    embed (forward_adapter convention, cls dropped) + encoder layers."""
    import torch.nn as nn
    emb = ref.InternVisionEmbeddings(img_size=CKPT_GRID * PS,
                                     patch_size=PS, embed_dim=E)
    with torch.no_grad():
        emb.patch_embedding.weight.copy_(torch.tensor(
            sd["vision_model.embeddings.patch_embedding.weight"]))
        emb.patch_embedding.bias.copy_(torch.tensor(
            sd["vision_model.embeddings.patch_embedding.bias"]))
        emb.position_embedding.copy_(torch.tensor(
            sd["vision_model.embeddings.position_embedding"]))

    layers = []
    for i in range(DEPTH):
        layer = ref.InternVisionEncoderLayer(
            dim=E, num_heads=H, mlp_ratio=4.0, qkv_bias=True,
            init_values=0.1, norm_layer=ref.InternRMSNorm,
            qk_normalization=True, windowed=(i in windowed_idx),
            window_size=window_size)
        p = f"vision_model.encoder.layers.{i}."
        with torch.no_grad():
            layer.attn.qkv.weight.copy_(
                torch.tensor(sd[p + "attn.qkv.weight"]))
            layer.attn.qkv.bias.copy_(
                torch.tensor(sd[p + "attn.qkv.bias"]))
            layer.attn.q_norm.weight.copy_(
                torch.tensor(sd[p + "attn.q_norm.weight"]))
            layer.attn.k_norm.weight.copy_(
                torch.tensor(sd[p + "attn.k_norm.weight"]))
            layer.attn.proj.weight.copy_(
                torch.tensor(sd[p + "attn.proj.weight"]))
            layer.attn.proj.bias.copy_(
                torch.tensor(sd[p + "attn.proj.bias"]))
            layer.norm1.weight.copy_(torch.tensor(sd[p + "norm1.weight"]))
            layer.norm2.weight.copy_(torch.tensor(sd[p + "norm2.weight"]))
            layer.mlp.fc1.weight.copy_(
                torch.tensor(sd[p + "mlp.fc1.weight"]))
            layer.mlp.fc1.bias.copy_(torch.tensor(sd[p + "mlp.fc1.bias"]))
            layer.mlp.fc2.weight.copy_(
                torch.tensor(sd[p + "mlp.fc2.weight"]))
            layer.mlp.fc2.bias.copy_(torch.tensor(sd[p + "mlp.fc2.bias"]))
            layer.ls1.copy_(torch.tensor(sd[p + "ls1"]))
            layer.ls2.copy_(torch.tensor(sd[p + "ls2"]))
        layer.eval()
        layers.append(layer)

    with torch.no_grad():
        pe = emb.patch_embedding(torch.tensor(x_nchw))
        _, _, hh, ww = pe.shape
        tokens = pe.flatten(2).transpose(1, 2)
        pos = emb._get_pos_embed(
            emb.position_embedding[:, 1:, :], hh, ww)
        tokens = tokens + pos
        for layer in layers:
            tokens = layer(tokens, hh, ww)
    return tokens.numpy(), (hh, ww)


def test_internvit_ingestion_encoder_parity(ref_vit):
    from sm3det_tpu.models.backbones.intern_vit import InternViTAdapter
    from sm3det_tpu.train.checkpoint import internvit_torch_to_jax

    sd = make_hf_sd()
    rng = np.random.RandomState(3)
    x = rng.normal(0, 1, (2, IMG, IMG, 3)).astype(np.float32)

    model = InternViTAdapter(
        embed_dim=E, depth=DEPTH, num_heads=H, patch_size=PS,
        mlp_ratio=4.0, use_rms=True, qk_norm=True,
        window_blocks=(1,), window_size=4,
        interaction_indexes=(0, 2), adapter_dim=16,
        out_channels=(16, 16, 16, 16))
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = internvit_torch_to_jax(sd, variables["params"])

    ours = np.asarray(jax.jit(
        lambda p, xx: model.apply({"params": p}, xx, encoder_only=True)
    )(params, jnp.asarray(x)))

    ref_tokens, (hh, ww) = ref_encode(
        ref_vit, sd, np.transpose(x, (0, 3, 1, 2)))
    assert ours.shape == ref_tokens.shape == (2, hh * ww, E)
    # grid is 6x6: pos-embed interpolation 7->6 exercised; window 4 on a
    # 6x6 grid exercises the padded windowed path
    np.testing.assert_allclose(ours, ref_tokens, rtol=2e-3, atol=2e-3)


def test_internvit_ingestion_pos_embed_identity_grid(ref_vit):
    """No interpolation when the checkpoint grid matches: the ingested
    pos_embed must equal the checkpoint rows with the cls token dropped
    (mmcv_custom/checkpoint_beit.py contract)."""
    from sm3det_tpu.models.backbones.intern_vit import InternViTAdapter
    from sm3det_tpu.train.checkpoint import internvit_torch_to_jax
    sd = make_hf_sd(seed=5)
    model = InternViTAdapter(
        embed_dim=E, depth=DEPTH, num_heads=H, patch_size=PS,
        use_rms=True, qk_norm=True, interaction_indexes=(0,),
        adapter_dim=16, out_channels=(16, 16, 16, 16))
    x0 = jnp.zeros((1, CKPT_GRID * PS, CKPT_GRID * PS, 3))
    variables = model.init(jax.random.PRNGKey(0), x0)
    params = internvit_torch_to_jax(sd, variables["params"])
    np.testing.assert_array_equal(
        np.asarray(params["pos_embed"]),
        sd["vision_model.embeddings.position_embedding"][:, 1:])
