"""Checkpointing: orbax save/resume + torch-checkpoint ingestion.

Parity targets (SURVEY.md §5 checkpoint/resume):
- ``CheckpointHook`` + ``runner.resume()``: full state (params, optimizer,
  DLA EMAs, step, rng) via orbax, ``find_latest_checkpoint`` semantics.
- Backbone-specific pretrained loading with the **expert fan-out**: a dense
  ConvNeXt FFN checkpoint replicates its pointwise-conv weights into every
  MoE expert (``convnext_moe.py:694-705``) and the stem maps into the
  ``dataset_stems`` slot (``:856-863``).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def save_checkpoint(ckpt_dir: str, step: int, state) -> str:
    import orbax.checkpoint as ocp
    path = os.path.join(os.path.abspath(ckpt_dir), f"iter_{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)   # overwrite like CheckpointHook
    ckptr.wait_until_finished()
    return path


def find_latest_checkpoint(work_dir: str) -> Optional[str]:
    """``mmrotate/utils/misc.py:7`` semantics on orbax dirs."""
    if not os.path.isdir(work_dir):
        return None
    best, best_iter = None, -1
    for name in os.listdir(work_dir):
        m = re.fullmatch(r"iter_(\d+)", name)
        if m and int(m.group(1)) > best_iter:
            best_iter = int(m.group(1))
            best = os.path.join(work_dir, name)
    return best


def load_checkpoint(path: str, target_state):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=target_state)


def load_params(path: str, target_params):
    """Params-only restore for eval/demo CLIs: restores the full saved
    tree target-free, extracts ``params``, then validates structure and
    casts dtypes against ``target_params`` so sharding/dtype mismatches
    surface as a clear error instead of a cryptic orbax one (the
    reference's weights-only ``load_checkpoint``,
    ``mmcv/mmcv/runner/checkpoint.py``)."""
    import orbax.checkpoint as ocp
    restored = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    p = restored.get("params", restored) if isinstance(restored, dict) \
        else restored
    tgt_leaves, tgt_def = jax.tree_util.tree_flatten(target_params)
    got_leaves, got_def = jax.tree_util.tree_flatten(p)
    if tgt_def != got_def:
        raise ValueError(
            f"checkpoint {path} params tree does not match the model: "
            f"expected {tgt_def}, got {got_def}")
    out = []
    for t, g in zip(tgt_leaves, got_leaves):
        g = np.asarray(g)
        if tuple(g.shape) != tuple(np.shape(t)):
            raise ValueError(
                f"checkpoint {path}: leaf shape {g.shape} != model "
                f"{np.shape(t)}")
        out.append(g.astype(getattr(t, "dtype", g.dtype), copy=False))
    return jax.tree_util.tree_unflatten(tgt_def, out)


# ---------------------------------------------------------------------------
# torch -> JAX parameter ingestion
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch ``.pth`` (or safetensors) into numpy arrays."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return load_file(path)
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def convnext_torch_to_jax(sd: Dict[str, np.ndarray], params: Dict,
                          num_experts: int = 0,
                          prefix: str = "backbone.") -> Dict:
    """Map an mm-style ConvNeXt checkpoint onto our backbone params,
    replicating dense FFN weights into every expert and routing the stem
    into the shared 'single' stem (the reference's ``init_weights`` fan-out,
    ``convnext_moe.py:660-727,824-899``).

    Conventions: torch convs are (O, I, kh, kw) -> flax (kh, kw, I, O);
    linear (O, I) -> (I, O); depthwise (C, 1, kh, kw) -> (kh, kw, 1, C).
    """
    import copy
    out = copy.deepcopy(params)
    bb = out["backbone"] if "backbone" in out else out

    def tconv(w):
        return np.transpose(w, (2, 3, 1, 0))

    def tdw(w):
        return np.transpose(w, (2, 3, 1, 0))

    def get(key):
        return sd.get(prefix + key, sd.get(key))

    # stem. Two source layouts: the plain model keeps
    # (conv, LN) under downsample_layers.0 while the MultiInput variant
    # moves the conv into dataset_stems['single'] and leaves only the LN
    # in downsample_layers.0 (``convnext_moe.py:783-792``).
    stem_name = "stem_single" if "stem_single" in bb else "stem_conv"
    w = get("dataset_stems.single.weight")
    if w is not None:
        bb[stem_name]["kernel"] = tconv(w)
        bb[stem_name]["bias"] = get("dataset_stems.single.bias")
        bb["stem_norm"]["scale"] = get("downsample_layers.0.0.weight")
        bb["stem_norm"]["bias"] = get("downsample_layers.0.0.bias")
    else:
        w = get("downsample_layers.0.0.weight")
        if w is not None:
            bb[stem_name]["kernel"] = tconv(w)
            bb[stem_name]["bias"] = get("downsample_layers.0.0.bias")
            bb["stem_norm"]["scale"] = get("downsample_layers.0.1.weight")
            bb["stem_norm"]["bias"] = get("downsample_layers.0.1.bias")

    # downsample layers 1..3
    for i in range(1, 4):
        wn = get(f"downsample_layers.{i}.0.weight")
        if wn is None:
            continue
        bb[f"downsample_norm{i}"]["scale"] = wn
        bb[f"downsample_norm{i}"]["bias"] = get(
            f"downsample_layers.{i}.0.bias")
        bb[f"downsample_conv{i}"]["kernel"] = tconv(
            get(f"downsample_layers.{i}.1.weight"))
        bb[f"downsample_conv{i}"]["bias"] = get(
            f"downsample_layers.{i}.1.bias")

    # stages
    for key in list(bb.keys()):
        m = re.fullmatch(r"stage(\d+)_block(\d+)", key)
        if not m:
            continue
        si, bi = int(m.group(1)), int(m.group(2))
        tp = f"stages.{si}.{bi}."
        blk = bb[key]
        if get(tp + "depthwise_conv.weight") is None:
            continue
        blk["dwconv"]["kernel"] = tdw(get(tp + "depthwise_conv.weight"))
        blk["dwconv"]["bias"] = get(tp + "depthwise_conv.bias")
        blk["norm"]["scale"] = get(tp + "norm.weight")
        blk["norm"]["bias"] = get(tp + "norm.bias")
        if "gamma" in blk and get(tp + "gamma") is not None:
            blk["gamma"] = get(tp + "gamma")
        w1 = get(tp + "ffn.pointwise_conv1.weight")
        b1 = get(tp + "ffn.pointwise_conv1.bias")
        w2 = get(tp + "ffn.pointwise_conv2.weight")
        b2 = get(tp + "ffn.pointwise_conv2.bias")
        moe_w1 = get(tp + "ffn.experts.0.pointwise_conv1.weight")
        if w1 is None and moe_w1 is None:
            continue
        if "ffn" in blk and "experts" in blk["ffn"]:
            ex = blk["ffn"]["experts"]
            e = ex["w1"].shape[0]
            if moe_w1 is not None:
                # trained-MoE checkpoint: stack the per-expert FFNs
                # (source layout ``MoE_layer.experts`` ModuleList,
                # ``convnext_moe.py:119-126``)
                ex["w1"] = np.stack([
                    get(tp + f"ffn.experts.{i}.pointwise_conv1.weight").T
                    for i in range(e)])         # (E, d, h)
                ex["b1"] = np.stack([
                    get(tp + f"ffn.experts.{i}.pointwise_conv1.bias")
                    for i in range(e)])
                ex["w2"] = np.stack([
                    get(tp + f"ffn.experts.{i}.pointwise_conv2.weight").T
                    for i in range(e)])
                ex["b2"] = np.stack([
                    get(tp + f"ffn.experts.{i}.pointwise_conv2.bias")
                    for i in range(e)])
            else:
                # dense checkpoint: replicate the FFN into every expert
                # (the reference init_weights fan-out,
                # ``convnext_moe.py:694-705``)
                ex["w1"] = np.repeat(w1.T[None], e, axis=0)  # (E, d, h)
                ex["b1"] = np.repeat(b1[None], e, axis=0)
                ex["w2"] = np.repeat(w2.T[None], e, axis=0)
                ex["b2"] = np.repeat(b2[None], e, axis=0)
            # gate weights (only present in trained-MoE checkpoints)
            lin_gate = get(tp + "ffn.w_gate")
            cos_sim = get(tp + "ffn.w_gate.sim_matrix")
            if lin_gate is not None and "w_gate" in blk["ffn"] and \
                    not isinstance(blk["ffn"]["w_gate"], dict):
                blk["ffn"]["w_gate"] = lin_gate              # (d, E)
            elif cos_sim is not None and isinstance(
                    blk["ffn"].get("w_gate"), dict):
                g = blk["ffn"]["w_gate"]
                g["sim_matrix"] = cos_sim
                g["temperature"] = get(tp + "ffn.w_gate.temperature")
                g["cosine_projector"]["kernel"] = get(
                    tp + "ffn.w_gate.cosine_projector.weight").T
                g["cosine_projector"]["bias"] = get(
                    tp + "ffn.w_gate.cosine_projector.bias")
            wn = get(tp + "ffn.w_noise")
            if wn is not None and "w_noise" in blk["ffn"]:
                blk["ffn"]["w_noise"] = wn
        else:
            blk["pwconv1"]["kernel"] = w1.T
            blk["pwconv1"]["bias"] = b1
            blk["pwconv2"]["kernel"] = w2.T
            blk["pwconv2"]["bias"] = b2

    # out norms
    for i in range(4):
        wn = get(f"norm{i}.weight")
        if wn is not None and f"out_norm{i}" in bb:
            bb[f"out_norm{i}"]["scale"] = wn
            bb[f"out_norm{i}"]["bias"] = get(f"norm{i}.bias")
    return out


def internvit_torch_to_jax(sd: Dict[str, np.ndarray], params: Dict,
                           prefix: str = "vision_model.") -> Dict:
    """Map an InternViT (HF ``modeling_intern_vit``) safetensors checkpoint
    onto our :class:`InternViTAdapter` encoder params — the BabelRS
    checkpoint-ingestion contract (SURVEY.md §2.7): patch embed, pos-embed
    (interpolated bilinearly to the target grid like
    ``mmcv_custom/checkpoint_beit.py``), per-block qkv/proj/mlp/norms and
    layer scales. Adapter modules stay at init (they are new parameters,
    as in the reference's fine-tuning)."""
    import copy
    out = copy.deepcopy(params)
    bb = out["backbone"] if "backbone" in out else out

    def get(key):
        return sd.get(prefix + key, sd.get(key))

    w = get("embeddings.patch_embedding.weight")
    if w is not None:
        stem = "stem_single" if "stem_single" in bb else "patch_embed"
        bb[stem]["kernel"] = np.transpose(w, (2, 3, 1, 0))
        bb[stem]["bias"] = get("embeddings.patch_embedding.bias")

    pe = get("embeddings.position_embedding")
    if pe is not None and "pos_embed" in bb:
        # drop cls token if present, resize to the target grid — BICUBIC
        # like the reference (checkpoint_beit.py:471-474 and
        # intern_vit.py _get_pos_embed use F.interpolate bicubic,
        # align_corners=False); numpy-bilinear fallback without torch
        tgt = bb["pos_embed"].shape[1]
        src = np.asarray(pe[0])
        if src.shape[0] == tgt + 1:
            src = src[1:]
        elif src.shape[0] != tgt:
            # HF format keeps the cls token at row 0 (the reference
            # interpolates position_embedding[:, 1:], intern_vit.py:353)
            side = int(np.sqrt(src.shape[0] - 1))
            if side * side == src.shape[0] - 1:
                src = src[1:]
        if src.shape[0] != tgt:
            side_s = int(np.sqrt(src.shape[0]))
            side_t = int(np.sqrt(tgt))
            grid = src.reshape(side_s, side_s, -1)
            try:
                import torch
                import torch.nn.functional as F
                t = torch.from_numpy(
                    np.ascontiguousarray(grid)).permute(2, 0, 1)[None]
                t = F.interpolate(t.float(), size=(side_t, side_t),
                                  mode="bicubic", align_corners=False)
                grid = t[0].permute(1, 2, 0).numpy().astype(src.dtype)
            except ImportError:
                from ..data.transforms import _resize_bilinear
                grid = _resize_bilinear(grid, side_t, side_t)
            src = grid.reshape(side_t * side_t, -1)
        bb["pos_embed"] = src[None]

    i = 0
    while f"block{i}" in bb:
        blk = bb[f"block{i}"]
        tp = f"encoder.layers.{i}."
        if get(tp + "attn.qkv.weight") is None:
            break
        blk["qkv"]["kernel"] = get(tp + "attn.qkv.weight").T
        if get(tp + "attn.qkv.bias") is not None:
            blk["qkv"]["bias"] = get(tp + "attn.qkv.bias")
        blk["proj"]["kernel"] = get(tp + "attn.proj.weight").T
        blk["proj"]["bias"] = get(tp + "attn.proj.bias")
        # QK-normalization weights (InternRMSNorm over the flattened
        # head dim, intern_vit.py:190-192)
        for qk in ("q_norm", "k_norm"):
            wq = get(tp + f"attn.{qk}.weight")
            if wq is not None and qk in blk:
                blk[qk]["weight"] = wq
        blk["fc1"]["kernel"] = get(tp + "mlp.fc1.weight").T
        blk["fc1"]["bias"] = get(tp + "mlp.fc1.bias")
        blk["fc2"]["kernel"] = get(tp + "mlp.fc2.weight").T
        blk["fc2"]["bias"] = get(tp + "mlp.fc2.bias")
        for norm, ref in (("norm1", "norm1"), ("norm2", "norm2")):
            wn = get(tp + ref + ".weight")
            if wn is None:
                continue
            if "weight" in blk[norm]:          # RMSNorm
                blk[norm]["weight"] = wn
            else:
                blk[norm]["scale"] = wn
                bn = get(tp + ref + ".bias")
                if bn is not None:
                    blk[norm]["bias"] = bn
        for ls in ("ls1", "ls2"):
            v = get(tp + ls)
            if v is not None:
                blk[ls] = v
        i += 1
    return out


def rpn_head_torch_to_jax(sd: Dict[str, np.ndarray], params: Dict,
                          prefix: str = "") -> Dict:
    """Ingest a reference (Oriented)RPNHead state dict
    (``mmrotate/models/dense_heads/oriented_rpn_head.py:18-24``:
    ``rpn_conv`` 3x3 + ``rpn_cls``/``rpn_reg`` 1x1) into our flax
    OrientedRPNHead params. Torch convs (O, I, kh, kw) -> flax
    (kh, kw, I, O)."""
    import copy
    out = copy.deepcopy(params)

    def tconv(w):
        return np.transpose(w, (2, 3, 1, 0))

    for name in ("rpn_conv", "rpn_cls", "rpn_reg"):
        out[name]["kernel"] = tconv(sd[prefix + name + ".weight"])
        out[name]["bias"] = np.asarray(sd[prefix + name + ".bias"])
    return out


def shared2fc_head_torch_to_jax(sd: Dict[str, np.ndarray], params: Dict,
                                roi_size: int = 7,
                                prefix: str = "") -> Dict:
    """Ingest a reference RotatedShared2FCBBoxHead state dict
    (``mmrotate/models/roi_heads/bbox_heads/convfc_rbbox_head.py:210``)
    into our flax RotatedShared2FCBBoxHead.

    The first shared fc consumes the flattened RoI feature: torch
    flattens NCHW -> (C, h, w) order while our NHWC head flattens
    (h, w, C), so its weight is permuted accordingly; the remaining
    linears are plain transposes.
    """
    import copy
    out = copy.deepcopy(params)
    w0 = np.asarray(sd[prefix + "shared_fcs.0.weight"])    # (out, C*s*s)
    n_out = w0.shape[0]
    c = w0.shape[1] // (roi_size * roi_size)
    w0 = w0.reshape(n_out, c, roi_size, roi_size)
    w0 = np.transpose(w0, (2, 3, 1, 0)).reshape(
        roi_size * roi_size * c, n_out)
    out["shared_fc0"]["kernel"] = w0
    out["shared_fc0"]["bias"] = np.asarray(sd[prefix + "shared_fcs.0.bias"])
    out["shared_fc1"]["kernel"] = np.asarray(
        sd[prefix + "shared_fcs.1.weight"]).T
    out["shared_fc1"]["bias"] = np.asarray(sd[prefix + "shared_fcs.1.bias"])
    out["fc_cls"]["kernel"] = np.asarray(sd[prefix + "fc_cls.weight"]).T
    out["fc_cls"]["bias"] = np.asarray(sd[prefix + "fc_cls.bias"])
    out["fc_reg"]["kernel"] = np.asarray(sd[prefix + "fc_reg.weight"]).T
    out["fc_reg"]["bias"] = np.asarray(sd[prefix + "fc_reg.bias"])
    return out
