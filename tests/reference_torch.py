"""Import the reference's pure-torch backbone as a numeric oracle.

The reference file (``/root/reference/mmrotate/models/backbones/
convnext_moe.py``) is pure torch math but imports framework shells
(timm/mmengine/mmcv registries) that are not installed in this image.
This helper stubs exactly those shells with minimal equivalents and
execs the reference source unmodified (except for the package-relative
registry import, which cannot resolve outside the mmrotate package).

Test-only infrastructure — nothing here ships in the library. The
stubs implement standard torch idioms (DropPath, GELU builder,
Module base), NOT reference logic.
"""

from __future__ import annotations

import sys
import types

REF_BACKBONES = "/root/reference/mmrotate/models/backbones"


def _install_stubs():
    import torch
    import torch.nn as nn

    def mod(name):
        m = sys.modules.get(name)
        if m is None:
            m = types.ModuleType(name)
            sys.modules[name] = m
        return m

    # timm.models.layers: DropPath + trunc_normal_
    class DropPath(nn.Module):
        def __init__(self, drop_prob: float = 0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(
                torch.full(shape, keep, device=x.device, dtype=x.dtype))
            return x / keep * mask

    timm_layers = mod("timm.models.layers")
    timm_layers.DropPath = DropPath
    timm_layers.trunc_normal_ = nn.init.trunc_normal_
    mod("timm.models").layers = timm_layers
    mod("timm").models = sys.modules["timm.models"]

    # mmengine shells
    me_model = mod("mmengine.model")
    me_model.ModuleList = nn.ModuleList
    me_model.Sequential = nn.Sequential

    class _Logger:
        @classmethod
        def get_current_instance(cls):
            return cls()

        def warn(self, *a, **k):
            pass

        info = warning = warn

    mod("mmengine.logging").MMLogger = _Logger

    class _CkptLoader:
        @staticmethod
        def load_checkpoint(path, logger=None, map_location=None):
            import torch as _t
            return _t.load(path, map_location=map_location or "cpu")

    mod("mmengine.runner.checkpoint").CheckpointLoader = _CkptLoader
    mod("mmengine.runner").checkpoint = \
        sys.modules["mmengine.runner.checkpoint"]
    mod("mmengine")

    # mmcv shells
    def build_activation_layer(cfg):
        t = dict(cfg).pop("type")
        return {"GELU": nn.GELU, "ReLU": nn.ReLU,
                "SiLU": nn.SiLU}[t]()

    def constant_init(m, val, bias=0.0):
        if hasattr(m, "weight") and m.weight is not None:
            nn.init.constant_(m.weight, val)
        if hasattr(m, "bias") and m.bias is not None:
            nn.init.constant_(m.bias, bias)

    def trunc_normal_init(m, mean=0.0, std=1.0, bias=0.0):
        if hasattr(m, "weight") and m.weight is not None:
            nn.init.trunc_normal_(m.weight, mean=mean, std=std)
        if hasattr(m, "bias") and m.bias is not None:
            nn.init.constant_(m.bias, bias)

    mmcv_cnn = mod("mmcv.cnn")
    mmcv_cnn.build_activation_layer = build_activation_layer
    mmcv_cnn.constant_init = constant_init
    mmcv_cnn.trunc_normal_init = trunc_normal_init

    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()
            self.init_cfg = init_cfg

        def init_weights(self):
            pass

    mod("mmcv.runner").BaseModule = BaseModule
    mod("mmcv")


_REGISTRY_SHIM = '''
class _RefRegistry:
    @staticmethod
    def register_module(*a, **k):
        def deco(cls):
            return cls
        return deco
ROTATED_BACKBONES = _RefRegistry()
'''


def load_reference_module(fname: str = "convnext_moe.py",
                          modname: str = "ref_convnext_moe"):
    """Exec the reference backbone source with stubbed shells; returns
    the module object (cached in sys.modules)."""
    if modname in sys.modules:
        return sys.modules[modname]
    _install_stubs()
    src = open(f"{REF_BACKBONES}/{fname}").read()
    src = src.replace("from ..builder import ROTATED_BACKBONES",
                      _REGISTRY_SHIM)
    module = types.ModuleType(modname)
    module.__file__ = f"{REF_BACKBONES}/{fname}"
    exec(compile(src, module.__file__, "exec"), module.__dict__)
    sys.modules[modname] = module
    return module


# ---------------------------------------------------------------------------
# mmdet loss-utility stubs + generic loader for any reference source file
# ---------------------------------------------------------------------------

def _install_mmdet_loss_stubs():
    """Faithful stand-ins for mmdet's loss weighting utilities
    (``mmdet/models/losses/utils.py`` — standard public idioms, not
    reference-specific logic): ``weighted_loss`` applies elementwise
    weight, then reduction or sum/avg_factor."""
    import functools

    import torch

    def mod(name):
        m = sys.modules.get(name)
        if m is None:
            m = types.ModuleType(name)
            sys.modules[name] = m
        return m

    def reduce_loss(loss, reduction):
        if reduction == "none":
            return loss
        if reduction == "mean":
            return loss.mean()
        if reduction == "sum":
            return loss.sum()
        raise ValueError(reduction)

    def weight_reduce_loss(loss, weight=None, reduction="mean",
                           avg_factor=None):
        if weight is not None:
            loss = loss * weight
        if avg_factor is None:
            return reduce_loss(loss, reduction)
        if reduction == "mean":
            return loss.sum() / avg_factor
        if reduction != "none":
            raise ValueError("avg_factor incompatible with sum")
        return loss

    def weighted_loss(loss_func):
        @functools.wraps(loss_func)
        def wrapper(pred, target, weight=None, reduction="mean",
                    avg_factor=None, **kwargs):
            loss = loss_func(pred, target, **kwargs)
            return weight_reduce_loss(loss, weight, reduction, avg_factor)
        return wrapper

    lu = mod("mmdet.models.losses.utils")
    lu.weighted_loss = weighted_loss
    lu.weight_reduce_loss = weight_reduce_loss
    lu.reduce_loss = reduce_loss
    mod("mmdet.models.losses").utils = lu
    mm = mod("mmdet.models")
    mm.losses = sys.modules["mmdet.models.losses"]
    mm.weight_reduce_loss = weight_reduce_loss

    def accuracy(pred, target, topk=1):
        return torch.zeros(())

    mm.losses.accuracy = accuracy
    mm.accuracy = accuracy
    mod("mmdet")


_GENERIC_REGISTRY_SHIM = '''
class _RefRegistry:
    @staticmethod
    def register_module(*a, **k):
        def deco(cls):
            return cls
        return deco
ROTATED_LOSSES = _RefRegistry()
ROTATED_HEADS = _RefRegistry()
ROTATED_BBOX_CODERS = _RefRegistry()
BBOX_CODERS = _RefRegistry()
ROTATED_ROI_EXTRACTORS = _RefRegistry()
ROTATED_DATASETS = _RefRegistry()

def build_loss(cfg):
    raise NotImplementedError("stub: inject losses directly in tests")
'''


def load_reference_source(path: str, modname: str,
                          replacements: dict | None = None):
    """Exec an arbitrary reference source file with the framework shells
    stubbed. ``replacements`` maps exact source substrings (usually the
    package-relative imports that cannot resolve) to substitutes; the
    ``from ..builder import ...`` registry imports are always shimmed."""
    if modname in sys.modules:
        return sys.modules[modname]
    _install_stubs()
    _install_mmdet_loss_stubs()
    src = open(path).read()
    import re
    src = re.sub(r"from (?:\.|\.\.|\.\.\.)+builder import [A-Za-z_, ]+",
                 "pass", src)
    src = _GENERIC_REGISTRY_SHIM + "\n" + src
    for old, new in (replacements or {}).items():
        src = src.replace(old, new)
    module = types.ModuleType(modname)
    module.__file__ = path
    exec(compile(src, path, "exec"), module.__dict__)
    sys.modules[modname] = module
    return module


def load_reference_loss(fname: str):
    """Load ``/root/reference/mmrotate/models/losses/<fname>`` as an
    oracle module (pure torch after the registry/utility shims)."""
    return load_reference_source(
        f"/root/reference/mmrotate/models/losses/{fname}",
        "ref_loss_" + fname.replace(".py", ""))
