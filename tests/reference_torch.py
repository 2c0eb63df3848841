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
