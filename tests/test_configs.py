"""Config-corpus regression: every shipped config parses and resolves
(_base_ inheritance, _delete_) — the reference uses its config corpus as
a build-everything regression surface (SURVEY.md §4)."""

import glob
import os

import pytest

from sm3det_tpu.utils.config import Config

ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")
CONFIGS = [p for p in glob.glob(os.path.join(ROOT, "**", "*.py"),
                                recursive=True)
           if "_base_" not in os.path.basename(os.path.dirname(p))
           or True]


@pytest.mark.parametrize("path", sorted(
    p for p in CONFIGS if "_base_" not in p))
def test_config_parses(path):
    cfg = Config.fromfile(path)
    assert cfg.to_dict()
    # every experiment config must resolve a model with a backbone
    if "model" in cfg:
        assert "backbone" in cfg.model
        assert "type" in cfg.model


def test_delete_semantics():
    base = {"model": {"backbone": {"a": 1, "b": 2}}}
    new = {"model": {"backbone": {"_delete_": True, "c": 3}}}
    from sm3det_tpu.utils.config import merge_dict
    out = merge_dict(base, new)
    assert out["model"]["backbone"] == {"c": 3}


@pytest.mark.parametrize("path", sorted(
    glob.glob(os.path.join(ROOT, "local_configs", "*.py"))))
def test_local_config_builds_detector(path):
    """Every experiment config resolves to a registered detector class
    and instantiates the flax module (the reference's print_config-style
    build-everything regression, SURVEY.md §4)."""
    from sm3det_tpu.models import DETECTORS, normalize_model_cfg
    from sm3det_tpu.models.detectors.trisource_variants import \
        TriSourceVariant
    cfg = Config.fromfile(path)
    mc = normalize_model_cfg(cfg.model.to_dict())
    mtype = mc.pop("type")
    cls = DETECTORS.get(mtype)
    assert cls is not None, f"{mtype} not registered"
    mc["backbone"].pop("pretrained", None)
    for key in ("moe_block_inds", "moe_block_inds_fc1"):
        if key in mc["backbone"]:
            mc["backbone"][key] = tuple(
                tuple(x) for x in mc["backbone"][key])
    if cls is TriSourceVariant:
        m = cls(cfg=mc, sar_stages=mc.get("sar_stages", 1),
                rot_stages=mc.get("rot_stages", 2))
    else:
        m = cls(cfg=mc)
    assert m is not None


def test_normalize_model_cfg_kfiou_translation():
    """KFIoU* head types select the kfiou loss family even when the
    config carries no explicit reg_loss key (reference parity:
    ``kfiou_rotate_retina_head.py`` selects the loss by class)."""
    from sm3det_tpu.models import normalize_model_cfg
    mc = {"type": "RotatedRetinaNet",
          "bbox_head": {"type": "KFIoURRetinaHead"}}
    assert normalize_model_cfg(mc)["reg_loss"] == "kfiou"
    mc = {"type": "S2ANet",
          "bbox_head": {"type": "RotatedRetinaHead"},
          "refine_head": {"type": "KFIoUODMRefineHead"}}
    out = normalize_model_cfg(mc)
    assert out["refine_reg_loss"] == "kfiou"
    assert "reg_loss" not in out
    # explicit keys win
    mc = {"bbox_head": {"type": "KFIoURRetinaHead"}, "reg_loss": "gwd"}
    assert normalize_model_cfg(mc)["reg_loss"] == "gwd"
