"""Model registry population: every backbone/neck/head/detector is
registered by its reference type name so config files build through
``build_from_cfg`` (mmrotate ``ROTATED_*`` registry parity)."""

from ..utils.registry import (BACKBONES, DETECTORS, HEADS, NECKS,
                              build_from_cfg)
from .backbones.convnext import ConvNeXtMoE
from .backbones.lsknet import LSKNetMoE
from .backbones.van import VANMoE
from .backbones.swin import SwinMoE
from .backbones.intern_vit import InternViTAdapter
from .backbones.re_resnet import ReResNet
from .necks.fpn import FPN, MultitaskFPN
from .dense_heads.gfl_head import GFLHead
from .dense_heads.oriented_rpn_head import OrientedRPNHead
from .dense_heads.rotated_retina_head import RotatedRetinaHead
from .dense_heads.rotated_fcos_head import RotatedFCOSHead
from .dense_heads.oriented_reppoints_head import OrientedRepPointsHead
from .dense_heads.rpn_head import RPNHead
from .roi_heads.oriented_roi_head import RotatedShared2FCBBoxHead
from .roi_heads.standard_roi_head import Shared2FCBBoxHead
from .roi_heads.cascade_heads import GVBBoxHead, HBB2OBBBBoxHead
from .detectors.trisource import TriSourceDetector
from .detectors.trisource_variants import TriSourceVariant
from .detectors.zoo import GFLDetector, OrientedRCNN, RotatedRetinaNet
from .detectors.refine_detectors import R3Det, S2ANet
from .detectors.redet_roitrans import ReDet, RoITransformer
from .detectors.single_stage_zoo import (GlidingVertex, OrientedRepPoints,
                                         RotatedFCOS)
from .dense_heads.rotated_atss_head import RotatedATSSHead
from .dense_heads.reppoints_variants import (RotatedRepPointsHead,
                                             SAMRepPointsHead)
from .detectors.zoo_extra import (GRepPoints, RotatedATSS,
                                  RotatedFasterRCNN, RotatedRepPoints,
                                  SAMRepPoints)
from .detectors.hbb_detectors import CascadeRCNN, FasterRCNN, RetinaNet
from .dense_heads.rotated_retina_head import CSLRetinaHead
from .dense_heads.rotated_fcos_head import CSLRotatedFCOSHead
from .detectors.refine_detectors import ODMRefineHead, RefineHead
from .backbones.re_resnet import ReFPN
from .necks.fpn import SimpleFPN

for name, cls in [
        ("ConvNeXt_moe", ConvNeXtMoE),
        ("ConvNeXt_moe_MultiInput", ConvNeXtMoE),
        # DA baseline: same backbone class, use_da/da_block_inds cfg
        # (reference ConvNeXt_DA_MultiInput, convnext_moe_DA.py:762)
        ("ConvNeXt_DA_MultiInput", ConvNeXtMoE),
        ("LSKNet_moe", LSKNetMoE),
        ("LSKNet_moe_MultiInput", LSKNetMoE),
        # plain (non-MoE) variants = empty moe_block_inds
        # (reference lsknet.py:129, van.py)
        ("LSKNet", LSKNetMoE),
        ("VAN", VANMoE),
        ("VAN_moe", VANMoE),
        ("VAN_moe_MultiInput", VANMoE),
        ("SwinTransformer_moe", SwinMoE),
        ("SwinTransformer_MoE", SwinMoE),
        ("SwinTransformer", SwinMoE),
        ("InternViT", InternViTAdapter),
        ("InternViTAdapter", InternViTAdapter),
        ("ReResNet", ReResNet)]:
    BACKBONES.register_module(name, module=cls)

NECKS.register_module("FPN", module=FPN)
NECKS.register_module("MultitaskFPN", module=MultitaskFPN)
NECKS.register_module("ReFPN", module=ReFPN)
NECKS.register_module("SimpleFPN", module=SimpleFPN)

for name, cls in [
        ("GFLHead", GFLHead),
        ("OrientedRPNHead", OrientedRPNHead),
        ("RotatedRetinaHead", RotatedRetinaHead),
        ("RotatedFCOSHead", RotatedFCOSHead),
        ("OrientedRepPointsHead", OrientedRepPointsHead),
        ("RPNHead", RPNHead),
        ("RotatedShared2FCBBoxHead", RotatedShared2FCBBoxHead),
        ("Shared2FCBBoxHead", Shared2FCBBoxHead),
        ("GVBBoxHead", GVBBoxHead),
        ("HBB2OBBBBoxHead", HBB2OBBBBoxHead),
        ("RotatedATSSHead", RotatedATSSHead),
        ("RotatedRepPointsHead", RotatedRepPointsHead),
        ("SAMRepPointsHead", SAMRepPointsHead),
        # CSL heads (csl_rotated_retina_head.py / csl_rotated_fcos_head.py)
        ("CSLRRetinaHead", CSLRetinaHead),
        ("CSLRFCOSHead", CSLRotatedFCOSHead),
        # refine-stage heads (odm_refine_head.py,
        # rotated_retina_refine_head.py); the KFIoU variants differ from
        # these only in the box-loss family, which is the detector cfg's
        # refine_reg_loss/reg_loss='kfiou' selector here
        ("ODMRefineHead", ODMRefineHead),
        ("RotatedRetinaRefineHead", RefineHead),
        ("KFIoUODMRefineHead", ODMRefineHead),
        ("KFIoURRetinaRefineHead", RefineHead),
        ("KFIoURRetinaHead", RotatedRetinaHead),
        # RotatedRPNHead (rotated_rpn_head.py): HBB-delta RPN used by
        # RotatedFasterRCNN — the HBB RPNHead here
        ("RotatedRPNHead", RPNHead),
        # base-class names the reference registers (rotated_anchor_head
        # .py:19, rotated_anchor_free_head.py): concrete forms here
        ("RotatedAnchorHead", RotatedRetinaHead),
        ("RotatedAnchorFreeHead", RotatedFCOSHead)]:
    HEADS.register_module(name, module=cls)

for name, cls in [
        ("TriSourceDetector", TriSourceDetector),
        ("TriSourceVariant", TriSourceVariant),
        ("OrientedRCNN", OrientedRCNN),
        ("RotatedRetinaNet", RotatedRetinaNet),
        ("GFL", GFLDetector),
        ("R3Det", R3Det),
        ("S2ANet", S2ANet),
        ("ReDet", ReDet),
        ("RoITransformer", RoITransformer),
        ("RotatedFCOS", RotatedFCOS),
        ("GlidingVertex", GlidingVertex),
        ("OrientedRepPoints", OrientedRepPoints),
        ("RotatedFasterRCNN", RotatedFasterRCNN),
        ("RotatedRepPoints", RotatedRepPoints),
        ("SAMRepPoints", SAMRepPoints),
        ("GRepPoints", GRepPoints),
        ("RotatedATSS", RotatedATSS),
        ("FasterRCNN", FasterRCNN),
        ("CascadeRCNN", CascadeRCNN),
        ("RetinaNet", RetinaNet)]:
    DETECTORS.register_module(name, module=cls)

def normalize_model_cfg(mc):
    """Translate reference head-type selectors into this library's cfg
    keys, in place, and return ``mc``.

    The KFIoU heads (reference ``kfiou_rotate_retina_head.py``,
    ``kfiou_rotate_retina_refine_head.py``, ``kfiou_odm_refine_head.py``)
    differ from their base heads only in the box-loss family; here that
    family is selected by the detector-cfg ``reg_loss``/``refine_reg_loss``
    keys.  A config ported verbatim from the reference carries only
    ``type='KFIoU...'`` in the head sub-dict, so translate it — otherwise
    such a config would silently train with smooth_l1.
    """
    def _head_type(d):
        return d.get("type", "") if isinstance(d, dict) else ""

    if _head_type(mc.get("bbox_head")).startswith("KFIoU"):
        mc.setdefault("reg_loss", "kfiou")
    for key in ("refine_head", "refine_heads"):
        heads = mc.get(key)
        heads = heads if isinstance(heads, (list, tuple)) else [heads]
        if any(_head_type(h).startswith("KFIoU") for h in heads):
            mc.setdefault("refine_reg_loss", "kfiou")
    return mc


__all__ = ["BACKBONES", "NECKS", "HEADS", "DETECTORS", "build_from_cfg",
           "normalize_model_cfg"]
