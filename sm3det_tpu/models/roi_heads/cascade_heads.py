"""Cascade/RoI-head variants: RoI Transformer and Gliding Vertex.

Parity targets:
- ``RoITransRoIHead`` (``mmrotate/models/roi_heads/roi_trans_roi_head.py``):
  cascade HBB->OBB — stage 1 pools horizontal RoIs and regresses an OBB
  (``DeltaXYWHAHBBoxCoder``: HBB prior, 5-param target), stage 2 pools
  ROTATED RoIs from stage-1 boxes with a rotated Shared2FC head.
- ``GVRatioRoIHead`` / ``GVBBoxHead`` (``gv_ratio_roi_head.py``,
  ``gv_bbox_head.py``): Shared2FC head with extra ``fix`` (4 sliding
  fractions) and ``ratio`` branches; decode via GVFixCoder, fall back to
  the HBB when the area ratio is near 1.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.bbox.coders import DeltaXYWHAOBBoxCoder
from ...core.bbox.gv_coders import GVFixCoder, GVRatioCoder
from ...ops.box_convert import hbb2obb, poly2obb
from .oriented_roi_head import extract_rotated_roi_feats
from .standard_roi_head import extract_hbb_roi_feats


class HBB2OBBBBoxHead(nn.Module):
    """Stage-1 RoI-Trans head: HBB RoI features -> OBB deltas
    (DeltaXYWHAHBBoxCoder contract: prior = hbb2obb(hbb))."""

    num_classes: int
    fc_out_channels: int = 1024

    @nn.compact
    def __call__(self, roi_feats):
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_out_channels, name="shared_fc0")(x))
        x = nn.relu(nn.Dense(self.fc_out_channels, name="shared_fc1")(x))
        cls = nn.Dense(self.num_classes + 1, name="fc_cls")(x)
        reg = nn.Dense(5, name="fc_reg")(x)
        return cls, reg


class GVBBoxHead(nn.Module):
    """Gliding-Vertex head: cls + hbb reg + fix (4) + ratio (1)."""

    num_classes: int
    fc_out_channels: int = 1024

    @nn.compact
    def __call__(self, roi_feats):
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_out_channels, name="shared_fc0")(x))
        x = nn.relu(nn.Dense(self.fc_out_channels, name="shared_fc1")(x))
        cls = nn.Dense(self.num_classes + 1, name="fc_cls")(x)
        reg = nn.Dense(4, name="fc_reg")(x)
        fix = nn.sigmoid(nn.Dense(4, name="fc_fix")(x))
        ratio = nn.sigmoid(nn.Dense(1, name="fc_ratio")(x))
        return cls, reg, fix, ratio


def gv_decode(hbbs, fix, ratio, version="le90", ratio_thr=0.8):
    """Gliding-Vertex decode: polygon from sliding vertices; near-
    horizontal boxes (ratio > thr) snap back to the HBB
    (``gv_bbox_head.py`` get_bboxes behavior)."""
    coder = GVFixCoder(version)
    polys = coder.decode(hbbs, fix)
    obbs = poly2obb(polys, version)
    hobbs = hbb2obb(hbbs, version)
    keep_h = (ratio[..., 0] > ratio_thr)[..., None]
    return jnp.where(keep_h, hobbs, obbs)


def roi_trans_stage1(feats, rois5_hbb, head: HBB2OBBBBoxHead,
                     coder: DeltaXYWHAOBBoxCoder, version="le90"):
    """Pool hbb RoIs -> (cls, obb decode) for cascade stage 2.

    rois5_hbb: (N, 5) (batch_idx, x1, y1, x2, y2).
    Returns (cls_logits, decoded_obbs (N, 5)).
    """
    rf = extract_hbb_roi_feats(feats, rois5_hbb)
    cls_logits, reg = head(rf)
    priors = hbb2obb(rois5_hbb[:, 1:5], version)
    obbs = coder.decode(priors, reg)
    return cls_logits, obbs
