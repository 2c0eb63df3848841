from .coders import (DeltaXYWHBBoxCoder, DeltaXYWHAOBBoxCoder,
                     MidpointOffsetCoder, DistancePointBBoxCoder)
from .assigners import max_iou_assign, atss_assign
from .samplers import random_sample

__all__ = [
    "DeltaXYWHBBoxCoder", "DeltaXYWHAOBBoxCoder", "MidpointOffsetCoder",
    "DistancePointBBoxCoder", "max_iou_assign", "atss_assign",
    "random_sample",
]
