from .box_convert import (norm_angle, poly2obb, obb2poly, obb2hbb, hbb2obb,
                          obb2xyxy, rbbox_flip, poly2obb_np, obb2poly_np)
from .rotated_iou import (box_iou_rotated, box_iou_rotated_chunked,
                          rotated_intersection_area, obb_corners)
from .nms import (bbox_overlaps, nms, batched_nms, nms_rotated,
                  multiclass_nms_rotated, multiclass_nms, greedy_keep)
from .roi_align_rotated import roi_align_rotated

__all__ = [
    "norm_angle", "poly2obb", "obb2poly", "obb2hbb", "hbb2obb", "obb2xyxy",
    "rbbox_flip", "poly2obb_np", "obb2poly_np",
    "box_iou_rotated", "box_iou_rotated_chunked",
    "rotated_intersection_area", "obb_corners",
    "bbox_overlaps", "nms", "batched_nms", "nms_rotated",
    "multiclass_nms_rotated", "multiclass_nms", "greedy_keep",
    "roi_align_rotated",
]
