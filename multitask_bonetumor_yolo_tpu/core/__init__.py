"""Pure, dependency-free math: boxes, IoU, anchors, DFL, letterbox geometry."""

from .boxes import (
    box_cxcywh_to_xyxy,
    box_xyxy_to_cxcywh,
    box_iou_matrix,
    box_iou_pairwise,
    dist2bbox,
    bbox2dist,
)
from .anchors import make_anchors, level_shapes
from .dfl import dfl_decode, dfl_targets
from .letterbox import letterbox_geometry, scale_boxes_to_letterbox

__all__ = [
    "box_cxcywh_to_xyxy",
    "box_xyxy_to_cxcywh",
    "box_iou_matrix",
    "box_iou_pairwise",
    "dist2bbox",
    "bbox2dist",
    "make_anchors",
    "level_shapes",
    "dfl_decode",
    "dfl_targets",
    "letterbox_geometry",
    "scale_boxes_to_letterbox",
]
