"""Device ops: resize, batched NMS, mask composition, Pallas kernels."""

from .resize import resize_bilinear, resize_nearest
from .nms import batched_nms, postprocess_detections
from .masks import compose_masks

__all__ = [
    "resize_bilinear",
    "resize_nearest",
    "batched_nms",
    "postprocess_detections",
    "compose_masks",
]
