"""Metrics: COCO-style mAP (bbox + segm), binary segmentation stats,
classification accuracy / macro-PRF / confusion matrices.

The reference's metric surface (SURVEY.md §6) comes from torchmetrics; this
package reimplements it host-side in numpy with torchmetrics-compatible
output keys, fed by device arrays.
"""

from .detection import MeanAveragePrecision
from .segmentation import BinarySegMetrics
from .classification import ClassificationMetrics, confusion_matrix

__all__ = [
    "MeanAveragePrecision",
    "BinarySegMetrics",
    "ClassificationMetrics",
    "confusion_matrix",
]
