"""Data layer: offline converter, BTXRD dataset/loader, device preprocessing."""

from .dataset import BTXRD, BTXRDLoader, DataConfig
from .synthetic import make_synthetic_btxrd, make_synthetic_raw

__all__ = [
    "BTXRD",
    "BTXRDLoader",
    "DataConfig",
    "make_synthetic_btxrd",
    "make_synthetic_raw",
]
