"""Data layer: offline converter, BTXRD dataset/loader, device preprocessing."""

from .dataset import BTXRD, BTXRDLoader, DataConfig, Prefetcher
from .synthetic import make_synthetic_btxrd, make_synthetic_raw

__all__ = [
    "BTXRD",
    "BTXRDLoader",
    "DataConfig",
    "Prefetcher",
    "make_synthetic_btxrd",
    "make_synthetic_raw",
]
