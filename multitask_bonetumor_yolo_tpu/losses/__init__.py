"""Vectorized multitask loss (detection + segmentation + classification)."""

from .multitask import LossConfig, LossOutput, multitask_loss

__all__ = ["LossConfig", "LossOutput", "multitask_loss"]
