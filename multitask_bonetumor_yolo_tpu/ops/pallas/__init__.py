"""Pallas TPU kernels for the hot blocks."""

from .convnext_block import convnext_block, convnext_block_ref

__all__ = ["convnext_block", "convnext_block_ref"]
